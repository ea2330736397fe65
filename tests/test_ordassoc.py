"""Semantic guards for the ordinal-association batch: Cliff's delta
vs a brute-force pair scan, gamma/Somers' D vs cell algebra, and the
uncertainty coefficient vs sklearn-free entropy arithmetic."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _cells(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    r = o["o_orderpriority"].str[0].astype(int)
    c = np.select([o["o_totalprice"] < 50000,
                   o["o_totalprice"] < 150000,
                   o["o_totalprice"] < 300000], [0, 1, 2], default=3)
    return Counter(zip(r, c))


def _pair_terms(cells):
    conc = disc = ties_y = 0
    for (r1, c1), n1 in cells.items():
        for (r2, c2), n2 in cells.items():
            if r2 > r1 and c2 > c1:
                conc += n1 * n2
            elif r2 > r1 and c2 < c1:
                disc += n1 * n2
            elif c2 == c1 and r2 > r1:
                ties_y += n1 * n2
    return conc, disc, ties_y


def test_cliffs_delta_brute_force(spark, sf_dir):
    from excel_to_db_spark.queries.ordassoc import stats_cliffs_delta
    row = stats_cliffs_delta(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    a = np.sort(cents[ev["event_type"] == "click"].to_numpy())
    b = np.sort(cents[ev["event_type"] == "purchase"].to_numpy())
    # brute force via searchsorted (O(n log n), exact integers)
    wins = int(np.searchsorted(b, a, side="left").sum())
    le = int(np.searchsorted(b, a, side="right").sum())
    ties = le - wins
    losses = len(a) * len(b) - le
    assert (row.n1, row.n2) == (len(a), len(b))
    assert (row.wins, row.losses, row.ties) == (wins, losses, ties)
    d = (wins - losses) / (len(a) * len(b))
    assert row.cliffs_delta == _r(d, 6)
    # A = (delta+1)/2 identity
    assert abs(row.vd_a - (d + 1) / 2) < 1e-6
    assert -1 <= row.cliffs_delta <= 1 and 0 <= row.vd_a <= 1


def test_gamma_and_somers_cell_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.ordassoc import (stats_gk_gamma,
                                                    stats_somers_d)
    g = stats_gk_gamma(spark, sf_dir).collect()[0]
    s = stats_somers_d(spark, sf_dir).collect()[0]
    conc, disc, ties_y = _pair_terms(_cells(sf_dir))
    assert (g.conc, g.disc) == (conc, disc)
    assert (s.conc, s.disc, s.ties_y) == (conc, disc, ties_y)
    assert g.gamma == _r((conc - disc) / (conc + disc), 6)
    assert s.somers_d == _r((conc - disc) / (conc + disc + ties_y), 6)
    # |D| <= |gamma|: same numerator, denominator only grows
    assert abs(s.somers_d) <= abs(g.gamma) + 1e-9


def test_uncertainty_coeff_entropy(spark, sf_dir):
    from excel_to_db_spark.queries.ordassoc import stats_uncertainty_coeff
    row = stats_uncertainty_coeff(spark, sf_dir).collect()[0]
    cells = _cells(sf_dir)
    n = sum(cells.values())
    rmarg = Counter()
    cmarg = Counter()
    for (r, c), k in cells.items():
        rmarg[r] += k
        cmarg[c] += k
    h_r = -sum((k / n) * math.log(k / n) for k in rmarg.values())
    h_rc = -sum((k / n) * math.log(k / cmarg[c])
                for (r, c), k in cells.items())
    assert abs(row.h_r - h_r) < 1e-6
    assert abs(row.h_r_given_c - h_rc) < 1e-6
    u = (h_r - h_rc) / h_r
    assert abs(row.u_coeff - u) < 1e-6
    # conditioning cannot raise entropy; U bounded in [0, 1]
    assert 0 - 1e-9 <= row.u_coeff <= 1 + 1e-9
    assert row.h_r_given_c <= row.h_r + 1e-9
