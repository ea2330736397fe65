"""Semantic guards for the marketing batch: pure-pandas recomputation
of adstock, saturation deciles, reach/frequency, and halo shares at
sf0.001."""

from __future__ import annotations

from collections import Counter

import pandas as pd


def _events(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "user_id", "event_type"])
    e["sec"] = e.ts.values.astype("datetime64[s]").astype("int64")
    return e


def test_adstock_decay(spark, sf_dir):
    from excel_to_db_spark.queries.marketing import mkt_adstock_decay
    rows = {r.day: r for r in mkt_adstock_decay(spark, sf_dir).collect()}
    e = _events(sf_dir)
    clicks = (e[e.event_type == "click"]
              .assign(day=lambda d: d.sec // 86400)
              .groupby("day").size())
    for day, x in clicks.items():
        ad = sum(int(clicks.get(day - s, 0)) * 1000 // 2 ** s
                 for s in range(8))
        r = rows[day]
        assert (r.x, r.adstock_milli) == (x, ad)
    assert set(rows) == set(clicks.index)
    # adstock dominates same-day clicks (carryover adds pressure)
    assert all(r.adstock_milli >= r.x * 1000 for r in rows.values())


def test_hill_saturation(spark, sf_dir):
    from excel_to_db_spark.queries.marketing import mkt_hill_saturation
    rows = {r.decile: r
            for r in mkt_hill_saturation(spark, sf_dir).collect()}
    e = _events(sf_dir)
    e["hr"] = e.sec // 3600
    hourly = (e.groupby("hr").event_type
              .value_counts().unstack(fill_value=0))
    xs = hourly.get("click", pd.Series(0, index=hourly.index))
    ys = hourly.get("purchase", pd.Series(0, index=hourly.index))
    order = sorted(zip(xs, xs.index, ys))
    n = len(order)
    exp = {}
    for rk0, (x, _, y) in enumerate(order):
        d = rk0 * 10 // n
        c, sx, sy = exp.get(d, (0, 0, 0))
        exp[d] = (c + 1, sx + int(x), sy + int(y))
    for d, (c, sx, sy) in exp.items():
        r = rows[d]
        ax, ay = sx * 1000 // c, sy * 1000 // c
        assert (r.n_hours, r.avg_x_milli, r.avg_y_milli) == (c, ax, ay)
        assert r.hill_pred_micro == \
            ax * ax * 1_000_000 // (ax * ax + 3000 * 3000)
    assert set(rows) == set(exp)


def test_reach_frequency(spark, sf_dir):
    from excel_to_db_spark.queries.marketing import mkt_reach_frequency
    rows = {(r.event_type, r.freq_bucket): r
            for r in mkt_reach_frequency(spark, sf_dir).collect()}
    e = _events(sf_dir)
    uf = e.groupby(["event_type", "user_id"]).size()
    exp = Counter()
    reach, eff = Counter(), Counter()
    for (t, _), n in uf.items():
        exp[(t, min(n, 5))] += 1
        reach[t] += 1
        eff[t] += n >= 3
    assert {k: r.n_users for k, r in rows.items()} == dict(exp)
    for (t, _), r in rows.items():
        assert (r.reach, r.eff_reach_3plus) == (reach[t], eff[t])


def test_halo_lift(spark, sf_dir):
    from excel_to_db_spark.queries.marketing import mkt_halo_lift
    r = mkt_halo_lift(spark, sf_dir).collect()[0]
    e = _events(sf_dir)
    purch = e[e.event_type == "purchase"]
    by_user = {t: g.groupby("user_id").sec.apply(list).to_dict()
               for t, g in e.groupby("event_type")}
    n_c = n_v = 0
    for row in purch.itertuples():
        for kind, bump in (("click", "c"), ("view", "v")):
            times = by_user.get(kind, {}).get(row.user_id, [])
            hit = any(row.sec - 3600 <= t < row.sec for t in times)
            if hit and kind == "click":
                n_c += 1
            if hit and kind == "view":
                n_v += 1
    n_p = len(purch)
    assert (r.n_purchases, r.n_after_click_1h, r.n_after_view_1h) == \
        (n_p, n_c, n_v)
    assert r.click_share_micro == n_c * 1_000_000 // n_p
    assert r.view_share_micro == n_v * 1_000_000 // n_p
    assert r.lift_vs_view_micro == (n_c * 1_000_000 // n_v if n_v else 0)
