"""Semantic guards for the retrieval-eval/diversity/gains batch: MRR's
sort-free rank formula matches a brute-force numpy replay, MMR's greedy
path is reproduced exactly by an independent reference implementation,
and the gains curve satisfies its accounting identities."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _milli_vectors(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(df["embedding"].to_numpy()).astype("float64")
                 * 1000 + 0.5).astype("int64")
    return df["vec_id"].to_numpy(), df["label"].to_numpy(), v


def test_mrr_matches_bruteforce_replay(spark, sf_dir):
    from excel_to_db_spark.queries.similarity2 import similarity_mrr_eval
    rows = {r.q_id: r for r in similarity_mrr_eval(spark, sf_dir).collect()}
    ids, labels, v = _milli_vectors(sf_dir)
    assert set(rows) == set(ids[ids < 10])
    rrs = []
    for qi in sorted(rows):
        q_idx = np.where(ids == qi)[0][0]
        mask = ids != qi
        d2 = ((v[mask] - v[q_idx]) ** 2).sum(axis=1)
        order = np.lexsort((ids[mask], d2))
        rel = labels[mask][order] == labels[q_idx]
        hit = np.nonzero(rel)[0]
        want_rank = int(hit[0]) + 1 if len(hit) else 0
        assert rows[qi].first_rel_rank == want_rank
        want_rr = (round(1e6 / want_rank) if 0 < want_rank <= 10 else 0)
        assert rows[qi].rr_micro == want_rr
        rrs.append(want_rr)
    assert rows[0].mrr_at_10 == round(sum(rrs) / (len(rrs) * 1e6), 6)


def test_mmr_greedy_replay(spark, sf_dir):
    from excel_to_db_spark.queries.similarity2 import (
        similarity_mmr_diversify)
    got = sorted(similarity_mmr_diversify(spark, sf_dir).collect(),
                 key=lambda r: r.pick_order)
    assert [r.pick_order for r in got] == [1, 2, 3, 4, 5]
    ids, labels, v = _milli_vectors(sf_dir)
    q_idx = np.where(ids == 0)[0][0]
    mask = ids != 0
    cid, cv = ids[mask], v[mask]
    d2q = ((cv - v[q_idx]) ** 2).sum(axis=1)
    pool = np.lexsort((cid, d2q))[:20]
    cid, cv, d2q = cid[pool], cv[pool], d2q[pool]

    sel = [int(np.lexsort((cid, d2q))[0])]
    mins = [None]
    for _ in range(4):
        rem = [i for i in range(len(cid)) if i not in sel]
        md = {i: min(int(((cv[i] - cv[s]) ** 2).sum()) for s in sel)
              for i in rem}
        pick = max(rem, key=lambda i: (md[i] - int(d2q[i]), -int(cid[i])))
        sel.append(pick)
        mins.append(md[pick])
    for r, (i, m) in zip(got, zip(sel, mins)):
        assert r.vec_id == int(cid[i])
        assert r.d2q == int(d2q[i])
        assert (r.min_d2_sel is None) == (m is None)
        if m is not None:
            assert r.min_d2_sel == m
    # Diversity: the 5 picks are distinct vectors.
    assert len({r.vec_id for r in got}) == 5


def test_quality_gains_accounting(spark, sf_dir):
    from excel_to_db_spark.queries.quality import eval_quality_gains
    rows = sorted(eval_quality_gains(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(10))
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == len(docs)
    # Deciles are within 1 of each other (exact integer split).
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # Cumulative accounting closes: last decile captures everything.
    tot_dups = sum(r.n_dups for r in rows)
    assert rows[-1].cum_dups == tot_dups
    if tot_dups:
        assert rows[-1].capture_pct == 100.0
        assert rows[-1].lift == 1.0
    cum = 0
    for r in rows:
        cum += r.n_dups
        assert r.cum_dups == cum
        assert 0 <= r.n_dups <= r.n_docs
