"""Semantic guards for the search-extras batch: pure-Python PRF /
min-span / spell recomputation at sf0.001."""

from __future__ import annotations

from collections import Counter

import pandas as pd

QT = ("spark", "join")


def _docs(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    return {int(r.doc_id): r.text.split(" ") for r in d.itertuples()}


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_rocchio_prf(spark, sf_dir):
    from excel_to_db_spark.queries.search2 import search_rocchio_prf
    rows = search_rocchio_prf(spark, sf_dir).collect()
    docs = _docs(sf_dir)
    scored = sorted(
        ((-sum(1 for t in toks if t in QT), did)
         for did, toks in docs.items()),
    )[:5]
    top5 = [did for _, did in scored]
    cent = Counter()
    for did in top5:
        cent.update(docs[did])
    weights = {}
    for tok, tf in cent.items():
        c_micro = tf * 10 ** 6 // 5
        weights[tok] = ((1_000_000 if tok in QT else 0)
                        + 750_000 * c_micro // 10 ** 6)
    order = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.tok, r.weight_micro, r.rnk) for r in rows] == \
        [(t, w, i + 1) for i, (t, w) in enumerate(order)]
    # the query terms themselves must rank at the top
    assert {rows[0].tok, rows[1].tok} == set(QT)


def test_phrase_minspan(spark, sf_dir):
    from excel_to_db_spark.queries.search2 import search_phrase_minspan
    rows = {r.span_bucket: r
            for r in search_phrase_minspan(spark, sf_dir).collect()}
    docs = _docs(sf_dir)
    hist = Counter()
    n_single = 0
    for toks in docs.values():
        pa = [i for i, t in enumerate(toks, 1) if t == QT[0]]
        pb = [i for i, t in enumerate(toks, 1) if t == QT[1]]
        if pa and pb:
            span = min(abs(a - b) + 1 for a in pa for b in pb)
            hist[min(span, 20)] += 1
        elif pa or pb:
            n_single += 1
    assert {b: r.n_docs for b, r in rows.items()} == dict(hist)
    assert all(r.n_single_term_docs == n_single for r in rows.values())


def test_spell_suggest(spark, sf_dir):
    from excel_to_db_spark.queries.search2 import (_PROBES,
                                                   search_spell_suggest)
    rows = {}
    for r in search_spell_suggest(spark, sf_dir).collect():
        rows.setdefault(r.probe, []).append(
            (r.rnk, r.suggestion, r.lev, r.freq))
    docs = _docs(sf_dir)
    vocab = Counter(t for toks in docs.values() for t in toks)
    for p in _PROBES:
        cand = sorted(
            ((_lev(p, w), -f, w) for w, f in vocab.items()
             if _lev(p, w) <= 2))[:3]
        exp = [(i + 1, w, l, -nf) for i, (l, nf, w) in enumerate(cand)]
        assert sorted(rows.get(p, [])) == exp
    # every probe recovers its intended word at rank 1
    intended = {"jion": "join", "hassh": "hash", "batchh": "batch",
                "colmn": "column", "sprak": "spark"}
    for p, lst in rows.items():
        assert sorted(lst)[0][1] == intended[p]
