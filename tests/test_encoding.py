"""Semantic guards for the storage-encoding batch: pure-pandas run /
dictionary / delta recomputation at sf0.001."""

from __future__ import annotations

from collections import Counter

import pandas as pd


def _ordered(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    # the pinned composite storage order (queries/encoding.py _POS_SQL):
    # (orderkey, linenumber) is NOT unique in the synthetic corpus
    li["pos"] = (li.l_orderkey.astype(str).str.zfill(12)
                 + li.l_linenumber.astype(str).str.zfill(2)
                 + li.l_partkey.astype(str).str.zfill(10)
                 + li.l_suppkey.astype(str).str.zfill(10)
                 + (li.l_extendedprice * 100).round().astype("int64")
                   .astype(str).str.zfill(12)
                 + li.l_quantity.astype("int64").astype(str).str.zfill(3)
                 + li.l_returnflag + li.l_linestatus
                 + li.l_shipdate.dt.date.astype(str))
    return li.sort_values("pos").reset_index(drop=True)


def _runs(vals):
    return 1 + sum(1 for a, b in zip(vals, vals[1:]) if a != b)


def test_rle_runs(spark, sf_dir):
    from excel_to_db_spark.queries.encoding import enc_rle_runs
    r = enc_rle_runs(spark, sf_dir).collect()[0]
    li = _ordered(sf_dir)
    rf = _runs(li.l_returnflag.tolist())
    ls = _runs(li.l_linestatus.tolist())
    sd = _runs(li.l_shipdate.dt.date.tolist())
    assert (r.n_rows, r.runs_rf, r.runs_ls, r.runs_sd) == \
        (len(li), rf, ls, sd)
    assert r.rle_ratio_ls_milli == len(li) * 1000 // ls
    # 2-3 value columns compress far better than near-unique dates
    assert r.runs_ls < r.runs_sd


def test_dict_advisor(spark, sf_dir):
    from excel_to_db_spark.queries.encoding import enc_dict_advisor
    rows = {r.col: r for r in enc_dict_advisor(spark, sf_dir).collect()}
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_brand", "p_type", "p_name"])
    for col in ("p_brand", "p_type", "p_name"):
        s = p[col]
        plain = int(s.str.len().sum())
        dictb = int(s.drop_duplicates().str.len().sum())
        r = rows[col]
        assert (r.n_rows, r.ndv, r.plain_bytes, r.dict_bytes) == \
            (len(s), s.nunique(), plain, dictb)
        assert r.gain_milli == plain * 1000 // (dictb + 4 * len(s))
        assert r.recommend == int(s.nunique() * 10 <= len(s))


def test_delta_bitwidth(spark, sf_dir):
    from excel_to_db_spark.queries.encoding import enc_delta_bitwidth
    rows = {r.nbits: r for r in enc_delta_bitwidth(spark, sf_dir).collect()}
    li = _ordered(sf_dir)
    ks = li.l_orderkey.tolist()
    bits = [0 if d == 0 else d.bit_length()
            for d in (b - a for a, b in zip(ks, ks[1:]))]
    exp = Counter(bits)
    avg = sum(bits) * 1000 // len(bits)
    assert {b: r.n_values for b, r in rows.items()} == dict(exp)
    assert all(r.avg_bits_milli == avg for r in rows.values())
    # packed width beats plain 64-bit storage massively
    assert avg < 16_000


def test_sort_layout_gain(spark, sf_dir):
    from excel_to_db_spark.queries.encoding import enc_sort_layout_gain
    r = enc_sort_layout_gain(spark, sf_dir).collect()[0]
    li = _ordered(sf_dir)
    dates = li.l_shipdate.dt.date.tolist()
    nat = _runs(dates)
    srt = len(set(dates))
    assert (r.n_rows, r.natural_runs, r.sorted_runs) == \
        (len(li), nat, srt)
    assert r.gain_milli == nat * 1000 // srt
    assert r.natural_ratio_milli == len(li) * 1000 // nat
    assert r.sorted_ratio_milli == len(li) * 1000 // srt
    # sorting must strictly reduce runs on a shuffled column
    assert r.gain_milli > 1000
