"""Semantic guards for the financial-reporting batch: pure-pandas
fiscal / waterfall / PVM recomputation plus the bridges' own
reconciliation identities at sf0.001."""

from __future__ import annotations

import pandas as pd

REPORT_DAY = 2000


def _orders(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o["w"] = ((o.o_orderdate.dt.normalize()
               - pd.Timestamp("1995-01-01")).dt.days) // 7
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    o["fy"] = o.w // 52
    o["fq"] = (o.w % 52) // 13
    wq = o.w % 13
    o["fp_in_q"] = pd.cut(wq, [-1, 3, 7, 12], labels=False)
    return o


def test_445_rollup(spark, sf_dir):
    from excel_to_db_spark.queries.finreport import fin_445_rollup
    rows = {(r.fy, r.fp): (r.n_orders, r.rev_cents)
            for r in fin_445_rollup(spark, sf_dir).collect()}
    o = _orders(sf_dir)
    exp = {}
    for (fy, fq, fp), g in o.groupby(["fy", "fq", "fp_in_q"]):
        exp[(fy, fq * 3 + fp)] = (len(g), int(g.cents.sum()))
    assert rows == exp
    # every order lands in exactly one fiscal period
    assert sum(n for n, _ in rows.values()) == len(o)


def test_mtd_qtd_ytd(spark, sf_dir):
    from excel_to_db_spark.queries.finreport import fin_mtd_qtd_ytd
    r = fin_mtd_qtd_ytd(spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    wn = REPORT_DAY // 7
    fy_n, fq_n = wn // 52, (wn % 52) // 13
    fp_n = 0 if wn % 13 < 4 else (1 if wn % 13 < 8 else 2)

    def span(fy, wcut, q=None, p=None):
        m = (o.fy == fy) & (o.w <= wcut)
        if q is not None:
            m &= o.fq == q
        if p is not None:
            m &= o.fp_in_q == p
        return int(o[m].cents.sum())

    assert r.mtd_cents == span(fy_n, wn, fq_n, fp_n)
    assert r.qtd_cents == span(fy_n, wn, fq_n)
    assert r.ytd_cents == span(fy_n, wn)
    assert r.mtd_ly_cents == span(fy_n - 1, wn - 52, fq_n, fp_n)
    assert r.qtd_ly_cents == span(fy_n - 1, wn - 52, fq_n)
    assert r.ytd_ly_cents == span(fy_n - 1, wn - 52)
    # containment: MTD <= QTD <= YTD
    assert r.mtd_cents <= r.qtd_cents <= r.ytd_cents


def test_margin_waterfall(spark, sf_dir):
    from excel_to_db_spark.queries.finreport import fin_margin_waterfall
    rows = {r.status: r
            for r in fin_margin_waterfall(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_discount", "l_tax"])
    # numpy rounds half-even; Spark routes doubles through BigDecimal's
    # SHORTEST repr + HALF_UP — mirror that exactly via Decimal(repr())
    from decimal import ROUND_HALF_UP, Decimal

    def r_half_up(series):
        return series.map(lambda v: int(
            Decimal(repr(float(v))).quantize(Decimal(1), ROUND_HALF_UP)))

    li["gross"] = r_half_up(li.l_extendedprice * 100)
    li["disc"] = r_half_up(li.l_extendedprice * li.l_discount * 100)
    li["net1"] = li.gross - li.disc
    li["taxm"] = (li.l_tax * 1000).round().astype("int64")
    li["tax"] = li.net1 * li.taxm // 1000
    for st, g in li.groupby("l_returnflag"):
        r = rows[st]
        assert (r.gross_cents, r.discount_cents, r.net_cents,
                r.tax_cents) == (int(g.gross.sum()), int(g.disc.sum()),
                                 int(g.net1.sum()), int(g.tax.sum()))
        # the bridge reconciles exactly
        assert r.charged_cents == r.net_cents + r.tax_cents
        assert r.gross_cents == r.net_cents + r.discount_cents
        assert r.discount_rate_milli == \
            int(g.disc.sum()) * 1000 // int(g.gross.sum())


def test_price_volume_mix(spark, sf_dir):
    from excel_to_db_spark.queries.finreport import fin_price_volume_mix
    rows = {r.brand: r
            for r in fin_price_volume_mix(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_quantity", "l_extendedprice"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(p, left_on="l_partkey", right_on="p_partkey"))
    m["yr"] = m.o_orderdate.dt.year
    m = m[m.yr.isin((1997, 1998))]
    m["qty"] = m.l_quantity.astype("int64")
    m["cents"] = (m.l_extendedprice * 100).round().astype("int64")
    for brand, g in m.groupby("p_brand"):
        q1 = int(g[g.yr == 1997].qty.sum())
        q2 = int(g[g.yr == 1998].qty.sum())
        r1 = int(g[g.yr == 1997].cents.sum())
        r2 = int(g[g.yr == 1998].cents.sum())
        if q1 == 0 or q2 == 0:
            assert brand not in rows
            continue
        pe = (r2 // q2 - r1 // q1) * q2
        ve = (q2 - q1) * (r1 // q1)
        r = rows[brand]
        assert (r.q1, r.q2, r.r1, r.r2) == (q1, q2, r1, r2)
        assert (r.price_eff_cents, r.volume_eff_cents) == (pe, ve)
        # effects + residual reconcile the revenue delta to the cent
        assert (r.price_eff_cents + r.volume_eff_cents
                + r.residual_cents) == r2 - r1
        # residual is only unit-price rounding: bounded by q2 + |dq|
        assert abs(r.residual_cents) <= q2 + abs(q2 - q1)
