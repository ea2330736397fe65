"""Semantic guards for the graph-community batch: brute-force Python
recomputation of LPA rounds, conductance, the bipartite projection,
and the core-periphery blocks on the sf0.001 trade graph."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd


def _edges(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    return sorted({(int(c) * 2, int(s) * 2 + 1)
                   for c, s in zip(m.o_custkey, m.l_suppkey)})


def _adj(edges):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    return adj


def test_label_propagation(spark, sf_dir):
    from excel_to_db_spark.queries.graphcomm import graph_label_propagation
    rows = {r.csize: r.n_communities
            for r in graph_label_propagation(spark, sf_dir).collect()}
    adj = _adj(_edges(sf_dir))
    lbl = {u: u for u in adj}
    for _ in range(3):
        nxt = {}
        for u, nbrs in adj.items():
            cnt = Counter(lbl[v] for v in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[u] = best[0]
        lbl = nxt
    sizes = Counter(Counter(lbl.values()).values())
    assert rows == dict(sizes)


def test_conductance(spark, sf_dir):
    from excel_to_db_spark.queries.graphcomm import graph_conductance
    rows = {r.nation: r for r in graph_conductance(spark, sf_dir).collect()}
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    cn = dict(zip(cu.c_custkey * 2, cu.c_nationkey))
    sn = dict(zip(su.s_suppkey * 2 + 1, su.s_nationkey))
    edges = _edges(sf_dir)
    m = len(edges)
    ein, cut = Counter(), Counter()
    for u, v in edges:
        gu, gv = cn[u], sn[v]
        if gu == gv:
            ein[gu] += 1
        else:
            cut[gu] += 1
            cut[gv] += 1
    for g in set(ein) | set(cut):
        vol = 2 * ein[g] + cut[g]
        other = 2 * m - vol
        phi = (cut[g] * 1_000_000 // min(vol, other)
               if min(vol, other) > 0 else 0)
        r = rows[g]
        assert (r.e_in, r.cut, r.vol, r.phi_micro) == \
            (ein[g], cut[g], vol, phi)


def test_bipartite_projection(spark, sf_dir):
    from excel_to_db_spark.queries.graphcomm import graph_bipartite_projection
    rows = graph_bipartite_projection(spark, sf_dir).collect()
    by_cust = defaultdict(list)
    for u, v in _edges(sf_dir):
        by_cust[u].append(v)
    w = Counter()
    for vs in by_cust.values():
        vs = sorted(vs)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                w[(vs[i], vs[j])] += 1
    top = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    exp = [((a - 1) // 2, (b - 1) // 2, c) for (a, b), c in top]
    assert [(r.supp1, r.supp2, r.w) for r in rows] == exp


def test_core_periphery(spark, sf_dir):
    from excel_to_db_spark.queries.graphcomm import graph_core_periphery
    r = graph_core_periphery(spark, sf_dir).collect()[0]
    edges = _edges(sf_dir)
    adj = _adj(edges)
    ranked = sorted(adj, key=lambda u: (-len(adj[u]), u))
    n = len(ranked)
    core = set(ranked[:(n + 9) // 10])
    nc_c = sum(1 for u in core if u % 2 == 0)
    nc_s = len(core) - nc_c
    np_c = sum(1 for u in adj if u % 2 == 0) - nc_c
    np_s = n - len(core) - np_c
    e_cc = sum(1 for u, v in edges if u in core and v in core)
    e_pp = sum(1 for u, v in edges if u not in core and v not in core)
    e_cp = len(edges) - e_cc - e_pp
    assert (r.n_core, r.e_cc, r.e_cp, r.e_pp) == \
        (len(core), e_cc, e_cp, e_pp)
    assert r.dens_cc_micro == (e_cc * 1_000_000 // (nc_c * nc_s)
                               if nc_c * nc_s else 0)
    assert r.dens_pp_micro == (e_pp * 1_000_000 // (np_c * np_s)
                               if np_c * np_s else 0)
    den_cp = nc_c * np_s + np_c * nc_s
    assert r.dens_cp_micro == (e_cp * 1_000_000 // den_cp if den_cp else 0)
    # core-periphery structure: core block denser than periphery block
    assert r.dens_cc_micro > r.dens_pp_micro