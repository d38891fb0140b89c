"""Gelly graph-algorithm queries (SURVEY §2.6 iterations; ref:
flink-libraries/flink-gelly/.../library/linkanalysis/PageRank.java,
LabelPropagation.java, TriangleEnumerator.java, and
DataSet.iterateDelta DataSet.java:1206).

All three algorithms run on one deterministic graph derived
arithmetically from the `customer` fixture (40 nodes, several hundred
edges), so the DuckDB oracle can rebuild the identical graph and
cross-check with a genuinely different formulation: the iterative
algorithms are unrolled to fixed-depth CTE chains on the oracle side —
independent of the engine's iterate/iterateDelta machinery, so parity
validates both the graph construction and the iteration semantics.

Float outputs (PageRank) round to 9 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.gelly import (
    adamic_adar,
    checksum_hash_code,
    community_detection,
    hits,
    jaccard_index,
    label_propagation,
    local_clustering_coefficient,
    pagerank,
    sssp,
    summarize,
    triadic_census,
    triangle_enumerate,
    vertex_metrics,
)
from my_flink_1_10_2_spark.operators.iterate import connected_components_delta
from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.queries.graph import _CC_ORACLE, neardup_pairs

# 37-node deterministic dense edge set (~490 directed edges, ~1600
# triangles at sf0.01): the `// 7` term varies dst within a src class, so
# out-degrees > 1 and the graph has real community/triangle structure
_EDGE_SQL = """
    SELECT DISTINCT c_custkey % 37 AS src,
                    (c_custkey // 7 + c_custkey % 11) % 37 AS dst
    FROM customer
    WHERE c_custkey <= 500
      AND c_custkey % 37 <> (c_custkey // 7 + c_custkey % 11) % 37
"""

_PR_ITERS, _DAMPING = 5, 0.85
_LPA_ITERS = 3


def _edges(spark, sf_dir):
    c = read(spark, sf_dir, "customer").filter("c_custkey <= 500")
    return (
        c.select(
            (F.col("c_custkey") % 37).alias("src"),
            F.expr("(c_custkey div 7 + c_custkey % 11) % 37").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _pagerank_oracle() -> str:
    sql = f"""
    WITH edges AS ({_EDGE_SQL}),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS degree FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT cnt FROM n) AS pr FROM nodes)"""
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
    r{i} AS (
      SELECT nodes.node,
             (1.0 - {_DAMPING}) / (SELECT cnt FROM n)
             + {_DAMPING} * COALESCE(SUM(r{i - 1}.pr / deg.degree), 0) AS pr
      FROM nodes
      LEFT JOIN edges ON edges.dst = nodes.node
      LEFT JOIN deg   ON deg.src   = edges.src
      LEFT JOIN r{i - 1} ON r{i - 1}.node = edges.src
      GROUP BY nodes.node)"""
    return sql + f"\n    SELECT node, round(pr, 9) AS pr FROM r{_PR_ITERS}"


@register("q_pagerank", oracle=_pagerank_oracle(), category="graph")
def q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (ref: flink-gelly
    library/linkanalysis/PageRank.java); oracle = the power method
    unrolled to a 5-level CTE chain."""
    out = pagerank(_edges(spark, sf_dir), _DAMPING, _PR_ITERS)
    return out.select("node", F.round("rank", 9).alias("pr"))


def _lpa_oracle() -> str:
    sql = f"""
    WITH edges0 AS ({_EDGE_SQL}),
    sym AS (SELECT src AS e_src, dst AS e_dst FROM edges0
            UNION SELECT dst, src FROM edges0),
    l0 AS (SELECT DISTINCT e_src AS node, e_src AS label FROM sym)"""
    for i in range(1, _LPA_ITERS + 1):
        sql += f""",
    c{i} AS (
      SELECT sym.e_dst AS node, l{i - 1}.label, COUNT(*) AS cnt
      FROM sym JOIN l{i - 1} ON sym.e_src = l{i - 1}.node
      GROUP BY sym.e_dst, l{i - 1}.label),
    b{i} AS (
      SELECT node, label AS new_label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
        FROM c{i}) WHERE rn = 1),
    l{i} AS (
      SELECT l{i - 1}.node, COALESCE(b{i}.new_label, l{i - 1}.label) AS label
      FROM l{i - 1} LEFT JOIN b{i} ON b{i}.node = l{i - 1}.node)"""
    return sql + f"\n    SELECT node, label FROM l{_LPA_ITERS}"


@register("q_label_propagation", oracle=_lpa_oracle(), category="graph")
def q_label_propagation(spark, sf_dir):
    """Synchronous label propagation, most-frequent-neighbor-label with
    min tie-break (ref: flink-gelly library/LabelPropagation.java);
    oracle = 3 unrolled count/argmax rounds."""
    return label_propagation(_edges(spark, sf_dir), _LPA_ITERS)


@register(
    "q_triangle_count",
    oracle=f"""
    WITH edges0 AS ({_EDGE_SQL}),
    e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM edges0 WHERE src <> dst)
    SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
    FROM e e1
    JOIN e e2 ON e1.b = e2.a
    JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
    """,
    category="graph",
)
def q_triangle_count(spark, sf_dir):
    """Triangle enumeration via the canonical-edge two-join shape (ref:
    flink-gelly library/TriangleEnumerator.java)."""
    return triangle_enumerate(_edges(spark, sf_dir))


# edge weight for SSSP: deterministic small ints so distance sums are
# exact doubles on both engines
_W_SQL = "1 + (src * 3 + dst * 5) % 7"
_SSSP_ITERS = 8
_SSSP_SOURCE = 1


def _sssp_oracle() -> str:
    sql = f"""
    WITH edges AS (
      SELECT src, dst, CAST({_W_SQL} AS DOUBLE) AS w
      FROM ({_EDGE_SQL})
    ),
    d0 AS (SELECT CAST({_SSSP_SOURCE} AS BIGINT) AS node, 0.0 AS dist)"""
    for i in range(1, _SSSP_ITERS + 1):
        sql += f""",
    d{i} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT * FROM d{i - 1}
        UNION ALL
        SELECT e.dst, d.dist + e.w FROM d{i - 1} d JOIN edges e ON e.src = d.node
      ) t GROUP BY node)"""
    return sql + f"\n    SELECT node, round(dist, 9) AS dist FROM d{_SSSP_ITERS}"


@register("q_sssp", oracle=_sssp_oracle(), category="graph")
def q_sssp(spark, sf_dir):
    """Single-source shortest paths, weighted Bellman-Ford (ref:
    flink-gelly library/SingleSourceShortestPaths.java); oracle = the
    relax-round recurrence unrolled to a fixed-depth min/union chain."""
    e = _edges(spark, sf_dir).select(
        "src", "dst", F.expr("CAST(1 + (src * 3 + dst * 5) % 7 AS DOUBLE)").alias("w")
    )
    out = sssp(e, _SSSP_SOURCE, _SSSP_ITERS, weight="w")
    return out.select("node", F.round("dist", 9).alias("dist"))


_HITS_ITERS = 3


def _hits_oracle() -> str:
    sql = f"""
    WITH edges AS ({_EDGE_SQL}),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    h0 AS (SELECT node, 1.0 AS hub FROM nodes)"""
    for i in range(1, _HITS_ITERS + 1):
        sql += f""",
    a{i}_raw AS (
      SELECT nodes.node, COALESCE(SUM(h{i - 1}.hub), 0) AS s
      FROM nodes
      LEFT JOIN edges ON edges.dst = nodes.node
      LEFT JOIN h{i - 1} ON h{i - 1}.node = edges.src
      GROUP BY nodes.node),
    a{i} AS (SELECT node, s / sqrt((SELECT SUM(s * s) FROM a{i}_raw)) AS authority
             FROM a{i}_raw),
    h{i}_raw AS (
      SELECT nodes.node, COALESCE(SUM(a{i}.authority), 0) AS s
      FROM nodes
      LEFT JOIN edges ON edges.src = nodes.node
      LEFT JOIN a{i} ON a{i}.node = edges.dst
      GROUP BY nodes.node),
    h{i} AS (SELECT node, s / sqrt((SELECT SUM(s * s) FROM h{i}_raw)) AS hub
             FROM h{i}_raw)"""
    return sql + f"""
    SELECT h.node, round(h.hub, 9) AS hub, round(a.authority, 9) AS authority
    FROM h{_HITS_ITERS} h JOIN a{_HITS_ITERS} a USING (node)"""


@register("q_hits", oracle=_hits_oracle(), category="graph")
def q_hits(spark, sf_dir):
    """Hubs and authorities with per-phase L2 normalization (ref:
    flink-gelly library/linkanalysis/HITS.java); oracle = 3 unrolled
    gather/normalize rounds with scalar-subquery norms."""
    out = hits(_edges(spark, sf_dir), _HITS_ITERS)
    return out.select(
        "node", F.round("hub", 9).alias("hub"), F.round("authority", 9).alias("authority")
    )


_SYM_SQL = f"""
    SELECT src AS u, dst AS v FROM ({_EDGE_SQL})
    UNION
    SELECT dst, src FROM ({_EDGE_SQL})
"""

_TRI_SQL = f"""
      SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM ({_EDGE_SQL})) e1
      JOIN (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM ({_EDGE_SQL})) e2 ON e1.b = e2.a
      JOIN (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM ({_EDGE_SQL})) e3 ON e1.a = e3.a AND e2.b = e3.b
"""


@register(
    "q_local_clustering",
    oracle=f"""
    WITH sym AS ({_SYM_SQL}),
    deg AS (SELECT u AS node, count(*) AS degree FROM sym GROUP BY u),
    tri AS ({_TRI_SQL}),
    pv AS (SELECT v1 AS node FROM tri UNION ALL SELECT v2 FROM tri
           UNION ALL SELECT v3 FROM tri),
    tc AS (SELECT node, count(*) AS c FROM pv GROUP BY node)
    SELECT deg.node, deg.degree,
           COALESCE(tc.c, 0) AS triangle_count,
           round(CASE WHEN deg.degree >= 2
                      THEN 2.0 * COALESCE(tc.c, 0)
                           / (deg.degree * (deg.degree - 1))
                      ELSE 0 END, 9) AS coefficient
    FROM deg LEFT JOIN tc ON tc.node = deg.node
    """,
    category="graph",
)
def q_local_clustering(spark, sf_dir):
    """Per-vertex clustering coefficient (ref: flink-gelly
    library/clustering/undirected/LocalClusteringCoefficient.java)."""
    out = local_clustering_coefficient(_edges(spark, sf_dir))
    return out.select(
        "node", "degree", "triangle_count", F.round("coefficient", 9).alias("coefficient")
    )


@register(
    "q_vertex_metrics",
    oracle=f"""
    WITH sym AS ({_SYM_SQL}),
    deg AS (SELECT u AS node, count(*) AS degree FROM sym GROUP BY u),
    tri AS (SELECT CAST(count(*) AS BIGINT) AS triangle_count FROM ({_TRI_SQL}) t),
    lcc AS (
      SELECT deg.node, deg.degree,
             CASE WHEN deg.degree >= 2
                  THEN 2.0 * COALESCE(tc.c, 0) / (deg.degree * (deg.degree - 1))
                  ELSE 0 END AS coefficient
      FROM deg LEFT JOIN (
        SELECT node, count(*) AS c FROM (
          SELECT v1 AS node FROM ({_TRI_SQL}) a UNION ALL
          SELECT v2 FROM ({_TRI_SQL}) b UNION ALL
          SELECT v3 FROM ({_TRI_SQL}) c2) pv GROUP BY node) tc
      ON tc.node = deg.node)
    SELECT CAST(count(*) AS BIGINT)                        AS vertex_count,
           CAST(sum(degree) / 2 AS BIGINT)                 AS edge_count,
           CAST(sum(degree * (degree - 1) / 2) AS BIGINT)  AS triplet_count,
           CAST(max(degree) AS BIGINT)                     AS max_degree,
           round(avg(degree), 9)                           AS avg_degree,
           (SELECT triangle_count FROM tri)                AS triangle_count,
           round(3.0 * (SELECT triangle_count FROM tri)
                 / sum(degree * (degree - 1) / 2), 9)      AS global_clustering_coefficient,
           round(avg(coefficient), 9)                      AS avg_clustering_coefficient
    FROM lcc
    """,
    category="graph",
)
def q_vertex_metrics(spark, sf_dir):
    """Whole-graph metrics + global/average clustering coefficient (ref:
    flink-gelly library/metric/undirected/VertexMetrics.java,
    clustering/undirected/GlobalClusteringCoefficient.java,
    AverageClusteringCoefficient.java)."""
    out = vertex_metrics(_edges(spark, sf_dir))
    return out.select(
        "vertex_count",
        "edge_count",
        "triplet_count",
        F.col("max_degree").cast("bigint").alias("max_degree"),
        F.round("avg_degree", 9).alias("avg_degree"),
        "triangle_count",
        F.round("global_clustering_coefficient", 9).alias("global_clustering_coefficient"),
        F.round("avg_clustering_coefficient", 9).alias("avg_clustering_coefficient"),
    )


@register(
    "q_triadic_census",
    oracle=f"""
    WITH sym AS ({_SYM_SQL}),
    deg AS (SELECT u AS node, count(*) AS degree FROM sym GROUP BY u),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(degree) / 2 AS BIGINT) AS m,
                 CAST(sum(degree * (degree - 1) / 2) AS BIGINT) AS w
          FROM deg),
    tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM ({_TRI_SQL}) q)
    SELECT CAST(n * (n - 1) * (n - 2) / 6
                - (m * (n - 2) - 2 * (w - 3 * t) - 3 * t)
                - (w - 3 * t) - t AS BIGINT) AS t0,
           CAST(m * (n - 2) - 2 * (w - 3 * t) - 3 * t AS BIGINT) AS t1,
           CAST(w - 3 * t AS BIGINT) AS t2,
           t AS t3
    FROM s, tri
    """,
    category="graph",
)
def q_triadic_census(spark, sf_dir):
    """Undirected triadic census from the closed-form count identities
    (ref: flink-gelly library/clustering/undirected/TriadicCensus.java)."""
    return triadic_census(_edges(spark, sf_dir))


@register(
    "q_jaccard_index",
    oracle=f"""
    WITH sym AS ({_SYM_SQL}),
    deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
    pairs AS (
      SELECT e1.v AS a, e2.v AS b, count(*) AS shared
      FROM sym e1 JOIN sym e2 ON e1.u = e2.u AND e1.v < e2.v
      GROUP BY e1.v, e2.v)
    SELECT a, b, shared,
           round(CAST(shared AS DOUBLE) / (da.deg + db.deg - shared), 9) AS jaccard
    FROM pairs
    JOIN deg da ON da.node = a
    JOIN deg db ON db.node = b
    """,
    category="graph",
)
def q_jaccard_index(spark, sf_dir):
    """Neighborhood Jaccard similarity per co-neighbored vertex pair
    (ref: flink-gelly library/similarity/JaccardIndex.java)."""
    out = jaccard_index(_edges(spark, sf_dir))
    return out.select("a", "b", "shared", F.round("jaccard", 9).alias("jaccard"))


@register(
    "q_adamic_adar",
    oracle=f"""
    WITH sym AS ({_SYM_SQL}),
    deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
    weighted AS (
      SELECT sym.u, sym.v, 1.0 / ln(deg.deg) AS w
      FROM sym JOIN deg ON deg.node = sym.u)
    SELECT e1.v AS a, e2.v AS b, round(sum(e1.w), 9) AS score
    FROM weighted e1 JOIN weighted e2 ON e1.u = e2.u AND e1.v < e2.v
    GROUP BY e1.v, e2.v
    """,
    category="graph",
)
def q_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction: Σ 1/ln(deg(z)) over shared neighbors
    (ref: flink-gelly library/similarity/AdamicAdar.java)."""
    out = adamic_adar(_edges(spark, sf_dir))
    return out.select("a", "b", F.round("score", 9).alias("score"))


@register(
    "q_graph_summarization",
    oracle=f"""
    WITH edges AS ({_EDGE_SQL}),
    v AS (SELECT node, node % 5 AS val FROM
          (SELECT src AS node FROM edges UNION SELECT dst FROM edges) n)
    SELECT sv.val AS src_value, dv.val AS dst_value,
           count(*) AS edge_group_count
    FROM edges
    JOIN v sv ON sv.node = edges.src
    JOIN v dv ON dv.node = edges.dst
    GROUP BY sv.val, dv.val
    """,
    category="graph",
)
def q_graph_summarization(spark, sf_dir):
    """Graph summarization: vertices grouped by value into supernodes,
    edges into (src_value, dst_value) superedges with multiplicities
    (ref: flink-gelly library/Summarization.java)."""
    e = _edges(spark, sf_dir)
    from my_flink_1_10_2_spark.operators.gelly import _nodes

    vertices = _nodes(e, "src", "dst").withColumn("val", F.col("node") % 5)
    _, superedges = summarize(vertices, e, "val")
    return superedges.select(
        F.col("src_value").alias("src_value"),
        F.col("dst_value").alias("dst_value"),
        "edge_group_count",
    )


@register("q_connected_components_delta", oracle=_CC_ORACLE, category="graph")
def q_connected_components_delta(spark, sf_dir):
    """Connected components as a DELTA iteration (ref:
    DataSet.iterateDelta, DataSet.java:1206): only the frontier —
    vertices whose label improved — shuffles each superstep. Same
    recursive-CTE oracle as the bulk variant; parity proves the
    workset formulation reaches the identical fixpoint."""
    emb = read(spark, sf_dir, "embeddings")
    edges = neardup_pairs(emb).select("src", "dst")
    return connected_components_delta(
        edges, vertices=emb.select("vec_id"), max_iterations=30
    )


_CD_ITERS, _CD_DELTA = 3, 0.5


def _cd_oracle() -> str:
    """Community-detection oracle: the scatter-gather run unrolled to a
    fixed-depth CTE chain with the identical integer-micro-unit scores
    and injected per-superstep attenuation literals."""
    sql = f"""
    WITH edges0 AS ({_EDGE_SQL}),
    sym AS (SELECT src AS e_src, dst AS e_dst FROM edges0
            UNION SELECT dst, src FROM edges0),
    s0 AS (SELECT DISTINCT e_src AS node, e_src AS label,
                  CAST(1000000 AS BIGINT) AS score FROM sym)"""
    for i in range(1, _CD_ITERS + 1):
        att = int(round(_CD_DELTA * 1_000_000 / i))
        sql += f""",
    m{i} AS (
      SELECT sym.e_dst AS node, s.label, s.score
      FROM sym JOIN s{i - 1} s ON sym.e_src = s.node),
    a{i} AS (
      SELECT node, label, SUM(score) AS tot, MAX(score) AS best
      FROM m{i} GROUP BY node, label),
    p{i} AS (
      SELECT node, label AS new_label, best FROM (
        SELECT node, label, best,
               row_number() OVER (PARTITION BY node
                                  ORDER BY tot DESC, label) AS rn
        FROM a{i}) WHERE rn = 1),
    s{i} AS (
      SELECT s.node,
             COALESCE(p.new_label, s.label) AS label,
             CAST(CASE WHEN p.new_label IS NULL THEN s.score
                       WHEN p.new_label = s.label THEN p.best
                       ELSE p.best - {att} END AS BIGINT) AS score
      FROM s{i - 1} s LEFT JOIN p{i} p ON p.node = s.node)"""
    return sql + f"\n    SELECT node, label FROM s{_CD_ITERS}"


@register("q_community_detection", oracle=_cd_oracle(), category="graph")
def q_community_detection(spark, sf_dir):
    """Community detection with hop attenuation (ref: flink-gelly
    library/CommunityDetection.java — Leung et al. 0808.2633): adopt
    the neighbor label with the highest summed score, re-score with
    -delta/superstep on change. Integer micro-unit scores make every
    superstep bitwise-replayable by the unrolled CTE oracle."""
    return community_detection(
        _edges(spark, sf_dir), delta=_CD_DELTA, iterations=_CD_ITERS
    )


@register(
    "q_graph_checksum",
    oracle=f"""
    WITH edges AS ({_EDGE_SQL}),
    v AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    vs AS (SELECT count(*) AS vertex_count,
                  CAST(SUM(('0x' || substr(md5('v#' || CAST(node AS VARCHAR)), 1, 12))::BIGINT) AS BIGINT) AS vh
           FROM v),
    es AS (SELECT count(*) AS edge_count,
                  CAST(SUM(('0x' || substr(md5(CAST(src AS VARCHAR) || '#e#' || CAST(dst AS VARCHAR)), 1, 12))::BIGINT) AS BIGINT) AS eh
           FROM edges)
    SELECT vertex_count, edge_count, vh + eh AS checksum FROM vs, es
    """,
    category="graph",
)
def q_graph_checksum(spark, sf_dir):
    """Graph checksum metric (ref: flink-gelly library/metric/
    ChecksumHashCode.java): element counts plus a deterministic
    md5-derived hash sum over vertices and edges — the debug/regression
    fingerprint for iterative jobs. One row; both engines replay the
    identical 48-bit hashes."""
    return checksum_hash_code(_edges(spark, sf_dir))


_KCORE_K, _KCORE_UNROLL = 2, 10

# k-core needs degree heterogeneity to be interesting: a dense 12-node
# core plus an 8-edge pendant chain.  With k=2 the chain peels exactly
# one node per round from the free end (a genuine 9-round cascade), the
# core survives untouched — exercising both the fixpoint and the early
# termination.
_KCORE_EDGE_SQL = """
    SELECT DISTINCT src, dst FROM (
      SELECT c_custkey %% 12 AS src, (c_custkey // 5) %% 12 AS dst
      FROM customer WHERE c_custkey <= 600
      UNION ALL
      SELECT 11 + (c_custkey %% 8) AS src, 12 + (c_custkey %% 8) AS dst
      FROM customer WHERE c_custkey <= 600
    ) WHERE src <> dst
"""


def _kcore_edges(spark, sf_dir):
    c = read(spark, sf_dir, "customer").filter("c_custkey <= 600")
    core = c.select(
        (F.col("c_custkey") % 12).alias("src"),
        F.expr("(c_custkey div 5) % 12").alias("dst"),
    )
    chain = c.select(
        (F.lit(11) + F.col("c_custkey") % 8).alias("src"),
        (F.lit(12) + F.col("c_custkey") % 8).alias("dst"),
    )
    return core.unionAll(chain).filter(F.col("src") != F.col("dst")).distinct()


def _kcore_oracle() -> str:
    """k-core peel unrolled to a fixed CTE depth; the Spark operator
    runs to fixpoint, so parity also proves the peel converges within
    the unrolled depth on this graph (9 cascade rounds)."""
    # Each peel level references the previous one three times; DuckDB
    # inlines plain CTEs, which would expand the base scan 3^depth
    # times — AS MATERIALIZED keeps the unroll linear.
    sql = f"""
    WITH edges0 AS MATERIALIZED ({_KCORE_EDGE_SQL.replace('%%', '%')}),
    e0 AS MATERIALIZED (SELECT a, b FROM (
             SELECT src AS a, dst AS b FROM edges0
             UNION SELECT dst, src FROM edges0) s WHERE a <> b)"""
    for i in range(1, _KCORE_UNROLL + 1):
        sql += f""",
    k{i} AS MATERIALIZED (SELECT a FROM (SELECT a, count(*) AS c FROM e{i - 1} GROUP BY a)
             WHERE c >= {_KCORE_K}),
    e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{i - 1} e
             JOIN k{i} x ON e.a = x.a JOIN k{i} y ON e.b = y.a)"""
    return sql + f"""
    SELECT a AS node, count(*) AS degree FROM e{_KCORE_UNROLL} GROUP BY a"""


@register("q_k_core", oracle=_kcore_oracle(), category="graph")
def q_k_core(spark, sf_dir):
    """k-core decomposition (iterative peel to fixpoint): vertices of
    the maximal subgraph with min degree >= k, with their in-core
    degrees. Each round = degree agg + two semi-joins; the edge set
    shrinks monotonically, and the pendant chain in the fixture graph
    forces a 9-round one-node-per-round cascade."""
    from my_flink_1_10_2_spark.operators.gelly import k_core

    return k_core(_kcore_edges(spark, sf_dir), k=_KCORE_K)


@register(
    "q_degree_distribution",
    oracle=f"""
    WITH edges0 AS ({_EDGE_SQL}),
    sym AS (SELECT src AS a, dst AS b FROM edges0
            UNION SELECT dst, src FROM edges0),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY a)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices
    FROM deg GROUP BY degree
    """,
    category="graph",
)
def q_degree_distribution(spark, sf_dir):
    """Degree distribution (ref: flink-gelly
    library/metric/undirected/VertexMetrics.java companions /
    asm/degree/VertexDegree.java): undirected degree histogram — the
    first thing anyone plots about a graph.  Two bounded rollups."""
    e = _edges(spark, sf_dir)
    sym = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices")
    )


@register("q_scatter_gather_sssp", oracle=_sssp_oracle(), category="graph")
def q_scatter_gather_sssp(spark, sf_dir):
    """The USER-PROGRAMMABLE scatter-gather iteration surface (ref:
    Graph.runScatterGatherIteration:1521, ScatterGatherIteration.java)
    graded end to end: Bellman-Ford expressed as user scatter/gather/
    update callables over the generic API must reproduce the library
    SSSP's unrolled-recurrence oracle bitwise — evidence the vertex-
    centric API itself is correct, not just the prebuilt algorithms."""
    from my_flink_1_10_2_spark.operators.gelly import scatter_gather

    e = _edges(spark, sf_dir).select(
        "src", "dst", F.expr("CAST(1 + (src * 3 + dst * 5) % 7 AS DOUBLE)").alias("w")
    )
    init = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") == _SSSP_SOURCE)
        .select("node", F.lit(0.0).alias("dist"))
    )

    def scatter(joined):
        # ScatterFunction: propose dist + w along every out-edge
        return joined.select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("msg")
        )

    def update(verts, gathered):
        # VertexUpdateFunction: keep the minimum of state and messages
        return (
            verts.select("node", "dist")
            .unionByName(gathered.select("node", F.col("msg").alias("dist")))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )

    out = scatter_gather(
        e, init, scatter, [F.min("msg").alias("msg")], update, _SSSP_ITERS
    )
    return out.select("node", F.round("dist", 9).alias("dist"))


@register("q_scatter_gather_pagerank", oracle=_pagerank_oracle(), category="graph")
def q_scatter_gather_pagerank(spark, sf_dir):
    """Second grading of the generic scatter-gather surface, on a
    different message algebra: PageRank's sum-gather with a
    full-vertex-set teleport update (dangling vertices receive no
    message and must still update) reproduces the library power-method
    oracle bitwise through user callables."""
    from my_flink_1_10_2_spark.operators.gelly import scatter_gather

    e = _edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    e_deg = e.join(deg, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    teleport = (1.0 - _DAMPING) / n_nodes
    init = nodes.withColumn("rank", F.lit(1.0 / n_nodes))

    def scatter(joined):
        return joined.select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("__deg")).alias("msg"),
        )

    def update(_verts, gathered):
        return nodes.join(gathered, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(_DAMPING) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )

    out = scatter_gather(
        e_deg, init, scatter, [F.sum("msg").alias("contrib")], update, _PR_ITERS
    )
    return out.select("node", F.round("rank", 9).alias("pr"))


@register(
    "q_edge_metrics",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM ({_EDGE_SQL})
    ),
    sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY a),
    wedges AS (
      SELECT s1.a AS a, s2.b AS b, CAST(count(*) AS BIGINT) AS common
      FROM (SELECT a AS a, b AS w FROM sym) s1
      JOIN (SELECT a AS w, b AS b FROM sym) s2 USING (w)
      WHERE s1.a < s2.b
      GROUP BY 1, 2
    )
    SELECT e.a, e.b, da.degree AS deg_a, db.degree AS deg_b,
           CAST(coalesce(w.common, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN coalesce(w.common, 0) = 0 THEN 1 ELSE 0 END AS INT)
             AS is_local_bridge
    FROM e JOIN deg da ON da.a = e.a
           JOIN deg db ON db.a = e.b
           LEFT JOIN wedges w ON w.a = e.a AND w.b = e.b
    """,
    category="gelly",
)
def q_edge_metrics(spark, sf_dir):
    """Per-edge structural metrics (ref: flink-gelly
    library/metric/undirected/EdgeMetrics.java — the per-edge relation
    its wedge utilities build from): endpoint degrees, triangles through
    the edge (embeddedness = common neighbours) and local-bridge flags,
    via the degree aggregate + wedge join — the Jaccard/Adamic-Adar
    candidate shape, no cartesian."""
    from my_flink_1_10_2_spark.operators.gelly import edge_metrics

    return edge_metrics(_edges(spark, sf_dir))


def _closeness_oracle(iters: int = 10, n_sources: int = 8) -> str:
    its = []
    prev = "d0"
    for t in range(1, iters + 1):
        its.append(f"""
    d{t} AS MATERIALIZED (
      SELECT source, node, min(d) AS d FROM (
        SELECT * FROM {prev}
        UNION ALL
        SELECT p.source, sym.v AS node, p.d + 1 AS d
        FROM {prev} p JOIN sym ON sym.u = p.node
      ) GROUP BY 1, 2)""")
        prev = f"d{t}"
    return (f"""
    WITH sym AS MATERIALIZED ({_SYM_SQL}),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    sources AS (SELECT node AS source FROM nodes ORDER BY node LIMIT {n_sources}),
    d0 AS (SELECT source, source AS node, 0 AS d FROM sources),"""
      + ",".join(its)
      + f"""
    SELECT source,
           CAST(count(*) + 1 AS BIGINT) AS n_reached,
           CAST(sum(d) AS BIGINT) AS total_dist,
           CAST(count(*) AS DOUBLE) / CAST(sum(d) AS DOUBLE) AS closeness,
           CAST(sum(CAST(round(1000000000.0 / CAST(d AS DOUBLE)) AS BIGINT))
                AS BIGINT) AS harmonic_e9
    FROM {prev} WHERE d > 0 GROUP BY source
    """)


@register("q_closeness_sampled", oracle=_closeness_oracle(), category="gelly")
def q_closeness_sampled(spark, sf_dir):
    """Sampled closeness + harmonic centrality
    (`operators/gelly.py::closeness_centrality`): BFS min-distance
    fixpoint from the 8 lowest-id sources (the scale recipe — exact
    closeness is O(n·m); the reference's SSSP primitive run from a
    sample), early-stopping on a stable distance set.  Closeness is one
    IEEE division of exact integers; the harmonic sum is emitted in
    exact 1e-9 integer units so no float ordering leaks.  The oracle
    unrolls 10 min-distance rounds — extra rounds past the fixpoint are
    no-ops, so both formulations land on the identical relation."""
    from my_flink_1_10_2_spark.operators.gelly import closeness_centrality

    return closeness_centrality(_edges(spark, sf_dir), n_sources=8, max_iters=10)


@register(
    "q_degree_assortativity",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM ({_EDGE_SQL})
    ),
    sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY a),
    pairs AS (
      SELECT da.d AS x, db.d AS y
      FROM sym s JOIN deg da ON da.a = s.a JOIN deg db ON db.a = s.b
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT n AS n_directed_edges,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
    FROM m
    """,
    category="gelly",
)
def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) — the Pearson correlation of
    endpoint degrees over the symmetrized edge list: positive for
    social-style hub-to-hub mixing, negative for hub-and-spoke
    topologies; the one-number structure fingerprint next to the
    clustering coefficients.  All five moment sums are exact BIGINTs
    over integer degrees; the final expression is a fixed IEEE
    sqrt/divide sequence — the raw DOUBLE is graded bitwise."""
    from my_flink_1_10_2_spark.operators.gelly import _sym

    sym = _sym(_edges(spark, sf_dir), "src", "dst")
    deg = sym.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    pairs = (
        sym.join(deg.select(F.col("u"), F.col("d").alias("x")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("y")), "v"
        )
        .select("x", "y")
    )
    m = pairs.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        F.col("n").alias("n_directed_edges"), (num / den).alias("assortativity")
    )


def _stress_oracle(iters: int = 10, n_sources: int = 8) -> str:
    """Unrolled sigma-level SQL for sampled stress centrality.

    Two unrolled ladders (the closeness-oracle recipe — DuckDB's
    recursive CTEs mis-inline sibling CTEs referenced from a recursive
    step, so no recursion): min-distance rounds d1..dN, then
    path-count levels s1..sN where level t sums the sigma of
    distance-(t-1) predecessors along shortest-path DAG edges."""
    dits = []
    prev = "d0"
    for t in range(1, iters + 1):
        dits.append(f"""
    d{t} AS MATERIALIZED (
      SELECT source, node, min(d) AS d FROM (
        SELECT * FROM {prev}
        UNION ALL
        SELECT p.source, sym.v AS node, p.d + 1 AS d
        FROM {prev} p JOIN sym ON sym.u = p.node
      ) GROUP BY 1, 2)""")
        prev = f"d{t}"
    sits = []
    sprev = "s0"
    for t in range(1, iters + 1):
        sits.append(f"""
    s{t} AS MATERIALIZED (
      SELECT source, node, d, sigma FROM {sprev}
      UNION ALL
      SELECT p.source, sym.v AS node, {t} AS d,
             CAST(sum(p.sigma) AS BIGINT) AS sigma
      FROM {sprev} p
      JOIN sym ON sym.u = p.node
      JOIN md ON md.source = p.source AND md.node = sym.v AND md.d = {t}
      WHERE p.d = {t - 1}
      GROUP BY 1, 2, 3)""")
        sprev = f"s{t}"
    return (
        f"""
    WITH sym AS MATERIALIZED ({_SYM_SQL}),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    sources AS (SELECT node AS source FROM nodes ORDER BY node LIMIT {n_sources}),
    d0 AS (SELECT source, source AS node, 0 AS d FROM sources),"""
        + ",".join(dits)
        + f""",
    md AS MATERIALIZED (SELECT * FROM {prev}),
    s0 AS (SELECT source, source AS node, 0 AS d,
                  CAST(1 AS BIGINT) AS sigma FROM sources),"""
        + ",".join(sits)
        + f""",
    sigma AS MATERIALIZED (SELECT * FROM {sprev}),
    pairs AS MATERIALIZED (
      SELECT g.source AS s, g.node AS t, g.d AS d_st
      FROM sigma g JOIN sources ON sources.source = g.node
      WHERE g.node > g.source
    ),
    contrib AS (
      SELECT a.node AS node, CAST(sum(a.sigma * b.sigma) AS BIGINT) AS stress
      FROM pairs p
      JOIN sigma a ON a.source = p.s
      JOIN sigma b ON b.source = p.t AND b.node = a.node
      WHERE a.node <> p.s AND a.node <> p.t AND a.d + b.d = p.d_st
      GROUP BY 1
    )
    SELECT n.node, coalesce(c.stress, 0) AS stress
    FROM nodes n LEFT JOIN contrib c ON c.node = n.node
    ORDER BY n.node
    """
    )


@register("q_stress_centrality", oracle=_stress_oracle(), category="gelly")
def q_stress_centrality(spark, sf_dir):
    """Sampled stress centrality (`operators/gelly.py::stress_centrality`):
    shortest-path counts through each vertex over the 8-lowest-id source
    pairs — the exact-integer Brandes sibling (sigma machinery identical,
    statistic is a path COUNT so no float ratio accumulation).  The
    oracle recomputes sigma with an independently unrolled SQL ladder and
    the same pair decomposition; both land on identical BIGINTs."""
    from my_flink_1_10_2_spark.operators.gelly import stress_centrality

    return stress_centrality(_edges(spark, sf_dir), n_sources=8, max_iters=10)


_KTRUSS_K, _KTRUSS_UNROLL = 4, 6


def _ktruss_oracle() -> str:
    """k-truss peel unrolled to a fixed depth (Spark runs to fixpoint,
    so parity also proves convergence within the unroll): per level,
    each edge's triangle support = wedges through its endpoints closed
    by the previous level's edge set; edges under k-2 drop."""
    sql = f"""
    WITH edges0 AS MATERIALIZED ({_KCORE_EDGE_SQL.replace('%%', '%')}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges0 WHERE src <> dst)"""
    need = _KTRUSS_K - 2
    for i in range(1, _KTRUSS_UNROLL + 1):
        sql += f""",
    sym{i - 1} AS MATERIALIZED (
      SELECT a, b FROM e{i - 1} UNION ALL SELECT b, a FROM e{i - 1}),
    s{i} AS MATERIALIZED (
      SELECT e.a, e.b, count(*) AS c
      FROM e{i - 1} e
        JOIN sym{i - 1} s1 ON s1.a = e.a
        JOIN sym{i - 1} s2 ON s2.a = e.b AND s2.b = s1.b
      GROUP BY e.a, e.b),
    e{i} AS MATERIALIZED (SELECT a, b FROM s{i} WHERE c >= {need})"""
    return sql + f"""
    SELECT a, b, CAST(c AS BIGINT) AS support
    FROM s{_KTRUSS_UNROLL} WHERE c >= {need}"""


@register("q_k_truss", oracle=_ktruss_oracle(), category="graph")
def q_k_truss(spark, sf_dir):
    """k-truss decomposition (Cohen 2008; operators/gelly.py::k_truss):
    the maximal subgraph where every EDGE closes >= k-2 triangles — the
    cohesion-based sharpening of q_k_core (degree can be faked by a
    star; triangles cannot).  On the k-core fixture graph at k=4 the
    pendant chain and the sparse core fringe peel away, leaving the
    38-edge dense truss with per-edge in-truss supports.  Iterative
    wedge-join peel to fixpoint; the oracle unrolls the identical peel
    and the grade proves convergence within the unrolled depth."""
    from my_flink_1_10_2_spark.operators.gelly import k_truss

    return k_truss(_kcore_edges(spark, sf_dir), k=_KTRUSS_K)
