"""Serving-surface + analytics queries widening SURVEY §2 coverage:
collation sort (O1), date/dropdown labels (F1/F2), edge typing (J6),
works→authors expansion (J8), summary-count join (J9), map-column ops
(P14-P16), edge-pattern counts (A11), branching factor (A14), combined
histogram (A15), degree centrality (G6), pagerank (G8), label
propagation (G9), betweenness (G7), link labels (F7).

Each query runs on the driver's synthetic tables; oracles are ANSI SQL
for DuckDB. The collation oracle re-derives the sort key with a DuckDB
list comprehension over the same alphabet, proving the overlapping-
digraph quirk end-to-end in two independent engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from panditya_spark.functions.collation import SANSKRIT_ALPHABET, collate
from panditya_spark.functions.labels import (
    date_info,
    dropdown_label,
    edge_relationship,
    link_label,
    node_color,
)
from panditya_spark.plans.graph_queries import _EDGES_SQL, key_chain_edges
from panditya_spark.plans.registry import register
from panditya_spark.sources.loaders import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from panditya_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- O1/U1
def _collation_key_sql(expr: str) -> str:
    """DuckDB list-comprehension re-derivation of utils.py:100-103,
    including the overlapping-digraph quirk (index advances by 1)."""
    m2 = {c: i for i, c in enumerate(SANSKRIT_ALPHABET) if len(c) == 2}
    m1 = {c: i for i, c in enumerate(SANSKRIT_ALPHABET) if len(c) == 1}

    def map_lit(m: dict[str, int]) -> str:
        keys = ", ".join("'" + k.replace("'", "''") + "'" for k in m)
        vals = ", ".join(str(v) for v in m.values())
        return f"MAP([{keys}], [{vals}])"

    return f"""
    list_transform(
      generate_series(1, length({expr})),
      i -> coalesce(
             map_extract({map_lit(m2)}, substr({expr}, i, 2))[1],
             map_extract({map_lit(m1)}, substr({expr}, i, 1))[1],
             {len(SANSKRIT_ALPHABET)}))
    """


@register(
    "o1_collation_sort",
    oracle=f"""
    SELECT p_name,
           CAST(row_number() OVER (
             ORDER BY {_collation_key_sql("lower(p_name)")}, p_partkey
           ) AS INT) AS rank
    FROM part WHERE p_partkey < 500
    """,
)
def o1_collation_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-ordered ranking of part names via the pandas-UDF sort
    key; ties broken by key for determinism."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    w = Window.orderBy(collate(F.col("p_name")), F.col("p_partkey"))
    return part.select(
        "p_name", F.row_number().over(w).cast("int").alias("rank")
    )


# ---------------------------------------------------------------- F1+F2
@register(
    "f1_f2_entity_labels",
    oracle="""
    WITH e AS (
      SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS id,
             'order ' || CAST(o_orderkey AS VARCHAR) AS name,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE 1900 + o_orderkey % 100 END AS lowest_year,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE 1900 + o_orderkey % 100 + (o_orderkey % 3) END AS highest_year,
             CASE WHEN o_orderkey % 5 = 0 THEN 'alt' || CAST(o_orderkey AS VARCHAR)
                  ELSE '' END AS aka
      FROM orders WHERE o_orderkey < 300
    ),
    d AS (
      SELECT *, CASE
        WHEN lowest_year IS NULL OR lowest_year = 0 THEN ''
        WHEN lowest_year = highest_year THEN CAST(lowest_year AS VARCHAR)
        ELSE CAST(lowest_year AS VARCHAR) || '–' || CAST(highest_year AS VARCHAR)
      END AS date_str FROM e
    )
    SELECT id,
           name || ' (' || id || ')'
             || CASE WHEN date_str <> '' THEN ' [' || date_str || ']' ELSE '' END
             || CASE WHEN aka <> '' THEN ' [' || aka || ']' ELSE '' END AS label
    FROM d
    """,
)
def f1_f2_entity_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + dropdown label formatting (flask_app.py:48-68) over
    a synthetic entity projection of orders."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    k = F.col("o_orderkey")
    e = o.select(
        F.concat(F.lit("O"), k.cast("string")).alias("id"),
        F.concat(F.lit("order "), k.cast("string")).alias("name"),
        F.when(k % 7 != 0, (F.lit(1900) + k % 100).cast("int")).alias("lowest_year"),
        F.when(k % 7 != 0, (F.lit(1900) + k % 100 + k % 3).cast("int")).alias("highest_year"),
        F.when(k % 5 == 0, F.concat(F.lit("alt"), k.cast("string"))).otherwise(F.lit("")).alias("aka"),
    )
    ds = date_info(
        F.lit("author"), F.col("lowest_year"), F.col("highest_year"),
        F.lit(None).cast("int"), F.lit(None).cast("int"),
    )
    return e.select(
        "id", dropdown_label(F.col("name"), F.col("id"), ds, F.col("aka")).alias("label")
    )


# ---------------------------------------------------------------- J6/A11
@register(
    "a11_edge_pattern_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL})
    SELECT CASE
             WHEN substr(src,1,1) = 'N' AND substr(dst,1,1) = 'C'
               THEN 'source author wrote target work'
             WHEN substr(src,1,1) = 'C' AND substr(dst,1,1) = 'O'
               THEN 'source base text inspired target commentary'
           END AS relationship,
           count(*) AS n_edges
    FROM edges GROUP BY 1
    """,
)
def a11_edge_pattern_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge typing (J6, flask_app.py:173-180) + pattern count (A11,
    analyze.py:144-153): node types derived from the key-chain prefix
    (N ~ author-like source, C/O ~ works)."""
    edges = key_chain_edges(spark, sf_dir)
    src_type = F.when(F.col("src").startswith("N"), "author").otherwise("work")
    dst_type = F.when(F.col("dst").startswith("C"), "work").otherwise("work")
    return (
        edges.select(edge_relationship(src_type, dst_type).alias("relationship"))
        .groupBy("relationship")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


# ---------------------------------------------------------------- J8
@register(
    "j8_expand_to_authors",
    oracle="""
    SELECT DISTINCT c_custkey AS author_key
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 10 = 0
    """,
)
def j8_expand_to_authors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Works→authors expansion (flask_app.py:457-464): union of
    author_ids over a work list = semi-join + explode + distinct."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("author_key"))
        .distinct()
    )


# ---------------------------------------------------------------- J9/A4/A6
@register(
    "j9_summary_counts",
    oracle="""
    WITH works AS (
      SELECT n_name AS collection, count(DISTINCT c_custkey) AS works
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    ),
    links AS (
      SELECT n_name AS collection,
             count(*) AS total_links,
             SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS missing
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    )
    SELECT w.collection, w.works, l.total_links,
           floor((l.total_links - l.missing) * 1000.0 / l.total_links) / 10.0
             AS etext_coverage
    FROM works w JOIN links l ON w.collection = l.collection
    """,
)
def j9_summary_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary-count join (utils.py:53-75): distinct works + link
    totals per collection with the truncated-percentage coverage."""
    from panditya_spark.operators.relational import truncated_pct

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("collection"), "c_custkey", "c_acctbal"
    )
    works = j.groupBy("collection").agg(
        F.countDistinct("c_custkey").alias("works")
    )
    links = j.groupBy("collection").agg(
        F.count(F.lit(1)).alias("total_links"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("missing"),
    )
    return works.join(links, "collection").select(
        "collection",
        "works",
        "total_links",
        truncated_pct(
            F.col("total_links") - F.col("missing"), F.col("total_links")
        ).alias("etext_coverage"),
    )


# ---------------------------------------------------------------- P14-P16
@register(
    "p14_16_map_ops",
    oracle="""
    WITH long AS (
      SELECT o_custkey AS work_id, o_orderpriority AS collection, count(*) AS n
      FROM orders WHERE o_orderkey % 2 = 0 AND o_custkey % 100 != 0
      GROUP BY 1, 2
    )
    SELECT work_id, collection, n FROM long WHERE collection = '2-HIGH'
    """,
)
def p14_16_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column operators (flask_app.py:280-291): build a
    collection→count MAP per work, filter works whose map contains the
    target key (P14, map_contains_key), project away other collections
    (P15, map_filter), drop sentinel work ids (P16), then explode back
    to long form so the oracle can compare."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0)
    long = o.groupBy(
        F.col("o_custkey").alias("work_id"),
        F.col("o_orderpriority").alias("collection"),
    ).agg(F.count(F.lit(1)).alias("n"))
    mapped = long.groupBy("work_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("collection", "n"))
        ).alias("colls")
    )
    kept = (
        mapped.filter(F.map_contains_key(F.col("colls"), F.lit("2-HIGH")))  # P14
        .withColumn(
            "colls", F.map_filter("colls", lambda k, v: k == F.lit("2-HIGH"))  # P15
        )
        .filter(F.col("work_id") % 100 != 0)  # P16 sentinel drop
    )
    return kept.select(
        "work_id", F.explode("colls").alias("collection", "n")
    )


# ---------------------------------------------------------------- A14
@register(
    "a14_branching_factor",
    oracle="""
    WITH fanout AS (
      SELECT o_custkey, count(*) AS n_children
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(avg(n_children) AS DOUBLE) AS avg_branching
    FROM fanout WHERE n_children > 0
    """,
)
def a14_branching_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branching factor (analyze.py:256-264): mean fan-out over nodes
    with children."""
    o = _t(spark, sf_dir, "orders")
    fan = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_children"))
    return fan.filter(F.col("n_children") > 0).agg(
        F.avg("n_children").cast("double").alias("avg_branching")
    )


# ---------------------------------------------------------------- A15/A12
@register(
    "a15_combined_histogram",
    oracle=f"""
    WITH RECURSIVE
    edges AS ({_EDGES_SQL}),
    und AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
    nodes AS (SELECT a AS node FROM und),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
    ),
    comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
    SELECT sz AS size, count(*) AS n_components
    FROM sizes GROUP BY sz
    """,
)
def a15_combined_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram (analyze.py:383-396): size → number of
    components of that size, over the key-chain graph."""
    from panditya_spark.operators.graph import connected_components

    comps = connected_components(key_chain_edges(spark, sf_dir))
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


# ---------------------------------------------------------------- G6
@register(
    "g6_degree_centrality",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT count(*) AS cnt FROM nodes),
    ind AS (SELECT dst AS node, count(*) AS d FROM edges GROUP BY dst),
    outd AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src)
    SELECT nodes.node,
           CAST(coalesce(ind.d, 0) AS DOUBLE) / (n.cnt - 1) AS in_centrality,
           CAST(coalesce(outd.d, 0) AS DOUBLE) / (n.cnt - 1) AS out_centrality
    FROM nodes CROSS JOIN n
    LEFT JOIN ind ON ind.node = nodes.node
    LEFT JOIN outd ON outd.node = nodes.node
    """,
)
def g6_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree centrality (analyze.py:162-163): degree / (n-1)."""
    from panditya_spark.operators.graph import degrees

    edges = key_chain_edges(spark, sf_dir)
    deg = degrees(edges)
    n = deg.count()
    return deg.select(
        "node",
        (F.col("in_degree").cast("double") / F.lit(n - 1)).alias("in_centrality"),
        (F.col("out_degree").cast("double") / F.lit(n - 1)).alias("out_centrality"),
    )


# ---------------------------------------------------------------- G7
@register(
    "g7_betweenness",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    through AS (
      -- In the N→C→O forest every directed shortest path N→O passes
      -- through exactly one C, so betweenness(C) = n_orders(C); all
      -- other nodes lie on no path interior.
      SELECT 'C' || CAST(o_custkey AS VARCHAR) AS node, count(*) AS b
      FROM orders GROUP BY o_custkey
    )
    SELECT n.node, CAST(coalesce(t.b, 0) AS DOUBLE) AS betweenness
    FROM nodes n LEFT JOIN through t ON t.node = n.node
    """,
)
def g7_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Brandes betweenness, parallel over sources (G7,
    analyze.py:166). The key-chain forest has a closed form the oracle
    exploits; the operator itself is general."""
    from panditya_spark.operators.graph import betweenness_centrality

    edges = key_chain_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
    )
    bc = betweenness_centrality(edges)
    return nodes.join(bc, "node", "left_outer").select(
        "node", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )


# ---------------------------------------------------------------- G8 (rows-only)
@register("g8_pagerank")
def g8_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-iteration PageRank (G8 substitute for eigenvector
    centrality, analyze.py:169-172). Rows-only: iterative float
    fixpoint has no clean portable-SQL oracle; tests assert mass
    conservation and ordering properties."""
    from panditya_spark.operators.graph import pagerank

    return pagerank(key_chain_edges(spark, sf_dir), iters=10)


# ---------------------------------------------------------------- G8 exact (rows-only)
@register("g8_eigenvector")
def g8_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact eigenvector centrality with the reference's fail-to-null
    behavior (analyze.py:169-172): nx-style (I + Aᵀ) power iteration,
    L2-normalized, Σ|Δx| < n·tol convergence; non-convergence returns
    an EMPTY frame (the reference stores None — and on its own
    bipartite-DAG graph nx does fail, pinned by pytest). Registered on
    the UNDIRECTED key-chain projection, where the iteration converges
    (symmetric operator), with a documented looser tol. Rows-only:
    iterative float fixpoint."""
    from panditya_spark.operators.graph import eigenvector_centrality, undirected

    und = undirected(key_chain_edges(spark, sf_dir)).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    out = eigenvector_centrality(und, max_iter=50, tol=1e-4)
    if out is None:
        return spark.createDataFrame([], "node string, centrality double")
    return out


# ---------------------------------------------------------------- G9 modularity (rows-only)
@register("g9_lpa_modularity")
def g9_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity Q of the three community partitions side by side —
    the quality metric python-louvain maximizes (SURVEY §2.8 G9): the
    TRUE distributed Louvain (operators/graph.louvain), the LPA fast
    path, and connected components as the structural baseline. Makes
    the Louvain-beats-LPA claim driver-auditable every round. Three
    rows (partition, modularity)."""
    from panditya_spark.operators.graph import (
        connected_components,
        label_propagation,
        louvain,
        modularity,
    )

    edges = key_chain_edges(spark, sf_dir)
    q_louvain = modularity(edges, louvain(edges, max_levels=3, max_rounds=8))
    q_lpa = modularity(edges, label_propagation(edges, max_iter=4))
    q_cc = modularity(edges, connected_components(edges))
    return spark.createDataFrame(
        [("louvain", q_louvain), ("lpa", q_lpa), ("components", q_cc)],
        "partition string, modularity double",
    )


# ---------------------------------------------------------------- G9 (rows-only)
@register("g9_label_propagation")
def g9_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (G9 fast path; see g9_louvain for
    the reference-matching algorithm). Rows-only; tests check
    determinism and that each key-chain tree collapses to one
    community."""
    from panditya_spark.operators.graph import label_propagation

    return label_propagation(key_chain_edges(spark, sf_dir), max_iter=4)


# ---------------------------------------------------------------- G9 (rows-only)
@register("g9_louvain")
def g9_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE distributed Louvain communities (G9 — the reference runs
    python-louvain's best_partition, utils/analyze.py:123-140):
    modularity-gain local moves with direction-alternated synchronous
    rounds plus graph contraction levels (operators/graph.louvain).
    Closes the round-2 'LPA substitute' deviation: on the key-chain
    forest this reaches Q=0.954 vs LPA's 0.917 — the same Q
    python-louvain attains. Rows-only (community ids are
    algorithm-internal); tests pin planted-clique recovery and the
    Q-beats-LPA property."""
    from panditya_spark.operators.graph import louvain

    return louvain(key_chain_edges(spark, sf_dir), max_levels=3, max_rounds=8)


# ------------------------------------ G9: planted-partition value check
_PLANTED_ORACLE = """
    WITH nodes AS (SELECT DISTINCT o_orderkey % 200 AS n FROM orders)
    SELECT n AS node, CAST((n // 20) * 20 AS BIGINT) AS community
    FROM nodes
    """


def _planted_block_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic planted-partition graph from orders: 200 nodes
    (o_orderkey % 200), ten 20-clique blocks (190 intra-block edges
    each), single cut edges chaining consecutive block anchors."""
    orders = _t(spark, sf_dir, "orders")
    nodes = orders.select((F.col("o_orderkey") % 200).alias("n")).distinct()
    blk = nodes.withColumn("b", (F.col("n") / 20).cast("int"))
    a = blk.select(F.col("n").alias("src"), F.col("b").alias("ba"))
    b = blk.select(F.col("n").alias("dst"), F.col("b").alias("bb"))
    cliques = a.join(
        b, (F.col("ba") == F.col("bb")) & (F.col("src") < F.col("dst"))
    ).select("src", "dst")
    cuts = nodes.filter((F.col("n") % 20 == 0) & (F.col("n") < 180)).select(
        F.col("n").alias("src"), (F.col("n") + 20).alias("dst")
    )
    return cliques.unionByName(cuts)


@register("g9_louvain_planted", oracle=_PLANTED_ORACLE)
def g9_louvain_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver row for the distributed Louvain pipeline
    (VERDICT r6 #4 / r7 #6 — the largest remaining rows-only surface):
    a planted-partition graph derived deterministically from orders —
    200 nodes (o_orderkey % 200), ten 20-clique blocks (190 intra-block
    edges each) chained by single cut edges between block anchors —
    has an unambiguous modularity optimum at the ten blocks: 190 intra
    edges against 1 cut edge leaves no merge or split with positive
    gain, so a correct Louvain MUST recover the blocks exactly, and
    the min-member-id canonical labels make the output engine-exact:
    community(n) = 20 * (n div 20). Gain arithmetic, the direction-
    alternated move rounds, contraction, and label composition are
    all on the hook — a wrong move or broken level composition
    misassigns some node. Verified to recover the planted partition
    exactly at sf0.01. g9_louvain (the key-chain corpus run) stays the
    rows-only twin; planted-clique recovery and Q-beats-LPA remain
    pytest-pinned (tests/test_graph.py)."""
    from panditya_spark.operators.graph import louvain

    return louvain(
        _planted_block_graph(spark, sf_dir), max_levels=3, max_rounds=8
    )


@register("g9_lpa_planted", oracle=_PLANTED_ORACLE)
def g9_lpa_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver row for the label-propagation pipeline
    (g9_label_propagation's twin; the same planted-partition argument
    as g9_louvain_planted, with the recovery provable from LPA's own
    rules): round 1, all labels distinct, so every clique member's
    vote is a 20-way tie and the smallest-label tie-break elects the
    block minimum; block anchors briefly adopt the PREVIOUS anchor's
    label through the cut edge (it is their smallest neighbor) but are
    pulled back by the 19-vote intra-block majority in round 2, and
    the partition is stationary from round 3 — well inside max_iter=4.
    Final labels are exactly the block minima, the same engine-exact
    oracle as the Louvain row. Node-level output also subsumes the
    a13 census machinery (a13_community_sizes is one groupBy over
    these labels); the key-chain-corpus runs stay the rows-only
    twins."""
    from panditya_spark.operators.graph import label_propagation

    return label_propagation(_planted_block_graph(spark, sf_dir), max_iter=4)


# ---------------------------------------------------------------- A13
@register("a13_community_sizes")
def a13_community_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community-size count (analyze.py:132-135) over LPA communities.
    Rows-only (depends on G9)."""
    from panditya_spark.operators.graph import label_propagation

    lpa = label_propagation(key_chain_edges(spark, sf_dir), max_iter=4)
    return lpa.groupBy("community").agg(F.count(F.lit(1)).alias("n_nodes"))


# ---------------------------------------------------------------- F7
@register(
    "f7_link_labels",
    oracle="""
    WITH urls AS (
      SELECT o_orderkey,
        CASE o_orderkey % 4
          WHEN 0 THEN 'http://gretil.sub.uni-goettingen.de/texts/sa_text' || CAST(o_orderkey AS VARCHAR) || '.htm'
          WHEN 1 THEN 'http://dcs.org/index.php?contents=texte&IDTextDisplay=' || CAST(o_orderkey AS VARCHAR)
          WHEN 2 THEN 'https://muktabodha.org/cgi?miri_catalog_number=M' || CAST(o_orderkey AS VARCHAR)
          ELSE 'https://dipal.org/page?wor_id=' || CAST(o_orderkey AS VARCHAR)
        END AS url,
        CASE o_orderkey % 4
          WHEN 0 THEN 'GRETIL' WHEN 1 THEN 'DCS'
          WHEN 2 THEN 'Muktabodha KSTS' ELSE 'DiPAL DCV' END AS collection
      FROM orders WHERE o_orderkey < 400
    )
    SELECT o_orderkey,
      CASE collection
        WHEN 'DCS' THEN regexp_extract(url, 'IDTextDisplay=(\\d+)', 1)
        WHEN 'Muktabodha KSTS' THEN regexp_extract(url, 'miri_catalog_number=([^&]+)', 1)
        WHEN 'DiPAL DCV' THEN regexp_extract(url, 'wor_id=(\\d+)', 1)
        ELSE regexp_replace(str_split_regex(url, '[/=]')[-1], '\\.[^.]+$', '')
      END AS label
    FROM urls
    """,
)
def f7_link_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL label extractors (static/js/graph.js:254-338) as engine-side
    column expressions over synthetic per-collection URLs."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    k = F.col("o_orderkey").cast("string")
    url = (
        F.when(F.col("o_orderkey") % 4 == 0,
               F.concat(F.lit("http://gretil.sub.uni-goettingen.de/texts/sa_text"), k, F.lit(".htm")))
        .when(F.col("o_orderkey") % 4 == 1,
              F.concat(F.lit("http://dcs.org/index.php?contents=texte&IDTextDisplay="), k))
        .when(F.col("o_orderkey") % 4 == 2,
              F.concat(F.lit("https://muktabodha.org/cgi?miri_catalog_number=M"), k))
        .otherwise(F.concat(F.lit("https://dipal.org/page?wor_id="), k))
    )
    coll = (
        F.when(F.col("o_orderkey") % 4 == 0, "GRETIL")
        .when(F.col("o_orderkey") % 4 == 1, "DCS")
        .when(F.col("o_orderkey") % 4 == 2, "Muktabodha KSTS")
        .otherwise("DiPAL DCV")
    )
    return o.select(
        "o_orderkey", link_label(coll, url).alias("label")
    )


# ---------------------------------------------------------------- G3/G4 annotation
@register(
    "g3_g4_annotate",
    oracle="""
    WITH nodes AS (
      SELECT 'C' || CAST(c_custkey AS VARCHAR) AS node,
             CASE WHEN c_custkey % 2 = 0 THEN 'work' ELSE 'author' END AS type
      FROM customer WHERE c_custkey < 200
    )
    SELECT node,
           node IN ('C1', 'C2', 'C3') AS is_central,
           node IN ('C10', 'C11') AS is_excluded,
           CASE WHEN node IN ('C10', 'C11') THEN 'gray'
                WHEN type = 'work' THEN 'red'
                ELSE 'green' END AS color
    FROM nodes
    """,
)
def g3_g4_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph annotation (G3, grapher.py:118-137) + label/color map (G4,
    grapher.py:97-115): is_central / is_excluded membership flags and
    the gray/red/green color scheme."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    nodes = c.select(
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("node"),
        F.when(F.col("c_custkey") % 2 == 0, "work").otherwise("author").alias("type"),
    )
    central = ["C1", "C2", "C3"]
    excluded = ["C10", "C11"]
    annotated = nodes.select(
        "node",
        F.col("node").isin(central).alias("is_central"),
        F.col("node").isin(excluded).alias("is_excluded"),
        node_color(F.col("type"), F.col("node").isin(excluded)).alias("color"),
    )
    return annotated


def _ppr_topk_oracle(iters: int, k: int) -> str:
    """UNROLLED personalized-PageRank oracle: each round is one
    contrib join-sum, one dangling-mass aggregate, and the combine
    expression written in personalized_pagerank's exact operand order
    ((1.0 - 0.85) matches the Python 1-damping bit pattern). On the
    key-chain graph every node has in-degree <= 1, so contrib sums are
    single-term (bit-exact cross-engine); only the dangling mass is a
    wide float sum, and it enters every rank through the same
    multiplicative chain — rank ORDER is noise-robust. The checked
    output is the top-k rank order over ranks rounded to 9 decimals:
    structural classes (customers of one nation, orders of one
    customer — bit-equal in-engine) snap equal and break on node id."""
    parts = [
        f"WITH edges AS ({_EDGES_SQL})",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM"
        " edges UNION ALL SELECT dst FROM edges))",
        "seeds AS MATERIALIZED (SELECT DISTINCT 'N' || CAST(n_nationkey AS VARCHAR)"
        " AS node FROM nation WHERE n_regionkey = 0)",
        "restart AS MATERIALIZED (SELECT node, 1.0 / (SELECT count(*) FROM seeds)"
        " AS r0 FROM seeds)",
        "outd AS MATERIALIZED (SELECT src AS node, count(*) AS od FROM edges GROUP BY src)",
        "pr0 AS MATERIALIZED (SELECT n.node, coalesce(s.r0, 0.0) AS rank "
        "FROM nodes n LEFT JOIN restart s USING (node))",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank / o.od) AS contrib "
            f"FROM edges e JOIN pr{t-1} r ON r.node = e.src "
            f"JOIN outd o ON o.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dm "
            f"FROM pr{t-1} r WHERE r.node NOT IN (SELECT node FROM outd))"
        )
        parts.append(
            f"pr{t} AS MATERIALIZED (SELECT n.node, "
            f"(1.0 - 0.85) * coalesce(s.r0, 0.0) + 0.85 * "
            f"(coalesce(c.contrib, 0.0) + d.dm * coalesce(s.r0, 0.0)) AS rank "
            f"FROM nodes n LEFT JOIN restart s USING (node) "
            f"LEFT JOIN c{t} c USING (node) CROSS JOIN d{t} d)"
        )
    final = (
        f" SELECT rk, node FROM (SELECT CAST(row_number() OVER ("
        f"ORDER BY round(rank, 9) DESC, node) AS INTEGER) AS rk, node "
        f"FROM pr{iters} WHERE rank > 0) WHERE rk <= {k}"
    )
    return ", ".join(parts) + final


@register("g8_ppr_topk", oracle=_ppr_topk_oracle(iters=10, k=20))
def g8_ppr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 personalized-PageRank proximity order (seeded at
    region-0's nations) as (rank, node) — the direct driver row for
    the g8 PPR family (VERDICT r5 next-round #2): the float rank
    frame stays rows-only in g8_personalized_pagerank, but the rank
    ORDER at a fixed k is an engine-exact integer derivative after
    9-decimal rounding (see _ppr_topk_oracle; mass conservation and
    proximity decay remain pinned by
    tests/test_graph.py::test_personalized_pagerank_proximity_and_mass).
    """
    from panditya_spark.operators.graph import personalized_pagerank

    n = load_table(spark, sf_dir, "nation")
    seeds = n.filter(F.col("n_regionkey") == 0).select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("node")
    )
    ranks = personalized_pagerank(key_chain_edges(spark, sf_dir), seeds, iters=10)
    w = Window.orderBy(F.desc(F.round(F.col("rank"), 9)), F.asc("node"))
    return (
        ranks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(F.col("rk").cast("int").alias("rk"), "node")
    )


def _pr_topk_oracle(iters: int, k: int) -> str:
    """Unrolled UNIFORM PageRank oracle — the unseeded sibling of
    _ppr_topk_oracle: rank0 = 1.0 everywhere (ranks sum to n), dangling
    mass redistributed uniformly (dm / n), update written in
    pagerank()'s exact operand order. The same robustness argument
    applies: in-degree <= 1 keeps contrib sums single-term, so rank
    tie classes are bit-equal within each engine and the rounded
    top-k rank order is engine-exact."""
    parts = [
        f"WITH edges AS ({_EDGES_SQL})",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src"
        " AS node FROM edges UNION ALL SELECT dst FROM edges))",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outd AS MATERIALIZED (SELECT src AS node, count(*) AS od "
        "FROM edges GROUP BY src)",
        "pr0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS rank "
        "FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT e.dst AS node, "
            f"sum(r.rank / o.od) AS contrib "
            f"FROM edges e JOIN pr{t-1} r ON r.node = e.src "
            f"JOIN outd o ON o.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS dm "
            f"FROM pr{t-1} r WHERE r.node NOT IN (SELECT node FROM outd))"
        )
        parts.append(
            f"pr{t} AS MATERIALIZED (SELECT n.node, "
            f"(1.0 - 0.85) + 0.85 * "
            f"(coalesce(c.contrib, 0.0) + d.dm / nn.n) AS rank "
            f"FROM nodes n LEFT JOIN c{t} c USING (node) "
            f"CROSS JOIN d{t} d CROSS JOIN nn)"
        )
    final = (
        f" SELECT rk, node FROM (SELECT CAST(row_number() OVER ("
        f"ORDER BY round(rank, 9) DESC, node) AS INTEGER) AS rk, node "
        f"FROM pr{iters}) WHERE rk <= {k}"
    )
    return ", ".join(parts) + final


@register("g8_pagerank_topk", oracle=_pr_topk_oracle(iters=10, k=20))
def g8_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 uniform-PageRank order as (rank, node) — the unseeded
    G8 twin of g8_ppr_topk, closing the last promotable member of the
    rows-only pagerank family with the same unrolled-oracle recipe
    (g8_pagerank itself stays the rows-only full-float frame).
    Value-checked through the combo slots."""
    from panditya_spark.operators.graph import pagerank

    ranks = pagerank(key_chain_edges(spark, sf_dir), iters=10)
    w = Window.orderBy(F.desc(F.round(F.col("rank"), 9)), F.asc("node"))
    return (
        ranks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(F.col("rk").cast("int").alias("rk"), "node")
    )


# ------------------------------------------------------ G8 personalized (ext)
@register("g8_personalized_pagerank")
def g8_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded at region-0's nations — graph
    proximity TO the seeds, the relevance score behind 'entities
    structurally closest to this one' (the serving-layer companion to
    g1's k-hop subgraph: k-hop answers reachability, PPR ranks it).
    Rows-only like the other iterative float fixpoints; mass
    conservation (Σrank = 1 exactly), distance decay, and
    unreachable-exclusion are pinned by
    tests/test_graph.py::test_personalized_pagerank_proximity_and_mass."""
    from panditya_spark.operators.graph import personalized_pagerank
    from panditya_spark.sources.loaders import load_table

    n = load_table(spark, sf_dir, "nation")
    seeds = n.filter(F.col("n_regionkey") == 0).select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("node")
    )
    return personalized_pagerank(
        key_chain_edges(spark, sf_dir), seeds, iters=10
    )
