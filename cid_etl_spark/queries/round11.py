"""Round-11 additions: graph link prediction, association rules,
information-theoretic column profiling, classifier calibration, and
per-group exponential smoothing with a recursive-CTE oracle.

Reference scope: the reference repo (judson-fluap/cid-etl,
etl_cid10.py) has none of these — they are north-star extensions for
LLM training-data curation and analytics pipelines, following the
standing pattern: every query is a Catalyst-declarative plan (Python
only where the semantics genuinely need a coupled recurrence), each
with a DuckDB oracle that replays the math bit-for-bit.

Float-determinism discipline (same as operators.classifier): wherever
a score is a SUM over an unordered set, the summand is an INTEGER
(fixed-point micro units), so cross-engine addition order can never
flip a rounded value.  Division/log/exp appear only as single
operations on already-aggregated exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cid_etl_spark.queries._registry import _register
from cid_etl_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# Adamic-Adar link prediction on the co-purchase graph
# ---------------------------------------------------------------------------

#: Common neighbors with degree above this never vote: a hub shared by
#: everyone carries ~no signal (1/ln(deg) -> 0) yet costs deg^2 pairs —
#: the standard AA degree cap bounds the per-node pair blowup so the
#: worst task is CAP^2 pairs regardless of corpus size.
_AA_DEGREE_CAP = 256
_AA_TOP_K = 100
#: Target pair-generations per task for the center-node self-join —
#: the stage repartitions to sum(min(d,cap)^2) / this (round 12, from
#: the sf1 guard violation: a denser graph needs width, not a cap).
_AA_PAIRS_PER_TASK = 4_000_000

_ADAMIC_ADAR_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
adj AS (SELECT src AS node, dst AS nbr FROM e0
        UNION ALL SELECT dst AS node, src AS nbr FROM e0),
deg AS (SELECT node, count(*) AS degree FROM adj GROUP BY node),
mid AS (
  SELECT a.node, a.nbr,
         CAST(round(1000000.0 / ln(d.degree)) AS BIGINT) AS w_micro
  FROM adj a JOIN deg d ON a.node = d.node
  WHERE d.degree BETWEEN 2 AND {_AA_DEGREE_CAP}
),
pairs AS (
  SELECT a.nbr AS u, b.nbr AS v,
         CAST(sum(a.w_micro) AS BIGINT) AS score_micro,
         CAST(count(*) AS BIGINT) AS common_neighbors
  FROM mid a JOIN mid b ON a.node = b.node AND a.nbr < b.nbr
  GROUP BY 1, 2
),
nonedges AS (
  SELECT p.* FROM pairs p
  ANTI JOIN e0 e ON p.u = e.src AND p.v = e.dst
)
SELECT u, v, common_neighbors, score_micro,
       round(score_micro / 1000000.0, 6) AS aa_score
FROM nonedges
ORDER BY score_micro DESC, u, v
LIMIT {_AA_TOP_K}
"""


@_register("adamic_adar_link_prediction", _ADAMIC_ADAR_SQL)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the support->=2 co-purchase graph: for every
    NON-edge pair (u, v) sharing >=1 common neighbor, the Adamic-Adar
    score sum(1/ln(deg(z))) over common neighbors z; top-100.

    Completes the graph suite's feature-generation story (census /
    centrality / communities / cores already exist): AA scores are the
    classic similarity feature for recommending related items or
    flagging near-duplicate entities that the edge sample missed.

    Scale design: pairs are generated PER COMMON NEIGHBOR (one keyed
    self-join of the adjacency list on the center node), so the blowup
    is sum(deg(z)^2) — the degree cap (:data:`_AA_DEGREE_CAP`) bounds
    the PER-NODE term (hubs contribute ~zero signal, 1/ln(deg) -> 0,
    but quadratic pairs, so they never vote), and the r12 sf1 guard
    run showed the cap alone is not enough: a DENSER graph (sf1:
    20k nodes, avg degree 120, sum d^2 = 3.0e8) blows the per-task
    volume with every node under the cap (longest task 37 s, 30 GB of
    hash-agg spill at 32 partitions).  The pair stage is therefore
    WIDTH-ADAPTIVE: one bounded 1-row aggregate measures the exact
    pair volume sum(d^2) over voting nodes (2 <= d <= cap; hubs above
    the cap are excluded by the between-filter, not clamped — they
    contribute 0, not cap^2) and the self-join repartitions to
    ceil(volume / _AA_PAIRS_PER_TASK) node partitions, so the longest
    task carries ~constant work at ANY density (the same
    measured-stats-then-size idiom as the LSH hot-bucket guard; the
    extra action is one aggregate over the node-grain degree table).
    Existing edges drop with one anti-join.  Integer-first: each
    neighbor's weight is round(1e6/ln(deg)) in micro units, the score
    an exact BIGINT sum — addition order can never flip the rounded
    value or the top-k ordering, which DuckDB replays exactly."""
    from cid_etl_spark.queries.curation import _copurchase_edges

    # The edge list feeds THREE consumers (two adjacency directions +
    # the final anti-join); localCheckpoint materializes the basket
    # self-join once instead of re-executing it per branch (same
    # fault-tolerance trade as operators/graph.py's module note).
    edges = _copurchase_edges(spark, sf_dir, min_support=2).localCheckpoint(
        eager=False
    )
    adj = edges.selectExpr("src AS node", "dst AS nbr").unionAll(
        edges.selectExpr("dst AS node", "src AS nbr")
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    mid = (
        adj.join(deg, "node")
        .filter(F.col("degree").between(2, _AA_DEGREE_CAP))
        .select(
            "node",
            "nbr",
            F.round(F.lit(1000000.0) / F.log(F.col("degree")))
            .cast("long")
            .alias("w_micro"),
        )
    )
    # Size the pair-generation stage from the data (r12): the exact
    # expansion volume is sum(d^2) over voting nodes — one bounded
    # 1-row action over the node-grain degree table (edges are already
    # checkpointed, so this re-runs one cheap aggregate, not the
    # basket self-join).  Plan-only consumers (PLANS.md generation,
    # batch planning) signal via plans.fragments.plan_only (or the
    # process-level SPARK_GRAFT_PLAN_ONLY env var) to skip the sizing
    # job — it executes Spark work at DataFrame-CONSTRUCTION time
    # (ADVICE r12 #2), which plan audits neither need nor want to pay;
    # they fall back to defaultParallelism, which only changes the
    # repartition width, never the result.
    from cid_etl_spark.plans.fragments import plan_only_active

    if plan_only_active():
        pair_volume = 0
    else:
        pair_volume = (
            deg.filter(F.col("degree").between(2, _AA_DEGREE_CAP))
            .agg(F.sum(F.col("degree") * F.col("degree")).alias("v"))
            .collect()[0]["v"]
            or 0
        )
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        -(-int(pair_volume) // _AA_PAIRS_PER_TASK),
    )
    mid = mid.repartition(n_parts, "node")
    a, b = mid.alias("a"), mid.alias("b")
    # The pair stream is distinct-heavy (common-neighbor pairs barely
    # collapse), so the FINAL (u, v) aggregation and the anti-join must
    # run at the same adaptive width — at the default 32 shuffle
    # partitions the r12 sf1 guard measured a 29 s sort-agg task with
    # 15 GB of spill on exactly this stage.  The explicit (u, v)
    # repartition satisfies the aggregate's distribution AND is reused
    # by the anti-join's pairs side, so widening costs no extra
    # exchange downstream.
    pairs = (
        a.join(b, (F.col("a.node") == F.col("b.node")) & (F.col("a.nbr") < F.col("b.nbr")))
        .select(
            F.col("a.nbr").alias("u"),
            F.col("b.nbr").alias("v"),
            F.col("a.w_micro").alias("w_micro"),
        )
        .repartition(n_parts, "u", "v")
        .groupBy("u", "v")
        .agg(
            F.sum("w_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("common_neighbors"),
        )
    )
    nonedges = pairs.join(
        edges,
        (pairs["u"] == edges["src"]) & (pairs["v"] == edges["dst"]),
        "left_anti",
    )
    return (
        nonedges.select(
            "u",
            "v",
            "common_neighbors",
            "score_micro",
            F.round(F.col("score_micro") / 1000000.0, 6).alias("aa_score"),
        )
        .orderBy(F.col("score_micro").desc(), "u", "v")
        .limit(_AA_TOP_K)
    )


# ---------------------------------------------------------------------------
# Association rules (confidence + lift) from co-purchase pairs
# ---------------------------------------------------------------------------

_ASSOC_TOP_K = 100

_ASSOC_RULES_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
supp AS (SELECT l_partkey, count(*) AS item_orders FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
         count(*) AS pair_orders
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.antecedent, p.consequent,
       CAST(p.pair_orders AS BIGINT) AS pair_orders,
       CAST(sa.item_orders AS BIGINT) AS antecedent_orders,
       CAST(sc.item_orders AS BIGINT) AS consequent_orders,
       round(CAST(p.pair_orders AS DOUBLE) / sa.item_orders, 6) AS confidence,
       round(CAST(p.pair_orders AS DOUBLE) * n.n_orders
             / (CAST(sa.item_orders AS DOUBLE) * sc.item_orders), 6) AS lift
FROM pairs p
JOIN supp sa ON p.antecedent = sa.l_partkey
JOIN supp sc ON p.consequent = sc.l_partkey
CROSS JOIN n
ORDER BY lift DESC, confidence DESC, p.antecedent, p.consequent
LIMIT {_ASSOC_TOP_K}
"""


@_register("assoc_rules_copurchase", _ASSOC_RULES_SQL)
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: directional rules
    u -> v with pair support >= 2, scored by confidence
    (P(v|u) = pairs/supp(u)) and lift (confidence / P(v)); top-100 by
    lift.  Extends ``copurchase_part_pairs`` (raw co-occurrence
    counts) with the rule-mining semantics an item-recommendation or
    data-mixture diagnostic actually consumes.

    Scale: one basket-keyed self-join bounded by basket size squared
    (the same plan family as the census suite), singleton supports
    are one groupBy, and the support tables join back keyed on the
    item (broadcast when dims fit).  All counts are exact integers;
    confidence and lift are SINGLE divisions of exact integers, so
    rounding is engine-stable and the (lift, confidence, u, v)
    ordering is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    # Four consumers (pair self-join x2, supports, order count):
    # materialize the per-order item set once.
    items = (
        li.select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders_df = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("item_orders"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= 2)
    )
    sa = supp.selectExpr("l_partkey AS antecedent", "item_orders AS antecedent_orders")
    sc = supp.selectExpr("l_partkey AS consequent", "item_orders AS consequent_orders")
    return (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "antecedent",
            "consequent",
            "pair_orders",
            "antecedent_orders",
            "consequent_orders",
            F.round(
                F.col("pair_orders").cast("double") / F.col("antecedent_orders"), 6
            ).alias("confidence"),
            F.round(
                F.col("pair_orders").cast("double")
                * F.col("n_orders")
                / (
                    F.col("antecedent_orders").cast("double")
                    * F.col("consequent_orders")
                ),
                6,
            ).alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(),
            F.col("confidence").desc(),
            "antecedent",
            "consequent",
        )
        .limit(_ASSOC_TOP_K)
    )


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns
# ---------------------------------------------------------------------------

_MUTUAL_INFO_SQL = """
WITH joint AS (
  SELECT lang, source, count(*) AS n_ls FROM documents GROUP BY 1, 2
),
e AS (
  SELECT n_ls,
         sum(n_ls) OVER () AS n,
         sum(n_ls) OVER (PARTITION BY lang) AS n_l,
         count(*) OVER (PARTITION BY lang) AS k_l,
         sum(n_ls) OVER (PARTITION BY source) AS n_s,
         count(*) OVER (PARTITION BY source) AS k_s
  FROM joint
)
SELECT CAST(max(n) AS BIGINT) AS n_docs,
       round(-sum((n_l / n) * log2(n_l / n) / k_l), 6) AS h_lang_bits,
       round(-sum((n_s / n) * log2(n_s / n) / k_s), 6) AS h_source_bits,
       round(sum((n_ls / n) * log2(n_ls * n / (CAST(n_l AS DOUBLE) * n_s))), 6)
           AS mi_bits,
       round(sum((n_ls / n) * log2(n_ls * n / (CAST(n_l AS DOUBLE) * n_s)))
             / sqrt((-sum((n_l / n) * log2(n_l / n) / k_l))
                    * (-sum((n_s / n) * log2(n_s / n) / k_s))), 6) AS nmi
FROM e
"""


@_register("mutual_information_lang_source", _MUTUAL_INFO_SQL)
def mutual_information_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical corpus columns
    (documents.lang x documents.source): MI in bits, both marginal
    entropies, and normalized MI (MI / sqrt(H_l * H_s)).  The standard
    dependence probe a mixture designer runs before stratifying — a
    high NMI says the two stratification keys are redundant; the
    chi-square row tests significance, this measures STRENGTH in bits.

    Scale: the fact scans ONCE into the joint groupBy (bounded by
    |langs| x |sources| rows, tiny); margins come from window sums
    OVER THE JOINT TABLE (the marginal entropies divide each per-row
    term by the margin's row multiplicity, so re-aggregation branches
    — which Spark would execute as separate fact scans — never exist
    in the plan).  Everything after the first shuffle moves <=100 rows
    regardless of corpus size.  The summand terms are doubles over the
    same joint table in both engines, rounded at 6 dp (same precedent
    as the entropy/chi-sq rows)."""
    d = load_table(spark, sf_dir, "documents")
    joint = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_ls"))
    e = joint.select(
        "n_ls",
        F.sum("n_ls").over(Window.partitionBy()).alias("n"),
        F.sum("n_ls").over(Window.partitionBy("lang")).alias("n_l"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("k_l"),
        F.sum("n_ls").over(Window.partitionBy("source")).alias("n_s"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("k_s"),
    )
    mi_term = (F.col("n_ls") / F.col("n")) * F.log2(
        F.col("n_ls") * F.col("n") / (F.col("n_l").cast("double") * F.col("n_s"))
    )
    hl_term = (F.col("n_l") / F.col("n")) * F.log2(F.col("n_l") / F.col("n")) / F.col(
        "k_l"
    )
    hs_term = (F.col("n_s") / F.col("n")) * F.log2(F.col("n_s") / F.col("n")) / F.col(
        "k_s"
    )
    return e.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(-F.sum(hl_term), 6).alias("h_lang_bits"),
        F.round(-F.sum(hs_term), 6).alias("h_source_bits"),
        F.round(F.sum(mi_term), 6).alias("mi_bits"),
        F.round(
            F.sum(mi_term) / F.sqrt((-F.sum(hl_term)) * (-F.sum(hs_term))), 6
        ).alias("nmi"),
    )


# ---------------------------------------------------------------------------
# Classifier calibration: reliability table + expected calibration error
# ---------------------------------------------------------------------------

_ECE_BINS = 10
#: Heuristic-quality threshold that defines the pseudo-label: the
#: functions.text.quality_score factor products land in a small
#: discrete set {1.0, 0.7, 0.5, 0.4, ...}; >= 0.7 means "no factor
#: flagged except possibly the stopword floor".
_ECE_LABEL_THRESHOLD = 0.7


def _ece_sql() -> str:
    from cid_etl_spark.functions.text import STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) > 0
              THEN string_split_regex(lower(trim(text)), '\s+')
              ELSE []::VARCHAR[] END AS toks,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace
  FROM documents
),
clf AS (
  SELECT doc_id, len(toks) AS n_tokens,
         COALESCE(CAST(list_sum(list_transform(toks,
             tk -> ((('0x' || substr(md5(tk), 1, 7))::BIGINT % 4096)
                    * 2654435761) % 4097 - 2048)) AS BIGINT), 0) AS margin
  FROM t
),
pred AS (
  SELECT doc_id,
         CASE WHEN n_tokens > 0
              THEN round(1.0 / (1.0 + exp(-4.0 * (margin::DOUBLE
                                                  / (n_tokens * 2048.0)))), 6)
              ELSE 0.5 END AS conf
  FROM clf
),
heur AS (
  SELECT doc_id,
         round(CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END
               * CASE WHEN sw >= 0.05 THEN 1.0 ELSE 0.7 END
               * CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.4 END, 4) AS quality
  FROM (
    SELECT doc_id,
           CASE WHEN len(toks) > 0
                THEN CAST(list_aggregate(list_transform(toks, x -> length(x)),
                                         'sum') AS DOUBLE) / len(toks)
                ELSE 0.0 END AS mtl,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, x -> x IN ({stop_list})))
                          AS DOUBLE) / len(toks)
                ELSE 0.0 END AS sw,
           CASE WHEN n_nonspace > 0
                THEN CAST(n_punct AS DOUBLE) / n_nonspace
                ELSE 0.0 END AS pr
    FROM t
  )
),
scored AS (
  SELECT least(CAST(floor(p.conf * {_ECE_BINS}) AS BIGINT), {_ECE_BINS - 1}) AS bin,
         p.conf,
         CASE WHEN h.quality >= {_ECE_LABEL_THRESHOLD} THEN 1 ELSE 0 END AS label
  FROM pred p JOIN heur h USING (doc_id)
),
bins AS (
  SELECT bin,
         CAST(count(*) AS BIGINT) AS n_docs,
         round(avg(conf), 6) AS mean_conf,
         round(avg(CAST(label AS DOUBLE)), 6) AS frac_pos,
         round(abs(avg(conf) - avg(CAST(label AS DOUBLE))), 6) AS abs_gap
  FROM scored GROUP BY bin
)
SELECT bin, n_docs, mean_conf, frac_pos, abs_gap,
       round(sum(n_docs * abs_gap) OVER () / sum(n_docs) OVER (), 6) AS ece
FROM bins
ORDER BY bin
"""


@_register("calibration_ece_classifier", _ece_sql())
def calibration_ece_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table + expected calibration error for the hashed
    linear quality classifier, judged against an INDEPENDENT label
    (the heuristic Gopher-style quality score thresholded at
    :data:`_ECE_LABEL_THRESHOLD`): per confidence decile, the mean
    predicted confidence vs the realized positive rate, and the
    count-weighted ECE.  The standard pre-deployment audit for any
    model-based corpus filter — a filter can be accurate but
    mis-calibrated, and threshold choices inherit the miscalibration.

    Scale: ONE map-only scoring pass over the scan — the classifier
    margin and the heuristic label are both whole-stage-codegen Column
    expressions in a single projection (the label rides the
    classifier's ``passthrough``, so no second scan and no doc_id
    re-join exist in the plan) -> one 10-key groupBy -> window total
    over 10 rows.  Shuffle volume is the bin table, not the corpus.
    Confidence is derived from the exact integer margin
    (operators.classifier), the label from the exact discrete
    heuristic, so bin assignment is engine-stable; in-bin averages
    follow the standing 6-dp double precedent."""
    from cid_etl_spark.functions.text import quality_score
    from cid_etl_spark.operators.classifier import quality_classifier

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (quality_score("text") >= _ECE_LABEL_THRESHOLD).cast("int").alias("label"),
    )
    scored = quality_classifier(d, "doc_id", "text", passthrough=("label",))
    both = scored.select(F.col("quality_score").alias("conf"), "label").select(
        F.least(
            F.floor(F.col("conf") * _ECE_BINS).cast("long"),
            F.lit(_ECE_BINS - 1).cast("long"),
        ).alias("bin"),
        "conf",
        "label",
    )
    bins = both.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("conf"), 6).alias("mean_conf"),
        F.round(F.avg(F.col("label").cast("double")), 6).alias("frac_pos"),
        F.round(
            F.abs(F.avg("conf") - F.avg(F.col("label").cast("double"))), 6
        ).alias("abs_gap"),
    )
    w = Window.partitionBy()
    return bins.select(
        "bin",
        "n_docs",
        "mean_conf",
        "frac_pos",
        "abs_gap",
        F.round(
            F.sum(F.col("n_docs") * F.col("abs_gap")).over(w)
            / F.sum("n_docs").over(w),
            6,
        ).alias("ece"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing per region, recursive oracle
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_HORIZON = 3
#: Per-group Arrow-frame row bound (VERDICT r11 #7): the series is
#: month-grain per region, so even a century is ~1,200 rows — anything
#: near this cap means a caller fed fact-grain rows into the grouped
#: recurrence, which must fail loudly, not OOM the worker.
_HOLT_MAX_MONTHS = 100_000

_HOLT_SQL = f"""
WITH series AS (
  SELECT r.r_name AS region,
         strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
idx AS (
  SELECT region, month, y,
         row_number() OVER (PARTITION BY region ORDER BY month) AS rn,
         count(*) OVER (PARTITION BY region) AS n_months
  FROM series
),
init AS (
  SELECT i1.region, i1.n_months, i1.y AS l0, i2.y - i1.y AS b0
  FROM idx i1 JOIN idx i2 ON i1.region = i2.region AND i2.rn = 2
  WHERE i1.rn = 1
),
smooth AS (
  WITH RECURSIVE rec(region, rn, lvl, trd) AS (
    SELECT region, 1, l0, b0 FROM init
    UNION ALL
    SELECT r.region, r.rn + 1,
           {_HOLT_ALPHA} * i.y + (1 - {_HOLT_ALPHA}) * (r.lvl + r.trd),
           {_HOLT_BETA} * (({_HOLT_ALPHA} * i.y
                            + (1 - {_HOLT_ALPHA}) * (r.lvl + r.trd)) - r.lvl)
           + (1 - {_HOLT_BETA}) * r.trd
    FROM rec r JOIN idx i ON i.region = r.region AND i.rn = r.rn + 1
  )
  SELECT * FROM rec
)
SELECT s.region,
       CAST(i.n_months AS BIGINT) AS n_months,
       round(s.lvl, 4) AS level,
       round(s.trd, 4) AS trend,
       round(s.lvl + 1 * s.trd, 4) AS forecast_1,
       round(s.lvl + 2 * s.trd, 4) AS forecast_2,
       round(s.lvl + 3 * s.trd, 4) AS forecast_3
FROM smooth s
JOIN init i ON s.region = i.region AND s.rn = i.n_months
ORDER BY s.region
"""


def _holt_frame(pdf):
    """Arrow-batch worker for :func:`holt_linear_monthly_revenue` —
    one pre-aggregated (region, month, y) series in, one smoothed row
    out.  Module-level (not a closure) so the recurrence is unit-
    testable against synthetic series without a SparkSession."""
    import pandas as pd

    if len(pdf) > _HOLT_MAX_MONTHS:
        raise ValueError(
            f"holt group {pdf['region'].iloc[0]!r} has {len(pdf)} rows, "
            f"over the _HOLT_MAX_MONTHS={_HOLT_MAX_MONTHS} Arrow-frame "
            "bound — the series must be month-grain (VERDICT r11 #7)"
        )
    pdf = pdf.sort_values("month")
    ys = pdf["y"].to_numpy(dtype="float64")
    if len(ys) < 2:
        # A single observation cannot initialize the trend (b0 needs
        # y2 - y1); drop the group — the SQL oracle's init CTE (inner
        # join on rn = 2) drops it the same way (ADVICE r11).
        return pd.DataFrame(
            columns=["region", "n_months", "level", "trend"]
            + [f"forecast_{h}" for h in range(1, _HOLT_HORIZON + 1)]
        )
    lvl, trd = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        new_lvl = _HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (lvl + trd)
        trd = _HOLT_BETA * (new_lvl - lvl) + (1 - _HOLT_BETA) * trd
        lvl = new_lvl
    row = {
        "region": pdf["region"].iloc[0],
        "n_months": len(ys),
        "level": lvl,
        "trend": trd,
    }
    for h in range(1, _HOLT_HORIZON + 1):
        row[f"forecast_{h}"] = lvl + h * trd
    return pd.DataFrame([row])


@_register("holt_linear_monthly_revenue", _HOLT_SQL)
def holt_linear_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing of each
    region's monthly order revenue, with a 3-month linear forecast.
    Completes the forecasting shelf: EWMA is level-only, the seasonal
    rows assume a fixed period, Theil-Sen fits one global slope — Holt
    is the standard adaptive level+trend smoother in between.

    The recurrence l_t = a*y_t + (1-a)(l+b); b_t = B(l_t - l) + (1-B)b
    is two COUPLED sequential equations — not expressible as a Spark
    window (no closed form, unlike EWMA's geometric sum), so this is a
    legitimate ``applyInPandas`` case per the standing UDF policy: one
    Arrow batch per region, an O(n_months) float64 loop inside.  Scale:
    the heavy work (fact scan -> month aggregation) is declarative and
    shuffles once on (region, month); the Python stage sees only
    |regions| x |months| pre-aggregated rows and parallelizes across
    regions.  The DuckDB oracle replays the identical recurrence with
    a recursive CTE — both engines evaluate the same IEEE-double
    operation sequence in the same order, so values match bit-for-bit
    before the 4-dp rounding."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    series = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )

    out_schema = (
        "region string, n_months long, level double, trend double, "
        "forecast_1 double, forecast_2 double, forecast_3 double"
    )
    smoothed = series.groupBy("region").applyInPandas(_holt_frame, out_schema)
    # Rounding happens JVM-side (F.round = HALF_UP, the house pairing
    # with DuckDB's round) rather than in the pandas stage, so the
    # whole registry shares ONE rounding convention.
    return smoothed.select(
        "region",
        "n_months",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("forecast_1", 4).alias("forecast_1"),
        F.round("forecast_2", 4).alias("forecast_2"),
        F.round("forecast_3", 4).alias("forecast_3"),
    ).orderBy("region")


# ---------------------------------------------------------------------------
# Pearson correlation matrix in one exact-arithmetic pass
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_matrix_sql() -> str:
    cols = _CORR_COLS
    units = ", ".join(
        f"CAST(round({c} * 100) AS BIGINT) AS {c}" for c in cols
    )
    moments = ["count(*) AS n"]
    for c in cols:
        moments.append(f"sum({c}) AS s_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            # per-row BIGINT product (<=1e14, fits int64); DuckDB's
            # sum(BIGINT) widens to HUGEINT, so the moment is exact
            moments.append(f"sum({a} * {b}) AS p_{a}_{b}")
    branches = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            branches.append(f"""
  SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n_rows,
         round((CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)
                - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(p_{a}_{a} AS DOUBLE)
                       - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(p_{b}_{b} AS DOUBLE)
                         - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))),
               6) AS corr
  FROM m""")
    return (
        "WITH u AS (\n  SELECT " + units + "\n  FROM lineitem\n),"
        + "\nm AS (\n  SELECT " + ",\n         ".join(moments)
        + "\n  FROM u\n)" + "\n  UNION ALL".join(branches)
    )


@_register("correlation_matrix_lineitem", _corr_matrix_sql())
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Pearson correlation matrix over the lineitem numeric
    columns (quantity, extendedprice, discount, tax) — the standard
    profiling sweep before feature selection, computed in ONE
    aggregate pass: every pairwise correlation is a closed form over
    {n, sum(x), sum(x*y)}, so k columns need k + k(k+1)/2 moment
    aggregates in a single map-side-combined reduction, NOT k²
    passes.  The 6 output rows unpivot from the one moment row.

    Exactness discipline: values snap to integer HUNDREDTHS (the
    fixture data is exact at 2 dp), per-row products stay inside
    int64, and the moment SUMS widen exactly — DECIMAL(38,0) on the
    Spark side, DuckDB's automatic BIGINT->HUGEINT — so every moment
    is order-insensitive exact arithmetic across engines and
    partitionings.  Pearson is scale-invariant, so the x100 units
    cancel; float enters only in the final closed form — a fixed
    sequence of ~8 double ops per pair, identical op-for-op in the
    DuckDB oracle, rounded once at 6 dp."""
    cols = _CORR_COLS
    li = load_table(spark, sf_dir, "lineitem").select(
        *[
            F.round(F.col(c) * 100).cast("long").alias(c)
            for c in cols
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)")).alias(
                    f"p_{a}_{b}"
                )
            )
    m0 = li.agg(*aggs)

    def d(name: str):
        return F.col(name).cast("double")

    structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = d("n") * d(f"p_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
            den = F.sqrt(
                (d("n") * d(f"p_{a}_{a}") - d(f"s_{a}") * d(f"s_{a}"))
                * (d("n") * d(f"p_{b}_{b}") - d(f"s_{b}") * d(f"s_{b}"))
            )
            structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("n").cast("long").alias("n_rows"),
                    F.round(num / den, 6).alias("corr"),
                )
            )
    return m0.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# Embedding-space cross-split contamination check
# ---------------------------------------------------------------------------

#: Rounded-cosine threshold above which a holdout vector counts as
#: contaminated by (≈ memorizable from) its nearest training vector.
_CONTAM_THRESHOLD = 0.98
#: md5-hex threshold assigning ~20% of vec_ids to the holdout side —
#: same split idiom as holdout_split_documents (stable under reruns
#: and corpus growth).
_CONTAM_HOLDOUT_HEX = "3333333333333333333333333333333333"

_CONTAM_SQL = f"""
WITH split AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         md5(CAST(vec_id AS VARCHAR)) < '{_CONTAM_HOLDOUT_HEX}' AS is_holdout
  FROM embeddings
),
scored AS (
  -- zero-norm guard mirrors Spark's cosine_similarity (0.0 when either
  -- norm is zero, functions/vectors.py:38); DuckDB's
  -- list_cosine_similarity would divide by zero instead (ADVICE r11)
  SELECT h.vec_id, t.vec_id AS train_id,
         round(CASE WHEN list_dot_product(h.v, h.v) = 0
                      OR list_dot_product(t.v, t.v) = 0 THEN 0.0
               ELSE list_cosine_similarity(h.v, t.v) END, 4) AS cosine
  FROM split h JOIN split t ON h.is_holdout AND NOT t.is_holdout
)
SELECT vec_id, train_id AS nearest_train_id, cosine AS max_cosine,
       cosine >= {_CONTAM_THRESHOLD} AS contaminated
FROM scored
QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY cosine DESC, train_id) = 1
ORDER BY vec_id
"""


@_register("embedding_split_contamination", _CONTAM_SQL)
def embedding_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space train/holdout contamination audit: for every
    holdout vector (md5 split, ~20%), the nearest TRAINING vector by
    cosine and a contamination flag at >= {thr} — the embedding-side
    complement of the n-gram `cross_split_contamination` row (exact
    string overlap misses paraphrases; cosine neighbors catch them).

    Scale shape: the holdout side of an eval split is the SMALL side
    by construction, so it broadcasts and the training corpus streams
    once — per-partition partial argmax (max over a (cosine, -id)
    struct), then one holdout-keyed reduction; no all-pairs shuffle
    materializes.  At corpus scale, pre-filter the training stream
    through the IVF/LSH cells of each holdout vector (the registered
    ANN rows) and this query's reduction is unchanged.  Ordering uses
    the ROUNDED cosine (4 dp, the cross-engine-stable precedent of
    embedding_neardup_exact) with the train id as tiebreak, so the
    argmax is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        (
            F.md5(F.col("vec_id").cast("string")) < _CONTAM_HOLDOUT_HEX
        ).alias("is_holdout"),
    )
    holdout = emb.filter("is_holdout").select(
        F.col("vec_id").alias("h_id"), F.col("v").alias("hv")
    )
    train = emb.filter(~F.col("is_holdout")).select(
        F.col("vec_id").alias("train_id"), F.col("v").alias("tv")
    )
    from cid_etl_spark.functions.vectors import cosine_similarity

    scored = train.join(F.broadcast(holdout)).select(
        "h_id",
        "train_id",
        F.round(cosine_similarity("hv", "tv"), 4).alias("cosine"),
    )
    best = scored.groupBy("h_id").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("train_id")).alias("neg_id"))).alias(
            "top"
        )
    )
    return best.select(
        F.col("h_id").alias("vec_id"),
        (-F.col("top.neg_id")).cast("long").alias("nearest_train_id"),
        F.col("top.cosine").alias("max_cosine"),
        (F.col("top.cosine") >= _CONTAM_THRESHOLD).alias("contaminated"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Retrieval quality evaluation: NDCG / precision / MRR over BM25@20
# ---------------------------------------------------------------------------

_NDCG_K = 20
_NDCG_TERMS = ("data", "query", "index")
#: A document is relevant iff it contains at least this many distinct
#: query terms.  2-of-3, not all-3: the synthetic corpus has ZERO
#: all-three documents at every fixture scale (measured), and an eval
#: with an empty relevant set is vacuous; >=2 gives a few hundred
#: relevant docs at sf0.01, so the metrics discriminate.
_NDCG_MIN_TERMS = 2

_NDCG_SQL = rf"""
WITH tok AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents WHERE length(trim(text)) > 0
), dl AS (
    SELECT doc_id, CAST(count(*) AS DOUBLE) AS len FROM tok GROUP BY doc_id
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len) AS avgdl FROM dl
), tf AS (
    SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
    FROM tok WHERE term IN ({", ".join(f"'{t}'" for t in _NDCG_TERMS)})
    GROUP BY doc_id, term
), df AS (
    SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), rel AS (
    SELECT doc_id, count(DISTINCT term) >= {_NDCG_MIN_TERMS} AS relevant
    FROM tf GROUP BY doc_id
), ranked AS (
    SELECT t.doc_id,
           round(sum(
               ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
               * t.tf * 2.2
               / (t.tf + 1.2 * (0.25 + 0.75 * l.len / s.avgdl))
           ), 4) AS bm25
    FROM tf t
    JOIN df d USING (term)
    JOIN dl l USING (doc_id)
    CROSS JOIN stats s
    GROUP BY t.doc_id
), top AS (
    SELECT r.doc_id, rel.relevant,
           row_number() OVER (ORDER BY r.bm25 DESC, r.doc_id) AS pos
    FROM ranked r JOIN rel USING (doc_id)
    QUALIFY pos <= {_NDCG_K}
), n_rel AS (SELECT count(*) AS n FROM rel WHERE relevant),
ideal AS (
    SELECT i, 1.0 / (ln(i + 1) / ln(2)) AS gain FROM range(1, {_NDCG_K} + 1) r(i)
),
idcg AS (
    SELECT round(sum(gain), 6) AS v
    FROM ideal CROSS JOIN n_rel
    WHERE i <= greatest(least(n_rel.n, {_NDCG_K}), 1)
)
SELECT CAST(n_rel.n AS BIGINT) AS n_relevant,
       CAST(sum(CASE WHEN t.relevant THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_k,
       round(sum(CASE WHEN t.relevant THEN 1.0 / (ln(t.pos + 1) / ln(2)) ELSE 0 END), 6)
           AS dcg,
       idcg.v AS idcg,
       round(sum(CASE WHEN t.relevant THEN 1.0 / (ln(t.pos + 1) / ln(2)) ELSE 0 END)
             / idcg.v, 6) AS ndcg,
       round(CAST(sum(CASE WHEN t.relevant THEN 1 ELSE 0 END) AS DOUBLE)
             / {_NDCG_K}, 6) AS precision_at_k,
       round(coalesce(1.0 / min(CASE WHEN t.relevant THEN t.pos END), 0.0), 6)
           AS mrr
FROM top t CROSS JOIN n_rel CROSS JOIN idcg
GROUP BY n_rel.n, idcg.v
"""


@_register("ndcg_retrieval_eval", _NDCG_SQL)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics for the BM25 stack: NDCG@20,
    precision@20 and MRR of `bm25_search_documents`'s ranking,
    judged against a deterministic relevance label (a document is
    relevant iff it contains at least :data:`_NDCG_MIN_TERMS` of the
    query terms — an engine-replayable proxy with a non-vacuous
    relevant set at every fixture scale).  A training-data pipeline that mines
    hard negatives or builds retrieval corpora needs its ranker
    AUDITED, not assumed; this is the standing eval row.

    Scale: the scoring plan is bm25_search_documents' (corpus stats
    fold to one row, dfs broadcast, top-k is a heap); the eval adds a
    relevance flag on the query-term tf table (query-sized, not
    corpus-sized), a window over K=20 rows, and an IDCG computed from
    a literal sequence — nothing fact-scale shuffles.  Binary
    relevance keeps DCG terms engine-exact (1/log2(pos+1) over
    integer positions)."""
    from cid_etl_spark.plans.fragments import token_stream

    tok = token_stream(spark, sf_dir).select("doc_id", F.col("tok").alias("term"))
    tf = (
        tok.filter(F.col("term").isin(*_NDCG_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    rel = tf.groupBy("doc_id").agg(
        (F.count_distinct("term") >= _NDCG_MIN_TERMS).alias("relevant")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    score = idf * F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("len") / F.col("avgdl"))
    )
    ranked = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 4).alias("bm25"))
    )
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    top = (
        ranked.join(rel, "doc_id")
        .select("doc_id", "relevant", F.row_number().over(w).alias("pos"))
        .filter(F.col("pos") <= _NDCG_K)
    )
    n_rel = rel.filter("relevant").agg(F.count(F.lit(1)).alias("n"))
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    dcg_term = F.when(F.col("relevant"), 1.0 / log2(F.col("pos") + 1)).otherwise(
        F.lit(0.0)
    )
    agg = top.crossJoin(F.broadcast(n_rel)).groupBy("n").agg(
        F.sum(F.when(F.col("relevant"), 1).otherwise(0))
        .cast("long")
        .alias("hits_at_k"),
        F.round(F.sum(dcg_term), 6).alias("dcg"),
        F.sum(dcg_term).alias("_dcg_raw"),
        F.min(F.when(F.col("relevant"), F.col("pos"))).alias("_first_hit"),
    )
    # IDCG over the literal 1..min(n_relevant, K) sequence
    idcg_raw = F.aggregate(
        F.sequence(
            F.lit(1),
            F.greatest(F.least(F.col("n"), F.lit(_NDCG_K)), F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / log2(i.cast("double") + 1),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_relevant"),
        "hits_at_k",
        "dcg",
        F.round(idcg_raw, 6).alias("idcg"),
        F.round(F.col("_dcg_raw") / F.round(idcg_raw, 6), 6).alias("ndcg"),
        F.round(F.col("hits_at_k").cast("double") / _NDCG_K, 6).alias(
            "precision_at_k"
        ),
        F.round(
            F.coalesce(1.0 / F.col("_first_hit").cast("double"), F.lit(0.0)), 6
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Apriori frequent 3-itemsets (candidate generation + downward-closure prune)
# ---------------------------------------------------------------------------

_APRIORI_MIN_SUPPORT = 2
_APRIORI_TOP_K = 50

#: The ORACLE is the direct 3-way basket join — deliberately NOT a
#: replay of the Apriori plan: by downward closure the pruned
#: candidate path must produce exactly the set the brute-force
#: enumeration produces, so the oracle independently checks the
#: algorithm, not just the arithmetic.
_APRIORI_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, c.l_partkey AS item_c,
       CAST(count(*) AS BIGINT) AS support
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN items c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3
HAVING count(*) >= {_APRIORI_MIN_SUPPORT}
ORDER BY support DESC, item_a, item_b, item_c
LIMIT {_APRIORI_TOP_K}
"""


@_register("apriori_triples_copurchase", _APRIORI_SQL)
def apriori_triples_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over order baskets via the Apriori level-3
    step: candidates are generated from the FREQUENT PAIRS (join L2
    with itself on the shared first item, b < c), pruned by downward
    closure (the third face (b, c) must itself be a frequent pair),
    and only the survivors are counted against the baskets.  Top-50
    by support.

    This is the canonical distributed mining pattern the pair rows
    (copurchase/assoc_rules) build toward.  Counting is ORDER-KEYED
    (round-12 rewrite): the original plan counted candidates via an
    item-keyed join (cand ⋈ items ON item_a), whose output is
    sum over candidates of freq(item_a) — the r12 sf1 guard measured
    it at a 54-72 s longest task (|L2| = 1.2M pairs at 10× density
    makes |C3| × item frequency explode) while the order-keyed
    instance enumeration is sum(C(basket, 3)) = 16M rows there, with
    the per-TASK bound |orders/task| × C(max_basket, 3) — a data-model
    constant (max basket 17), not a density-dependent volume.  The
    Apriori structure stays, applied where it pays: baskets are first
    trimmed to items appearing in some frequent pair (the L1 prune),
    and downward closure prunes INSTANCES through three face
    semi-joins against L2 before anything shuffles to the count — a
    triple survives only if (a,b), (a,c), (b,c) are all frequent,
    exactly the membership C3 would test, without the item-keyed
    blowup.  (On a wide-basket corpus where C(basket,3) itself
    explodes, the classic hash-tree broadcast of C3 replaces the
    enumeration; at that point |C3| is the smaller side by
    construction.)  The oracle is deliberately the brute-force 3-way
    enumeration, NOT a replay: downward closure guarantees set
    equality, so DuckDB independently checks the ALGORITHM.  All
    values are exact integers."""
    from cid_etl_spark.queries.curation import _copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # L2 = frequent pairs (support >= 2), a < b — the same definition
    # as the co-purchase edge list.
    l2 = _copurchase_edges(spark, sf_dir, min_support=_APRIORI_MIN_SUPPORT
                           ).localCheckpoint(eager=False)
    # L1 prune: only items that appear in some frequent pair can be in
    # a frequent triple — trims every basket before enumeration.
    l1 = (
        l2.selectExpr("src AS item")
        .unionAll(l2.selectExpr("dst AS item"))
        .distinct()
    )
    itf = items.join(
        l1, items["l_partkey"] == l1["item"], "left_semi"
    )
    i1 = itf.selectExpr("l_orderkey AS o", "l_partkey AS a")
    i2 = itf.selectExpr("l_orderkey AS o", "l_partkey AS b")
    i3 = itf.selectExpr("l_orderkey AS o", "l_partkey AS c")
    # Order-local pair instances, face-pruned to frequent pairs before
    # the third item joins in (downward closure, instance side).
    pairs_o = (
        i1.join(i2, "o")
        .filter(F.col("a") < F.col("b"))
        .join(l2.selectExpr("src AS a", "dst AS b"), ["a", "b"], "left_semi")
    )
    trip_o = (
        pairs_o.join(i3, "o")
        .filter(F.col("c") > F.col("b"))
        .join(l2.selectExpr("src AS b", "dst AS c"), ["b", "c"], "left_semi")
        .join(l2.selectExpr("src AS a", "dst AS c"), ["a", "c"], "left_semi")
    )
    support = (
        trip_o.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _APRIORI_MIN_SUPPORT)
    )
    return (
        support.select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("c").alias("item_c"),
            F.col("support").cast("long").alias("support"),
        )
        .orderBy(F.col("support").desc(), "item_a", "item_b", "item_c")
        .limit(_APRIORI_TOP_K)
    )


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (delta-join rule)
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "1999-01-01 00:00:00"

_IVM_JOIN_SQL = """
SELECT n.n_name AS nation,
       CAST(round(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@_register("incremental_join_maintenance", _IVM_JOIN_SQL)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOINED materialized view — the
    delta-JOIN rule, the step beyond `incremental_agg_maintenance`'s
    decomposable-aggregate merge: for V = R ⋈ S with a static
    dimension side S, an insert batch ΔR maintains the view as
    ΔV = ΔR ⋈ S — only the NEW fact rows are joined, then the partial
    aggregates merge per key exactly as in the agg row.  The stored
    state here is the pre-cutoff rollup (standing in for yesterday's
    persisted view); the oracle is the full three-table recompute, so
    the row proves merge(state, ΔR ⋈ S) == recompute(R ⋈ S) — the
    contract that lets a 100 TB pipeline join one day's partition
    against broadcast dims instead of re-joining years of facts.
    (A changing dimension needs the symmetric rule
    ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS, or SCD2 snapshots — out of scope for this
    row; `scd2_point_in_time_join` covers the dimension-history
    side.)  Sums are exact decimals; both join pipelines broadcast
    the dims."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def joined_rollup(fact: DataFrame) -> DataFrame:
        return (
            fact.join(F.broadcast(cust), fact["o_custkey"] == cust["c_custkey"])
            .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.sum(price).alias("rev_part"), F.count(F.lit(1)).alias("n_part"))
        )

    # "stored" view state: pre-cutoff joined rollup (in production this
    # is read back from the state table; shape identical)
    state = joined_rollup(o.filter(F.col("o_orderdate") < cutoff))
    # delta-join rule: ONLY the new batch joins the dimensions
    delta = joined_rollup(o.filter(F.col("o_orderdate") >= cutoff))
    from cid_etl_spark.operators.aggregates import money

    merged = (
        state.unionByName(delta)
        .groupBy("n_name")
        .agg(F.sum("rev_part").alias("rev"), F.sum("n_part").alias("n"))
    )
    return merged.select(
        F.col("n_name").alias("nation"),
        money(F.col("rev")).alias("revenue"),
        F.col("n").cast("bigint").alias("n_orders"),
    )
