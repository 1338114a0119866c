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
    is sum(deg(z)^2) — bounded by the standing AA degree cap
    (:data:`_AA_DEGREE_CAP`): hubs contribute ~zero signal
    (1/ln(deg) -> 0) but quadratic pairs, so they never vote and the
    worst task is CAP^2 pairs at ANY corpus size.  Existing edges drop
    with one anti-join.  Integer-first: each neighbor's weight is
    round(1e6/ln(deg)) in micro units, the score an exact BIGINT sum —
    addition order can never flip the rounded value or the top-k
    ordering, which DuckDB replays exactly."""
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
    a, b = mid.alias("a"), mid.alias("b")
    pairs = (
        a.join(b, (F.col("a.node") == F.col("b.node")) & (F.col("a.nbr") < F.col("b.nbr")))
        .groupBy(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
        .agg(
            F.sum("a.w_micro").alias("score_micro"),
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

    pdf = pdf.sort_values("month")
    ys = pdf["y"].to_numpy(dtype="float64")
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
