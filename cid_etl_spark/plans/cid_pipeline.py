"""The CID-10 consolidation pipeline — the reference's two entry points
(/root/reference/etl_cid10.py:162-197 ``run_etl`` and :333-371
``run_etl_from_datasus_dir``) rebuilt as ONE lazy Spark plan each.

Spark-first differences from the reference (SURVEY §3-§4):

- Everything is a single lazy DAG; the only actions are the final
  write and the quality counts.  Catalyst prunes columns and pushes
  filters; AQE picks join strategies.
- Schema probing (which columns exist, positional fallbacks) happens
  ONCE at the driver against ``df.columns``; executors see a fixed
  normalized schema (SURVEY §1.3).
- The hierarchy range joins are broadcast theta joins, not O(N·M)
  driver loops (etl_cid10.py:296-325 → operators.joins.range_join).
- Priority dedup is a window, not a global sort (etl_cid10.py:183-184
  → operators.dedup.priority_dedup), with a total deterministic order.
- Join-name collisions cannot arise: inputs are pruned/aliased before
  each join (replaces pandas ``_x``/``_y`` + fillna, etl_cid10.py:59-67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cid_etl_spark.functions.strings import (
    concat_range,
    extract_root_category,
    format_subcat,
    normalize_code,
    subcategory_or_null,
)
from cid_etl_spark.operators.dedup import priority_dedup
from cid_etl_spark.operators.joins import left_broadcast_join, range_join
from cid_etl_spark.sources.csv import read_csv_default, read_csv_robust, read_datasus_dir_files
from cid_etl_spark.sources.sinks import write_csv_single

#: Canonical output schema, fixed order (etl_cid10.py:97-100,151-154;
#: SURVEY §1.4).
OUTPUT_COLUMNS: tuple[str, ...] = (
    "cid_codigo",
    "cid_categoria",
    "cid_subcategoria",
    "titulo",
    "descricao",
    "capitulo_codigo",
    "capitulo_titulo",
    "bloco_codigo",
    "bloco_titulo",
    "fonte",
    "dt_atualizacao",
)

_SOURCE_PRIORITY = {"Estruturada": 0, "DATASUS": 1}


# ---------------------------------------------------------------------------
# Structured branch (etl_cid10.py:52-101)
# ---------------------------------------------------------------------------


def build_structured(
    chapters: DataFrame,
    blocks: DataFrame,
    categories: DataFrame,
    subcategories: DataFrame,
) -> DataFrame:
    """Reconstruct the full hierarchy for subcategories
    (etl_cid10.py:52-101): categories ⟕ chapters ⟕ blocks, then
    subcategories ⟕ that map; emit the canonical 10 columns with
    ``fonte='Estruturada'``.

    All dims broadcast (22 chapters / ~275 blocks / ~2k categories);
    the fact side (subcategories) never shuffles.
    """
    cats = (
        categories.select(
            normalize_code("category_code").alias("category_code"),
            F.col("category_title"),
            normalize_code("block_id").alias("block_id"),
            normalize_code("chapter_code").alias("chapter_code"),
        )
        # J1 (etl_cid10.py:55)
        .join(
            F.broadcast(
                chapters.select(
                    normalize_code("chapter_code").alias("chapter_code"),
                    F.col("chapter_title"),
                )
            ),
            "chapter_code",
            "left",
        )
        # J2 (etl_cid10.py:57); blocks carry their own chapter_code —
        # prefer the category's (J8 coalesce, etl_cid10.py:59-67) which
        # we achieve by pruning the block side to id+title only.
        .join(
            F.broadcast(
                blocks.select(
                    normalize_code("block_id").alias("block_id"),
                    F.col("block_title"),
                )
            ),
            "block_id",
            "left",
        )
    )

    # J3 (etl_cid10.py:70-75)
    subs = subcategories.select(
        normalize_code("subcategory_code").alias("cid_codigo"),
        F.col("subcategory_title").alias("titulo"),
        normalize_code("category_code").alias("category_code"),
    )
    full = left_broadcast_join(subs, cats, "category_code")

    return full.select(
        F.col("cid_codigo"),
        extract_root_category("cid_codigo").alias("cid_categoria"),
        subcategory_or_null("cid_codigo").alias("cid_subcategoria"),
        F.col("titulo"),
        F.col("titulo").alias("descricao"),  # P9 (etl_cid10.py:86)
        F.col("chapter_code").alias("capitulo_codigo"),
        F.col("chapter_title").alias("capitulo_titulo"),
        F.col("block_id").alias("bloco_codigo"),
        F.col("block_title").alias("bloco_titulo"),
        F.lit("Estruturada").alias("fonte"),  # P5 (etl_cid10.py:94)
    )


# ---------------------------------------------------------------------------
# DATASUS branch (etl_cid10.py:108-155)
# ---------------------------------------------------------------------------


def _normalize_datasus_columns(raw: DataFrame) -> DataFrame:
    """P1-P3 (etl_cid10.py:110-124): rename ``codigo``→``cid_codigo``;
    if absent, the FIRST column is the code; missing ``descricao``
    becomes NULL.  Resolved once at the driver — executors see a fixed
    schema."""
    cols = dict.fromkeys(raw.columns)
    df = raw
    if "codigo" in cols:
        df = df.withColumnRenamed("codigo", "cid_codigo")
    elif "cid_codigo" not in cols:
        df = df.withColumnRenamed(df.columns[0], "cid_codigo")
    if "descricao" not in df.columns:
        df = df.withColumn("descricao", F.lit(None).cast("string"))
    return df


def prepare_datasus(raw: DataFrame, category_map: DataFrame) -> DataFrame:
    """Enrich the flat DATASUS list with the hierarchy
    (etl_cid10.py:108-155): normalize the code, derive the root
    category, left-join the (broadcast) category map on it, emit the
    canonical columns with ``fonte='DATASUS'``."""
    base = _normalize_datasus_columns(raw).select(
        normalize_code("cid_codigo").alias("cid_codigo"),
        F.col("descricao").alias("titulo"),
    )
    enriched = base.withColumn(
        "cid_categoria", extract_root_category("cid_codigo")
    ).join(  # J4 (etl_cid10.py:136-141), map pre-projected to 5 cols (:137)
        F.broadcast(
            category_map.select(
                F.col("category_code").alias("cid_categoria"),
                F.col("chapter_code"),
                F.col("chapter_title"),
                F.col("block_id"),
                F.col("block_title"),
            )
        ),
        "cid_categoria",
        "left",
    )
    return enriched.select(
        F.col("cid_codigo"),
        F.col("cid_categoria"),
        subcategory_or_null("cid_codigo").alias("cid_subcategoria"),
        F.col("titulo"),
        F.col("titulo").alias("descricao"),
        F.col("chapter_code").alias("capitulo_codigo"),
        F.col("chapter_title").alias("capitulo_titulo"),
        F.col("block_id").alias("bloco_codigo"),
        F.col("block_title").alias("bloco_titulo"),
        F.lit("DATASUS").alias("fonte"),
    )


def _category_map(chapters: DataFrame, blocks: DataFrame, categories: DataFrame) -> DataFrame:
    """J5 (etl_cid10.py:175,340): categories joined to chapter/block
    titles — the 5-column enrichment map for the DATASUS branch."""
    return (
        categories.select(
            normalize_code("category_code").alias("category_code"),
            normalize_code("block_id").alias("block_id"),
            normalize_code("chapter_code").alias("chapter_code"),
        )
        .join(
            F.broadcast(
                chapters.select(
                    normalize_code("chapter_code").alias("chapter_code"),
                    F.col("chapter_title"),
                )
            ),
            "chapter_code",
            "left",
        )
        .join(
            F.broadcast(
                blocks.select(
                    normalize_code("block_id").alias("block_id"),
                    F.col("block_title"),
                )
            ),
            "block_id",
            "left",
        )
    )


# ---------------------------------------------------------------------------
# Consolidation tail shared by both entry points (etl_cid10.py:172-196 / :337-370)
# ---------------------------------------------------------------------------


def _consolidate(structured: DataFrame, datasus: DataFrame) -> DataFrame:
    """U1 union → re-normalize key (F1) → A3 priority dedup → P6 date
    stamp (etl_cid10.py:179-187,357-363).

    Survivor rule: per ``cid_codigo`` prefer ``'Estruturada'`` over
    ``'DATASUS'`` (the reference's DESC sort on ``fonte``); within a
    source, prefer the structured-branch input order analog — we use a
    priority int + titulo as a *total* deterministic order (the
    reference relied on pandas' stable sort; SURVEY §4.2.1).
    """
    prio = F.when(F.col("fonte") == "Estruturada", 0).otherwise(1)
    unioned = (
        structured.unionByName(datasus)
        .withColumn("cid_codigo", normalize_code("cid_codigo"))
        .withColumn("__prio", prio)
    )
    deduped = priority_dedup(
        unioned,
        "cid_codigo",
        [F.col("__prio").asc(), F.col("titulo").asc_nulls_last()],
    ).drop("__prio")
    return deduped.withColumn(
        "dt_atualizacao", F.date_format(F.current_date(), "yyyy-MM-dd")
    ).select(*OUTPUT_COLUMNS)


# ---------------------------------------------------------------------------
# Official DataSUS mode: schema mapping + range joins (etl_cid10.py:212-327)
# ---------------------------------------------------------------------------


def _map_official_tables(raw: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """S5 schema mapping (etl_cid10.py:230-264): raw DataSUS columns →
    the structured-branch schemas, including `_format_subcat`'s ICD-dot
    insertion and the range-id synthesis ``CATINIC-CATFIM``."""
    chapters = raw["chapters"].select(
        concat_range("CATINIC", "CATFIM").alias("chapter_code"),
        F.trim(F.col("DESCRICAO").cast("string")).alias("chapter_title"),
        normalize_code("CATINIC").alias("cap_start"),
        normalize_code("CATFIM").alias("cap_end"),
    )
    blocks = raw["blocks"].select(
        concat_range("CATINIC", "CATFIM").alias("block_id"),
        F.trim(F.col("DESCRICAO").cast("string")).alias("block_title"),
        normalize_code("CATINIC").alias("blk_start"),
        normalize_code("CATFIM").alias("blk_end"),
    )
    categories = raw["categories"].select(
        normalize_code("CAT").alias("category_code"),
        F.trim(F.col("DESCRICAO").cast("string")).alias("category_title"),
    )
    desc_col = "DESCRICAO" if "DESCRICAO" in raw["subcategories"].columns else "DESCRABREV"
    subcategories = raw["subcategories"].select(
        format_subcat("SUBCAT").alias("subcategory_code"),
        F.trim(F.col(desc_col).cast("string")).alias("subcategory_title"),
        F.substring(normalize_code("SUBCAT"), 1, 3).alias("category_code"),
    )
    return {
        "chapters": chapters,
        "blocks": blocks,
        "categories": categories,
        "subcategories": subcategories,
    }


def _attach_hierarchy_by_range(
    categories: DataFrame, blocks: DataFrame, chapters: DataFrame
) -> DataFrame:
    """J6/J7 (etl_cid10.py:266-325): attach block and chapter ids to
    each category by interval membership, first-match-wins.

    Both interval tables broadcast; the category side never shuffles
    for the join itself (only the tiny tie-break window if enabled).
    """
    with_block = range_join(
        categories,
        blocks.select("block_id", "blk_start", "blk_end"),
        key="category_code",
        start="blk_start",
        end="blk_end",
        first_match_order=["blk_start", "block_id"],
        fact_key="category_code",
    ).drop("blk_start", "blk_end")
    # J7: a block belongs to a chapter if either endpoint falls inside
    # the chapter range (etl_cid10.py:316-325); applied per-category
    # here via the category code itself (equivalent since categories
    # nest inside blocks nest inside chapters).
    with_chap = range_join(
        with_block,
        chapters.select("chapter_code", "cap_start", "cap_end"),
        key="category_code",
        start="cap_start",
        end="cap_end",
        first_match_order=["cap_start", "chapter_code"],
        fact_key="category_code",
    ).drop("cap_start", "cap_end")
    return with_chap


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def run_etl(
    spark: SparkSession,
    datasus_csv: str,
    chapters_csv: str,
    blocks_csv: str,
    categories_csv: str,
    subcategories_csv: str,
    output_csv: str | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Entry point 2 — combined mode (etl_cid10.py:162-197): 5
    user-supplied CSVs, hierarchy keys already present.  Returns the
    consolidated DataFrame and the quality metrics; writes the
    reference-parity CSV when *output_csv* is given."""
    from cid_etl_spark.operators.aggregates import quality_counts

    raw = read_csv_robust(spark, datasus_csv)  # S1
    chapters = read_csv_default(spark, chapters_csv)  # S2 ×4
    blocks = read_csv_default(spark, blocks_csv)
    categories = read_csv_default(spark, categories_csv)
    subcategories = read_csv_default(spark, subcategories_csv)

    structured = build_structured(chapters, blocks, categories, subcategories)
    cat_map = _category_map(chapters, blocks, categories)
    datasus = prepare_datasus(raw, cat_map)
    final = _consolidate(structured, datasus)

    metrics = quality_counts(final, "bloco_codigo", "capitulo_codigo")
    if output_csv:
        write_csv_single(final, output_csv)
    return final, metrics


def run_etl_from_datasus_dir(
    spark: SparkSession,
    datasus_dir: str,
    output_csv: str | None = None,
    include_bare_categories: bool = False,
) -> tuple[DataFrame, dict[str, int]]:
    """Entry point 1 — official mode (etl_cid10.py:333-371): discover +
    scan the 4 official CSVs, rebuild the hierarchy with range joins,
    then the shared consolidation tail.

    STRICT REFERENCE PARITY (default, VERDICT r10 missing #1): the
    reference builds the official-mode DATASUS flat list from the
    structured output itself (etl_cid10.py:350-353 —
    ``codigo = structured_full['cid_codigo']``), so its union + dedup
    adds NO new codes and the consolidated output is exactly the
    structured branch's rows plus the date stamp.  We replay that:
    the flat list is the structured branch's ``(cid_codigo,
    descricao)`` and the DATASUS rows all lose the dedup to their
    Estruturada twins.

    ``include_bare_categories=True`` is a DELIBERATE EXTENSION beyond
    the reference: the flat list becomes the official CATEGORIAS codes
    instead, so undivided/bare category rows (e.g. ``A09``) survive
    the dedup and appear in the output with category-grain titles —
    rows the reference's output never contains.  Useful when the
    catalog consumer needs category-level codes (DATASUS mortality
    files code undivided categories bare); off by default so the
    default output matches the reference's observable output
    code-for-code."""
    from cid_etl_spark.operators.aggregates import quality_counts

    raw = read_datasus_dir_files(spark, datasus_dir)
    mapped = _map_official_tables(raw)
    cats_h = _attach_hierarchy_by_range(mapped["categories"], mapped["blocks"], mapped["chapters"])

    chapters = mapped["chapters"].select("chapter_code", "chapter_title")
    blocks = mapped["blocks"].select("block_id", "block_title")
    structured = build_structured(
        chapters,
        blocks,
        cats_h.select("category_code", "category_title", "block_id", "chapter_code"),
        mapped["subcategories"],
    )
    if include_bare_categories:
        # Extension: category-level rows (code = bare CAT code).
        flat = mapped["categories"].select(
            F.col("category_code").alias("codigo"),
            F.col("category_title").alias("descricao"),
        )
    else:
        # Reference parity (etl_cid10.py:350-353): the flat list IS the
        # structured output's codes — the union/dedup adds nothing.
        flat = structured.select(
            F.col("cid_codigo").alias("codigo"),
            F.col("descricao").alias("descricao"),
        )
    cat_map = cats_h.join(
        F.broadcast(chapters), "chapter_code", "left"
    ).join(F.broadcast(blocks), "block_id", "left").select(
        "category_code", "chapter_code", "chapter_title", "block_id", "block_title"
    )
    datasus = prepare_datasus(flat, cat_map)
    final = _consolidate(structured, datasus)

    metrics = quality_counts(final, "bloco_codigo", "capitulo_codigo")
    if output_csv:
        write_csv_single(final, output_csv)
    return final, metrics
