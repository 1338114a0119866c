"""Benchmark decontamination: n-gram overlap between a corpus and an
eval/benchmark set.

Training-data hygiene op the reference lacks (its scope is a CSV ETL,
/root/reference/etl_cid10.py); standard in LLM corpus pipelines: any
training document sharing word n-grams with a benchmark document is
flagged (and usually dropped) so eval scores stay honest.

Spark-first shape: both sides explode to ``(id, md5(n-gram))`` with
built-in expressions (no Python UDF), the benchmark's distinct gram set
is broadcast (eval suites are tiny — thousands of docs — next to a
100 TB corpus), and the overlap is a map-side broadcast hash join
followed by one aggregation on the corpus id.  The corpus is never
shuffled by gram; only matching (id, gram) rows reach the reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cid_etl_spark.operators.dedup import shingle_index_arrow


def gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """``(id, gram_hash)`` — one row per distinct word n-gram of each
    document, as a 64-bit hash (operators.dedup.shingle_index_arrow:
    one vectorized Arrow pass, no interpreted array HOFs, no md5
    strings) so downstream joins move 8-byte keys, not n-gram text."""
    ix = shingle_index_arrow(df, id_col, text_col, n)
    return ix.select(F.col("__id").alias(id_col), F.col("__g").alias("gram_hash"))


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-corpus-document count of distinct n-grams shared with the
    benchmark set: ``(id_col, n_shared_ngrams)``, contaminated docs
    only.  The benchmark gram set is deduped then broadcast."""
    bench_set = gram_hashes(benchmark, id_col, text_col, n).select(
        "gram_hash"
    ).distinct()
    hits = gram_hashes(corpus, id_col, text_col, n).join(
        F.broadcast(bench_set), "gram_hash"
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram_hash").alias("n_shared_ngrams")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Corpus minus documents sharing ≥ *min_shared* distinct n-grams
    with the benchmark (left-anti join against the report ids)."""
    flagged = contamination_report(corpus, benchmark, id_col, text_col, n).filter(
        F.col("n_shared_ngrams") >= min_shared
    )
    return corpus.join(flagged.select(id_col), id_col, "left_anti")
