"""cid_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference pandas ETL ``judson-fluap/cid-etl``
(`/root/reference/etl_cid10.py`), re-expressed Spark-first:

- lazy DataFrame/SQL pipelines optimized by Catalyst + AQE
- native Column expressions instead of row-wise Python ``.apply``
- window-based priority deduplication instead of global sort + drop
- broadcast theta joins for range/interval membership
- Parquet-first I/O with robust CSV ingestion at the edges

plus LLM-data-pipeline extensions (scalable dedup, similarity search,
text analysis, multimodal column plumbing, Structured Streaming)
designed for 100 TB-scale inputs.

Package layout::

    session      SparkSession factory with scale-sane defaults
    sources      CSV (robust dialect fallback) + parquet readers, sinks
    functions    pure Column-expression scalar libraries (strings, text,
                 vectors)
    operators    joins, dedup, similarity, aggregates
    plans        the CID-10 flagship pipeline (both reference entry points)
    streaming    Structured Streaming over event tables
    multimodal   binary-column (image/audio/video) plumbing
"""

from cid_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
