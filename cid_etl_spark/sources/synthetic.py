"""Custom Python DataSource (Spark 4 API): deterministic synthetic
document corpus for load/scale testing.

SURVEY §2.1 extension: the reference's sources are four CSVs on disk
(etl_cid10.py:28-45); an engine meant for 100 TB work also needs a
way to *manufacture* corpora of arbitrary size without staging files.
The Spark 4 Python DataSource API makes the generator a first-class
``spark.read.format(...)`` source:

- **partition-parallel**: ``partitions()`` returns N splits; each
  executor generates its own id range — no driver bottleneck, no
  shuffle, scales linearly with cores (generate 10⁹ rows by raising
  ``rows``/``partitions``, nothing else changes);
- **deterministic**: every (seed, partition) pair yields the same
  rows on every run and every cluster — bench runs are reproducible
  and a regenerated corpus is bit-identical for oracle comparisons;
- **duplicate injection**: ``dup_rate`` makes a fraction of documents
  exact copies of earlier ones, so dedup operators have ground truth
  at any scale.

Usage::

    from cid_etl_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 100_000).option("partitions", 64)
          .option("seed", 7).option("dup_rate", 0.1).load())
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_VOCAB = (
    "key agg row scan slow fast table value part hash join filter sort "
    "merge batch window spark order data column group index cache query "
    "plan stage task shuffle block page file read write sync"
).split()

_LANGS = ["en", "pt", "es", "de"]

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.dup_rate = float(options.get("dup_rate", 0.0))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        pid = partition.value
        lo = pid * self.rows // self.num_partitions
        hi = (pid + 1) * self.rows // self.num_partitions
        for doc_id in range(lo, hi):
            # per-ROW rng keyed by (seed, doc_id): rows don't depend on
            # partitioning, so rows=N yields the same corpus at any
            # parallelism
            rng = random.Random(f"{self.seed}:{doc_id}")
            if doc_id > 0 and rng.random() < self.dup_rate:
                # exact duplicate of a deterministic earlier doc
                src_id = rng.randrange(doc_id)
                text = self._text(random.Random(f"{self.seed}:{src_id}:t"))
                source = f"dup_of_{src_id}"
            else:
                text = self._text(random.Random(f"{self.seed}:{doc_id}:t"))
                source = "synthetic"
            lang = _LANGS[rng.randrange(len(_LANGS))]
            yield (doc_id, text, lang, source, len(text))

    @staticmethod
    def _text(rng: random.Random) -> str:
        n = 30 + rng.randrange(40)
        return " ".join(rng.choice(_VOCAB) for _ in range(n))


def register(spark) -> None:
    """Register the source for ``spark.read.format("synthetic_docs")``."""
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Streaming variant: deterministic micro-batched event ticks
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)

_EVENT_TYPES = ["view", "click", "purchase", "error"]


def _event_row(seed: int, event_id: int):
    rng = random.Random(f"{seed}:ev:{event_id}")
    return (
        event_id,
        rng.randrange(100),
        _EVENT_TYPES[rng.randrange(len(_EVENT_TYPES))],
        round(rng.random() * 100, 4),
    )


class SyntheticEventsStreamDataSource(DataSource):
    """``readStream.format("synthetic_events")`` — a custom Python
    STREAMING data source (Spark 4 ``SimpleDataSourceStreamReader``).

    The batch DataSource above manufactures corpora; this one
    manufactures a live event feed with the same discipline:
    deterministic rows keyed by (seed, event_id), so every run — and
    every checkpoint REPLAY — yields identical micro-batches, which is
    exactly the property exactly-once sinks need from a source
    (``readBetweenOffsets`` re-serves any offset range bit-identically).
    Offsets are plain row counters; each ``read`` serves
    ``batch_rows`` rows until ``max_rows`` (a bounded drill for tests;
    unbounded in production use).  The stream==batch twin test
    regenerates the same rows eagerly and compares windowed rollups.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return EVENTS_SCHEMA

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.seed = int(options.get("seed", 42))
        self.batch_rows = int(options.get("batch_rows", 50))
        self.max_rows = int(options.get("max_rows", 200))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        if lo >= self.max_rows:
            return iter([]), {"next": lo}
        hi = min(lo + self.batch_rows, self.max_rows)
        rows = [_event_row(self.seed, i) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            _event_row(self.seed, i)
            for i in range(int(start["next"]), int(end["next"]))
        )


def batch_twin_events(spark, seed: int = 42, max_rows: int = 200):
    """The eager regeneration of exactly the rows the stream serves —
    the comparison side of the stream==batch parity test."""
    return spark.createDataFrame(
        [_event_row(seed, i) for i in range(max_rows)], EVENTS_SCHEMA
    )


def register_stream(spark) -> None:
    """Register for ``spark.readStream.format("synthetic_events")``."""
    spark.dataSource.register(SyntheticEventsStreamDataSource)
