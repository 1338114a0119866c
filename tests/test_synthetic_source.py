"""Custom Python DataSource: determinism, partition parallelism,
duplicate injection."""

from __future__ import annotations

from pyspark.sql import functions as F


def _read(spark, **opts):
    from cid_etl_spark.sources.synthetic import register

    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_schema_and_parallelism(spark):
    df = _read(spark, rows=1000, partitions=7, seed=1)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    assert df.select("doc_id").distinct().count() == 1000


def test_same_seed_same_corpus_any_parallelism(spark):
    a = _read(spark, rows=400, partitions=4, seed=9).collect()
    b = _read(spark, rows=400, partitions=13, seed=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = _read(spark, rows=400, partitions=4, seed=10).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_dup_rate_injects_exact_duplicates(spark):
    df = _read(spark, rows=2000, partitions=8, seed=3, dup_rate=0.2)
    n = df.count()
    distinct_texts = df.select("text").distinct().count()
    n_dups = df.filter(F.col("source").startswith("dup_of_")).count()
    assert n == 2000
    assert 0.1 * n < n_dups < 0.3 * n
    assert distinct_texts <= n - 1  # dup texts collide with their source doc
    # flagged duplicates really are exact copies of their source document
    dup = df.filter(F.col("source").startswith("dup_of_")).limit(5).collect()
    by_id = {
        r.doc_id: r.text
        for r in df.filter(~F.col("source").startswith("dup_of_")).collect()
    }
    for r in dup:
        src = int(r.source.removeprefix("dup_of_"))
        if src in by_id:  # source might itself be a dup; only check originals
            assert r.text == by_id[src]


# ---------------------------------------------------------------------------
# Streaming variant
# ---------------------------------------------------------------------------


def test_synthetic_events_stream_equals_batch_twin(spark, tmp_path):
    """The custom Python STREAMING source must deliver exactly the
    deterministic rows the batch twin regenerates — whole feed and
    per-user rollup both identical after the bounded stream drains."""
    import time

    from pyspark.sql import functions as F

    from cid_etl_spark.sources.synthetic import batch_twin_events, register_stream

    register_stream(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("seed", 7)
        .option("batch_rows", 60)
        .option("max_rows", 180)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_events_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table("synth_events_sink").count() >= 180:
                break
            time.sleep(0.5)
        got = sorted(tuple(r) for r in spark.table("synth_events_sink").collect())
    finally:
        q.stop()
    want = sorted(
        tuple(r) for r in batch_twin_events(spark, seed=7, max_rows=180).collect()
    )
    assert got == want
    assert len(got) == 180
    # rollup parity (the shape a downstream windowed agg consumes)
    agg_stream = (
        spark.table("synth_events_sink")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sv"))
    )
    agg_batch = (
        batch_twin_events(spark, seed=7, max_rows=180)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sv"))
    )
    assert sorted(map(tuple, agg_stream.collect())) == sorted(
        map(tuple, agg_batch.collect())
    )


def test_synthetic_events_stream_replay_is_bit_identical(spark):
    """readBetweenOffsets must re-serve any range identically — the
    property checkpoint replay relies on."""
    from cid_etl_spark.sources.synthetic import SyntheticEventsStreamReader

    r = SyntheticEventsStreamReader({"seed": "7", "batch_rows": "50", "max_rows": "200"})
    first, nxt = r.read({"next": 0})
    first = list(first)
    assert nxt == {"next": 50}
    replay = list(r.readBetweenOffsets({"next": 0}, {"next": 50}))
    assert first == replay
    # bounded drill: past max_rows the source is silent at a stable offset
    empty, stay = r.read({"next": 200})
    assert list(empty) == [] and stay == {"next": 200}
