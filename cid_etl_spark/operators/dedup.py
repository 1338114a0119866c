"""Deduplication operators.

Reference parity (A3) plus the LLM-data-pipeline dedup family
(BASELINE.json north_star): exact content dedup, MinHash+LSH,
SimHash, and n-gram Jaccard near-dup.  All are shuffle-conscious:

- priority/exact dedup = ONE hash shuffle on the key + per-partition
  sort (window ``row_number``), never a global sort (SURVEY §2.4 A3).
- MinHash/LSH banding turns the O(N²) all-pairs problem into a
  shuffle on (band, bucket-signature) — only documents that collide in
  some band are ever compared, which is what makes near-dup feasible
  on 100 TB.
- All hashing is deterministic (``xxhash64``/``md5``-derived), so runs
  are reproducible across clusters and match SQL oracles.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_LOG = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# Reference-parity dedup
# ---------------------------------------------------------------------------


def priority_dedup(
    df: DataFrame,
    keys: str | Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """A3 — keep exactly one row per key, the first under *order*
    (reference: stable sort by ``fonte`` DESC + ``drop_duplicates``,
    etl_cid10.py:183-184,360-361).

    The window form is the only shuffle-safe equivalent of pandas'
    stable sort-then-drop (SURVEY §4.2.1): Spark's
    ``orderBy().dropDuplicates()`` does NOT guarantee the survivor.
    Callers must make *order* total (add a unique tiebreaker) for a
    deterministic survivor.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(
    df: DataFrame,
    content_cols: str | Sequence[str],
    tiebreak: Sequence[Column] | None = None,
) -> DataFrame:
    """Exact content dedup: one survivor per distinct content.

    Hash-groupBy semantics — the content columns are the key; the
    survivor is the minimum under *tiebreak* (deterministic) or an
    arbitrary-but-single row when no tiebreak is given.  For long text
    at scale, pre-hash the content (``xxhash64``) so the shuffle key is
    8 bytes instead of the document body.
    """
    cols = [content_cols] if isinstance(content_cols, str) else list(content_cols)
    key = F.xxhash64(*[F.col(c) for c in cols]).alias("__content_hash")
    order = list(tiebreak) if tiebreak is not None else [F.lit(1)]
    return priority_dedup(df.withColumn("__content_hash", key), "__content_hash", order).drop(
        "__content_hash"
    )


# ---------------------------------------------------------------------------
# Near-duplicate dedup: MinHash + LSH
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31-1: modulus for the universal-hash family used by
#: the MinHash permutations.  31-bit so that ``a*h + b`` stays < 2^62
#: and never overflows BIGINT arithmetic (Spark 4 runs ANSI mode —
#: silent wraparound is an error, and we wouldn't want it anyway).
#: Fixed a/b parameters derive from the seed so signatures are
#: reproducible run-to-run and cluster-to-cluster.
_MERSENNE_31 = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    # Deterministic LCG expansion of the seed — no RNG state, identical
    # on every executor and every run.
    params = []
    x = seed & 0x7FFFFFFFFFFFFFFF
    for _ in range(num_hashes):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (_MERSENNE_31 - 1)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % _MERSENNE_31
        params.append((a, b))
    return params


def shingles(text: Column | str, n: int = 5, words: bool = True) -> Column:
    """Distinct n-gram shingle array for MinHash/Jaccard.

    Word shingles (default) are robust to whitespace noise; character
    shingles (``words=False``) suit CJK / no-whitespace text.
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(F.trim(c))
    if words:
        toks = F.split(c, r"\s+")
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    else:
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - n + 1, F.lit(1))),
            lambda i: c.substr(i, F.lit(n)),
        )
    return F.array_distinct(grams)


def md5_base_hash(s: Column) -> Column:
    """28-bit shingle hash from an md5 prefix — slower than xxhash64
    but reproducible in any engine with md5 (DuckDB oracle parity:
    ``('0x' || substr(md5(g), 1, 7))::BIGINT``)."""
    return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")


def minhash_signature(
    shingle_arr: Column,
    num_hashes: int = 64,
    seed: int = 42,
    base_hash=None,
) -> Column:
    """MinHash signature as an ``array<bigint>`` of length *num_hashes*.

    Base shingle hash is ``xxhash64`` truncated to 31 bits (JVM-side,
    deterministic) unless *base_hash* (Column→Column) overrides it —
    pass :func:`md5_base_hash` when an external engine must replay the
    signature bit-for-bit; each permutation is a universal hash
    ``(a*h + b) mod 2^31-1`` evaluated with ``F.transform`` /
    ``F.array_min`` — all codegen, no Python in the row path.
    """
    if base_hash is None:
        base_hash = lambda s: F.xxhash64(s).bitwiseAND(  # noqa: E731
            F.lit(_MERSENNE_31).cast("bigint")
        )
    base = F.transform(shingle_arr, base_hash)
    mins = [
        F.array_min(
            F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE_31))
        )
        for a, b in _hash_params(num_hashes, seed)
    ]
    return F.array(*mins)


def _drop_hot_buckets(
    banded: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Hot-bucket guard shared by the banded LSH self-joins: drop
    ``(band, bucket)`` groups larger than *max_bucket_size* — NEVER
    silently (counts logged at WARNING) — so one degenerate bucket
    can't become a single quadratic straggler task.  The membership
    table stays LAZY on purpose: banding is cheap map work over the
    (usually cached) signature table, while materializing it would
    round-trip the raw band-key strings through RDD serialization —
    measured ~15% of the composed pipeline's wall at sf0.1.  The guard
    costs one extra banding pass for the bucket-count check; the
    anti-join is added only when a hot bucket actually exists.
    ``None`` disables the guard (and its one eager count job).
    """
    if max_bucket_size is None:
        return banded
    hot = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket_size)
    )
    stats = hot.agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("__n").alias("n_rows")
    ).first()
    if stats["n_buckets"]:
        _LOG.warning(
            "LSH hot-bucket guard: dropped %d bucket(s) totalling %d banded "
            "rows (> max_bucket_size=%d); members still pair via their "
            "other bands",
            stats["n_buckets"],
            stats["n_rows"],
            max_bucket_size,
        )
        banded = banded.join(
            hot.select("band", "bucket"), ["band", "bucket"], "left_anti"
        )
    return banded


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    signature_col: str,
    num_bands: int = 16,
    hash_buckets: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate duplicate pairs
    ``(id_a, id_b)`` with ``id_a < id_b``.

    Rows agreeing on ALL rows-per-band values within any band land in
    the same bucket; the self-join shuffles on the (band, bucket-hash)
    key only.  Output is distinct pairs — verify with
    :func:`jaccard_similarity` downstream.  ``hash_buckets=False``
    keeps the raw band-value string as the bucket key (byte-identical
    across engines, for oracle replay) instead of xxhash64-ing it —
    same candidate set modulo hash collisions, fatter shuffle key.

    **Hot-bucket guard.**  The within-bucket self-join is quadratic in
    bucket size, so ONE degenerate band bucket (boilerplate-heavy
    corpus: thousands of docs agreeing on a band) turns into a single
    straggler task emitting billions of pairs.  With *max_bucket_size*
    set, buckets larger than the cap are DROPPED before the join, and
    the drop is never silent: the banded membership table stays LAZY
    (banding is cheap map work over the usually-cached signature
    table; materializing it would round-trip raw band keys through RDD
    serialization — ~15% of the composed pipeline's wall at sf0.1), so
    the guard costs one extra banding pass for the bucket-count check
    and the dropped bucket/row counts are logged at WARNING; the
    anti-join is added only when a hot bucket actually exists.  Docs
    in a dropped bucket still pair through their other
    ``num_bands - 1`` bands, and a bucket that hot is a near-clone
    family the EXACT dedup stage upstream already collapses.

    The DEFAULT is ``None`` (no cap): oracle-checked callers get the
    exact uncapped semantics their SQL twins model.  Scale-oriented
    callers pass an explicit cap (2000 → ≤2M pairs per bucket bounds
    the worst single task at 100 TB; far above anything a healthy
    corpus produces at test SF, so fixtures never trip it and any
    firing is attributable via the WARNING log).
    """
    sig = F.col(signature_col)
    # bands as (band_index, hash of the band slice)
    rows_per_band = F.floor(F.size(sig) / num_bands).cast("int")

    def band_key(b):
        key = F.concat_ws(
            ",",
            F.transform(
                F.slice(sig, b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
        )
        return F.xxhash64(key) if hash_buckets else key

    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(num_bands - 1)), band_key)
        ).alias("band", "bucket"),
    )
    banded = _drop_hot_buckets(banded, max_bucket_size)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )


def jaccard_similarity(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _gram_hashes_exploded(texts, n: int) -> "tuple":
    """Distinct word-n-gram hashes per text, replicating EXACTLY the
    tokenization of :func:`shingles` (and therefore of the DuckDB
    oracles written against it): ``lower`` → trim *spaces only* →
    split on Java ``\\s+`` keeping empty edge tokens → n-gram join with
    ``' '`` → distinct.  The only difference is that each gram leaves
    the batch as a 64-bit deterministic hash
    (``pandas.util.hash_array`` siphash) instead of a string.

    Returns ``(flat: uint64 ndarray, lens: int64 ndarray)``.
    """
    import re

    import numpy as np

    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s, not Python unicode \s
    all_grams: list = []
    lens = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not isinstance(t, str):
            continue  # null text: shingles() yields null, explode drops it
        toks = ws.split(t.lower().strip(" "))
        if len(toks) > n:
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        else:
            grams = [" ".join(toks)]
        h = np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))
        all_grams.append(h)
        lens[i] = len(h)
    flat = np.concatenate(all_grams) if all_grams else np.empty(0, dtype=np.uint64)
    return flat, lens


def shingle_index_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Inverted shingle index: one row per ``(document, distinct
    shingle)`` with the shingle as a BIGINT hash — ``(__id[, __blk],
    __n, __g)`` where ``__n`` is the document's distinct-shingle count.

    Built in ONE vectorized ``mapInPandas`` pass (tokenize → n-gram →
    hash → unique, all numpy/siphash inside the Arrow batch), so the
    Spark plan is a bare projection: no interpreted array HOFs
    (~0.4 ms/doc measured), no string array materialization, no
    ``explode``.  Downstream joins key on the 8-byte hash instead of a
    20-30 byte gram string — roughly 3× less shuffle volume, and the
    join itself is a long-vs-long comparison.
    """
    import numpy as np

    cols = [F.col(id_col).alias("__id")]
    if block_col:
        cols.append(F.col(block_col).alias("__blk"))
    cols.append(F.col(text_col).alias("__t"))
    prepped = df.select(*cols)
    id_field = df.schema[id_col].dataType.simpleString()
    blk_field = (
        f", __blk {df.schema[block_col].dataType.simpleString()}" if block_col else ""
    )

    def expand(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, lens = _gram_hashes_exploded(pdf["__t"].tolist(), n)
            rep = np.repeat(np.arange(len(pdf)), lens)
            out = {"__id": pdf["__id"].to_numpy()[rep]}
            if block_col:
                out["__blk"] = pdf["__blk"].to_numpy()[rep]
            out["__n"] = lens[rep]
            out["__g"] = flat.view(np.int64)
            yield pd.DataFrame(out)

    return prepped.mapInPandas(
        expand, schema=f"__id {id_field}{blk_field}, __n bigint, __g bigint"
    )


def ngram_jaccard_pairs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted shingle index.

    Returns ``(id_a, id_b, jaccard)`` with ``round(jaccard, 4) >=
    threshold``.  Instead of a blocked self-join that evaluates
    ``array_intersect`` on every candidate pair (O(N²) per block — 138 s
    at sf0.1, unusable at 100 TB), we explode the distinct shingles and
    self-join on the shingle itself: each output row of that join IS one
    common shingle of one pair, so ``count(*)`` grouped by the pair is
    ``|A ∩ B|`` and ``|A ∪ B| = |A| + |B| - |A ∩ B|``.  Work is
    proportional to the number of *actually shared* shingles, the
    aggregate partially combines map-side, and pairs sharing nothing are
    never materialized (correct for any ``threshold > 0``).  Hot
    shingles are the skew risk — for web-scale corpora drop shingles
    with document frequency above a cap, or use MinHash banding
    (:func:`minhash_dedup_pairs`) as the sub-quadratic path.

    *block_col* (e.g. language) additionally restricts pairs to equal
    block values, matching the blocked-join semantics.

    The index rows are built by :func:`shingle_index_arrow` (vectorized
    Arrow pass, grams as 64-bit hashes) and persisted: the self-join
    consumes the index twice, and without the barrier the whole
    tokenize+hash pipeline — i.e. the corpus scan — runs once per side.
    Intersection counts over hashed grams equal string-gram counts
    absent a 64-bit collision *within one document pair's union*
    (probability ~m²·2⁻⁶⁴ for m shared shingles — negligible even at
    100 TB corpus scale, and any collision only perturbs one pair's
    count by 1).
    """
    common = _shared_shingle_counts(df, id_col, text_col, n, block_col)
    j = F.round(
        F.col("__common") / (F.col("__na") + F.col("__nb") - F.col("__common")), 4
    )
    return (
        common.withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _shared_shingle_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    block_col: str | None,
) -> DataFrame:
    """Inverted-index core shared by the exact set-similarity joins:
    ``(id_a, id_b, __na, __nb, __common)`` for every pair sharing at
    least one distinct n-gram shingle (see
    :func:`ngram_jaccard_pairs_exact` for the cost model)."""
    # localCheckpoint, not persist: both self-join sides consume the
    # index, and a persist would pin executor storage for the session
    # (the returned pair table is lazy, so there is no safe unpersist
    # point) — checkpointed blocks are released when the plan is GC'd.
    ex = shingle_index_arrow(df, id_col, text_col, n, block_col).localCheckpoint(
        eager=True
    )
    a = ex.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("__na"),
        *([F.col("__blk").alias("__blk")] if block_col else []),
        "__g",
    )
    b = ex.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("__nb"),
        *([F.col("__blk")] if block_col else []),
        "__g",
    )
    keys = (["__blk"] if block_col else []) + ["__g"]
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__na", "__nb")
        .agg(F.count(F.lit(1)).alias("__common"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs via the same inverted shingle
    index as :func:`ngram_jaccard_pairs_exact`.

    Containment ``|A ∩ B| / min(|A|, |B|)`` is the asymmetric
    near-dup measure: a short document quoted or wholly embedded
    inside a long one scores near 1.0 here while its Jaccard stays
    tiny (the union is dominated by the long side) — the
    boilerplate-wrapper / quote-farm / subset-page case Jaccard
    misses entirely.  Same cost model as the Jaccard variant: work ∝
    shingles actually shared, map-side partial aggregation, no pair
    materialized without a common shingle (correct for any
    ``threshold > 0``).  Emits ``(id_a, id_b, containment,
    len_ratio)`` with ``round(containment, 4) >= threshold``;
    ``len_ratio = min/max`` shingle-count ratio separates true
    near-dups (ratio ≈ 1) from subset relations (ratio ≪ 1).
    """
    common = _shared_shingle_counts(df, id_col, text_col, n, block_col)
    c = F.round(F.col("__common") / F.least("__na", "__nb"), 4)
    r = F.round(
        F.least("__na", "__nb") / F.greatest("__na", "__nb"), 4
    )
    return (
        common.withColumn("containment", c)
        .withColumn("len_ratio", r)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "len_ratio")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PPJoin-style prefix filtering
    (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection", WWW'08) — the exact-similarity-join scale path.

    Same contract as :func:`ngram_jaccard_pairs_exact` (``(id_a, id_b,
    jaccard)`` with ``round(jaccard, 4) >= threshold``), different cost
    model.  The inverted-index variant pays |df|² join rows for a
    shingle of document frequency |df| — quadratic in the hottest
    shingle ("the", " th" appear in nearly every document), which is
    exactly the skew that kills a web-scale corpus.  Prefix filtering
    instead orders each document's shingles rarest-first (global
    document frequency ascending, shingle as tie-break — any total
    order is correct) and indexes only the first
    ``floor((1 - t)·|A|) + 1`` of them: two sets with Jaccard ≥ t MUST
    share at least one prefix shingle, so joining on prefix shingles
    alone loses no pairs, and prefix shingles are by construction the
    RARE ones.  Candidates then pass a size filter
    (``t·|A| ≤ |B| ≤ |A|/t``) and an exact ``array_intersect`` verify.

    Shuffle profile: one groupBy for document frequencies, one window
    per document to rank shingles, the candidate join on rare shingles,
    and a verify join back to the shingle arrays — every stage
    partition-parallel with map-side combine, no stage quadratic in a
    hot key.
    """
    blk = [F.col(block_col).alias("__blk")] if block_col else []
    bkeys = ["__blk"] if block_col else []
    sized = df.select(
        F.col(id_col).alias("__id"), *blk, shingles(text_col, n).alias("__grams")
    ).withColumn("__n", F.size("__grams"))
    ex = sized.select("__id", *bkeys, "__n", F.explode("__grams").alias("__g"))
    dftab = ex.groupBy(*bkeys, "__g").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy("__df", "__g")
    # prefix length floor((1-t)*n)+1 == n - ceil(t*n) + 1; the 1e-9
    # guards against fp under-rounding, which would drop true pairs
    prefix_len = (
        F.floor(F.lit(1.0 - threshold) * F.col("__n") + F.lit(1e-9)).cast("int") + 1
    )
    pref = (
        ex.join(dftab, bkeys + ["__g"])
        .withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= prefix_len)
        .select(*bkeys, "__g", "__id", "__n")
    )
    a = pref.select(
        *bkeys, "__g", F.col("__id").alias("id_a"), F.col("__n").alias("__na")
    )
    b = pref.select(
        *bkeys, "__g", F.col("__id").alias("id_b"), F.col("__n").alias("__nb")
    )
    cand = (
        a.join(b, bkeys + ["__g"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__nb") >= F.lit(threshold) * F.col("__na") - F.lit(1e-9))
            & (F.col("__na") >= F.lit(threshold) * F.col("__nb") - F.lit(1e-9))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ga = sized.select(F.col("__id").alias("id_a"), F.col("__grams").alias("__ga"))
    gb = sized.select(F.col("__id").alias("id_b"), F.col("__grams").alias("__gb"))
    verified = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn(
            "jaccard", F.round(jaccard_similarity(F.col("__ga"), F.col("__gb")), 4)
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def minhash_signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures as ``(id, mh_0..mh_{k-1})`` columns via
    explode + hash aggregate — the scale path.

    Array higher-order functions (transform/aggregate) are interpreted
    per element outside whole-stage codegen; exploding the shingles
    and taking ``k`` plain ``min()`` aggregates keeps everything in
    codegen with map-side partial aggregation, so the shuffle carries
    one row per document, not per shingle.  (~6× faster than the
    HOF formulation at sf0.1.)
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, shingle_n)).alias("__shingle"),
    )
    h = F.xxhash64("__shingle").bitwiseAND(F.lit(_MERSENNE_31).cast("bigint"))
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE_31)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes, seed))
    ]
    return sh.groupBy("__id").agg(*aggs)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """End-to-end MinHash near-dup: shingle → sign → band → candidate
    pairs → exact-Jaccard verify ≥ *threshold*.

    Returns ``(id_a, id_b, jaccard)``.  Signatures come from
    :func:`minhash_signature_table` (codegen'd aggregate); banding
    hashes ``rows_per_band`` signature columns directly with a
    multi-arg ``xxhash64`` — no array materialization at all.  The
    exact-verify join then moves shingle arrays for candidate rows
    only — at 100 TB that's the difference between feasible and not.
    With *max_bucket_size* set (scale-oriented callers pass 2000;
    the default ``None`` keeps oracle-exact uncapped semantics) the
    band self-join runs behind the :func:`_drop_hot_buckets` guard —
    see :func:`lsh_candidate_pairs` for the rationale and why fixtures
    never trip it.
    """
    signed = minhash_signature_table_arrow(
        df, id_col, text_col, shingle_n, num_hashes, seed
    )
    # Materialize the signature table: it is k×8 bytes per DOCUMENT
    # (thousands of times smaller than the corpus), while the plan
    # below consumes it four times (both self-join sides + downstream).
    # Without the barrier Spark recomputes the shingle+sign pipeline —
    # i.e. re-reads the corpus — once per consumer.  localCheckpoint
    # rather than persist: the result is consumed lazily by the caller,
    # so a persist would pin executor storage for the session.
    signed = signed.localCheckpoint(eager=True)
    rows_per_band = max(num_hashes // num_bands, 1)
    band_hashes = F.array(
        *[
            F.xxhash64(
                *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
            for b in range(num_bands)
        ]
    )
    banded = _drop_hot_buckets(
        signed.select("__id", F.posexplode(band_hashes).alias("band", "bucket")),
        max_bucket_size,
    )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    # candidate list is tiny (bucket collisions only) but consumed three
    # times below — materialize it so each consumer doesn't replay the
    # band self-join (localCheckpoint: released on GC, never pinned)
    pairs = pairs.localCheckpoint(eager=True)
    # shingle ONLY candidate rows: semi-join the corpus against the
    # candidate ids first, so the (expensive) shingle arrays are built
    # for collision rows, never the whole corpus
    cand_ids = (
        pairs.select(F.col("id_a").alias("__id"))
        .union(pairs.select(F.col("id_b").alias("__id")))
        .distinct()
    )
    sh = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .join(cand_ids, "__id", "left_semi")
        .select("__id", shingles("__text", shingle_n).alias("__sh"))
    )
    # joins left un-hinted: AQE broadcasts whichever side is actually
    # small at runtime (candidates in the common case; never a blown
    # broadcast when a pathological corpus yields huge candidate sets)
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jaccard_similarity(F.col("__sh_a"), F.col("__sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column | str, n: int = 3, bits: int = 64) -> Column:
    """64-bit SimHash over word n-gram features, as a BIGINT column.

    Per bit: count features with that hash bit set; the fingerprint bit
    is 1 iff more than half vote 1.  ONE ``aggregate`` pass over the
    feature array with an array-of-counters accumulator (``bit_get``
    extracts bits with a non-literal position); the final assembly is a
    64-way unrolled OR of literal shifts — all codegen, no Python.
    """
    feats = shingles(text, n)
    hashes = F.transform(feats, lambda s: F.xxhash64(s))
    total = F.size(hashes)
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(positions, lambda b: F.bit_get(h, b)),
            lambda a, x: a + x,
        ),
    )
    sig = F.lit(0).cast("bigint")
    for i in range(bits):
        bit = (
            F.when(F.get(counts, i) * 2 > total, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def simhash_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bits: int = 64,
    base_hash=None,
) -> DataFrame:
    """SimHash fingerprints as ``(__id, __fp)`` via explode + codegen'd
    aggregate — the scale path (same rationale as
    :func:`minhash_signature_table`): per exploded feature row we take
    64 plain conditional sums (literal shift positions), which
    whole-stage-codegens and partially aggregates map-side; the
    array-lambda formulation in :func:`simhash` is interpreted.
    *base_hash* (Column→Column) overrides the xxhash64 feature hash —
    pass an md5-prefix hash (with ``bits<=60``) when an external
    engine must replay the fingerprint bit-for-bit."""
    feats = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, n)).alias("__feat"),
    )
    h = base_hash(F.col("__feat")) if base_hash else F.xxhash64("__feat")
    one = F.lit(1).cast("bigint")
    aggs = [
        F.sum(F.shiftrightunsigned(h, i).bitwiseAND(one)).alias(f"b{i}")
        for i in range(bits)
    ] + [F.count(F.lit(1)).alias("__n")]
    counts = feats.groupBy("__id").agg(*aggs)
    sig = F.lit(0).cast("bigint")
    for i in range(bits):
        bit = (
            F.when(F.col(f"b{i}") * 2 > F.col("__n"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return counts.select("__id", sig.alias("__fp"))


def hamming_distance64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n: int = 3,
    bits: int = 64,
    signer=None,
) -> DataFrame:
    """SimHash near-dup pairs with pigeonhole banding.

    The *bits*-wide fingerprint is split into ``max_hamming + 1``
    chunks: two fingerprints within the Hamming budget MUST agree on
    at least one chunk, so the self-join shuffles on (chunk_index,
    chunk_value) only — never all-pairs — with guaranteed recall.
    Smaller budgets → wider chunks → fewer candidate collisions.
    *signer* overrides the fingerprint stage (default: the Arrow
    xxhash64 signer) — e.g. an md5-based :func:`simhash_table` for
    engine-replicable fingerprints.
    """
    if signer is None:
        signer = lambda d: simhash_table_arrow(d, id_col, text_col, n)  # noqa: E731
    fp = signer(df).select(F.col("__id"), F.col("__fp"))
    return hamming_pairs_from_fingerprints(
        fp, id_col="__id", fp_col="__fp", bits=bits, max_hamming=max_hamming
    )


def hamming_pairs_from_fingerprints(
    fp: DataFrame,
    id_col: str = "__id",
    fp_col: str = "__fp",
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """Pigeonhole-banded Hamming pairs over PRECOMPUTED fingerprints.

    Shared blocking core for any fixed-width fingerprint family —
    SimHash over text shingles, perceptual hashes over decoded media,
    quantized embedding sign patterns.  The *bits*-wide fingerprint is
    split into ``max_hamming + 1`` chunks: two fingerprints within the
    Hamming budget MUST agree on at least one chunk (pigeonhole), so
    the self-join shuffles on (chunk_index, chunk_value) only — never
    all-pairs — with guaranteed recall.  Emits ``(id_a, id_b,
    hamming)`` with ``id_a < id_b``.
    """
    n_chunks = min(max_hamming + 1, 32)
    bounds = [round(i * bits / n_chunks) for i in range(n_chunks + 1)]
    fp = fp.select(F.col(id_col).alias("__id"), F.col(fp_col).alias("__fp"))
    # 16 bytes per document — materialize so the chunk self-join's two
    # sides and the Hamming verify all reuse it instead of re-scanning
    # the corpus (same rationale as minhash_dedup_pairs; localCheckpoint
    # so the blocks release on GC instead of pinning session storage).
    fp = fp.localCheckpoint(eager=True)
    chunk_exprs = [
        F.shiftrightunsigned(F.col("__fp"), lo).bitwiseAND(
            F.lit((1 << (hi - lo)) - 1).cast("bigint")
        )
        for lo, hi in zip(bounds, bounds[1:])
    ]
    chunks = fp.select(
        "__id",
        "__fp",
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_idx", "chunk_val"),
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.col("l.__fp").alias("fp_a"),
            F.col("r.__fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming_distance64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _shingle_hashes_py(texts, n: int) -> "tuple":
    """Vectorized Python-side word-shingle hashing for the Arrow
    signers: per text, DISTINCT word n-gram hashes (64-bit, via
    ``pandas.util.hash_array`` — deterministic siphash, identical on
    every executor and run).

    Rationale: Spark's array higher-order functions (transform /
    concat_ws-over-slice / array_distinct) evaluate INTERPRETED per
    element — measured ~0.4 ms/doc just to build shingle arrays, which
    dominated minhash/simhash wall time.  Tokenizing and joining in
    Python then hashing one flat numpy array is ~10× cheaper and keeps
    the whole feature pipeline inside the same Arrow batch.

    Returns ``(flat_hashes: uint64 ndarray, lens: int64 ndarray)`` —
    the concatenated per-text distinct hashes and each text's count.
    """
    import numpy as np

    all_grams: list[np.ndarray] = []
    lens = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split() if isinstance(t, str) else []
        if len(toks) >= n:
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        elif toks:
            grams = [" ".join(toks)]
        else:
            lens[i] = 0
            continue
        h = np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))
        all_grams.append(h)
        lens[i] = len(h)
    flat = (
        np.concatenate(all_grams) if all_grams else np.empty(0, dtype=np.uint64)
    )
    return flat, lens


def minhash_signature_table_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures, Arrow path: the whole feature pipeline —
    tokenize, shingle, hash, k permutation-mins — runs vectorized
    inside ONE ``mapInPandas`` pass; the Spark plan is a trivial
    ``lower(trim(text))`` projection.

    Structural wins over the explode+groupBy formulation
    (:func:`minhash_signature_table`):

    - **No shuffle at all**: each document's signature is computed
      where the document lives — signing is fully map-side.
    - **No codegen bomb**: ``k`` separate ``min()`` aggregates compile
      a huge Janino function (~9 s cold at k=32 — measured).
    - **No interpreted HOFs**: Spark's array lambdas evaluate per
      element outside codegen (~0.4 ms/doc for shingling alone —
      measured); the numpy path hashes one flat array per batch and
      takes segment minima with ``np.minimum.reduceat``.

    Signature values differ from :func:`minhash_signature_table` (a
    different 64-bit base hash), but MinHash guarantees hold for any
    uniform hash; downstream Jaccard verification is exact either way.
    """
    import numpy as np

    params = _hash_params(num_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in params], dtype=np.int64)[:, None]
    p = np.int64(_MERSENNE_31)

    prepped = df.select(
        F.col(id_col).alias("__id"), F.lower(F.trim(F.col(text_col))).alias("__t")
    )
    out_fields = ", ".join(f"mh_{i} bigint" for i in range(num_hashes))
    id_field = df.schema[id_col].dataType.simpleString()

    def sign(batches):
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            flat, lens = _shingle_hashes_py(pdf["__t"].tolist(), shingle_n)
            # 31-bit base hash keeps a*h in int64 range
            flat = (flat & np.uint64(_MERSENNE_31)).astype(np.int64)
            keep = lens > 0
            out = np.full((n_rows, len(a_vec)), p, dtype=np.int64)
            if keep.any():
                perm = (a_vec * flat[None, :] + b_vec) % p
                offsets = np.zeros(int(keep.sum()), dtype=np.int64)
                np.cumsum(lens[keep][:-1], out=offsets[1:])
                out[keep] = np.minimum.reduceat(perm, offsets, axis=1).T
            cols = {"__id": pdf["__id"].to_numpy()}
            cols.update({f"mh_{i}": out[:, i] for i in range(len(a_vec))})
            yield pd.DataFrame(cols)

    return prepped.mapInPandas(sign, schema=f"__id {id_field}, {out_fields}")


def simhash_table_arrow(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, bits: int = 64
) -> DataFrame:
    """SimHash fingerprints, Arrow path (same design as
    :func:`minhash_signature_table_arrow`): tokenize + shingle + hash +
    64 per-bit majority votes all inside one vectorized ``mapInPandas``
    pass over ``lower(trim(text))``.  Fully map-side, no shuffle, no
    interpreted array lambdas, no 64-aggregate codegen unit."""
    import numpy as np

    prepped = df.select(
        F.col(id_col).alias("__id"), F.lower(F.trim(F.col(text_col))).alias("__t")
    )
    id_field = df.schema[id_col].dataType.simpleString()
    shifts = np.arange(bits, dtype=np.uint64)

    def sign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, lens = _shingle_hashes_py(pdf["__t"].tolist(), n)
            fps = np.zeros(len(pdf), dtype=np.uint64)
            keep = lens > 0
            if keep.any():
                bitmat = (
                    (flat[:, None] >> shifts[None, :]) & np.uint64(1)
                ).astype(np.int64)
                offsets = np.zeros(int(keep.sum()), dtype=np.int64)
                np.cumsum(lens[keep][:-1], out=offsets[1:])
                counts = np.add.reduceat(bitmat, offsets, axis=0)
                maj = (counts * 2 > lens[keep][:, None]).astype(np.uint64)
                fps[keep] = (maj << shifts[None, :]).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {"__id": pdf["__id"].to_numpy(), "__fp": fps.view(np.int64)}
            )

    return prepped.mapInPandas(sign, schema=f"__id {id_field}, __fp bigint")


def md5_base_hash_60(s):
    """60-bit feature hash from an md5 prefix (SimHash variant of
    :func:`md5_base_hash`): wide enough for bit votes, narrow enough
    that ``1 << 59`` stays in BIGINT in every engine."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
