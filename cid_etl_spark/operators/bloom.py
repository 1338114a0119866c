"""Bloom-filter runtime pre-filter for big-fact / mid-size-dim semi joins.

Scale rationale: when the key side is too large to broadcast as a hash
join (~10M+ keys) but the fact side is 100 TB, a shuffle semi join
moves the whole fact table.  A Bloom filter of the keys is hundreds of
times smaller than the key set (≈1.2 bytes/key at 1% FPP), broadcasts
cheaply, and drops non-matching fact rows BEFORE the shuffle; the exact
join that follows only sees survivors, and removes the false positives,
so the end result is exactly the semi join.  This mirrors Spark's own
injected runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.*),
but as an explicit, testable operator whose bits we control.

The reference (/root/reference/etl_cid10.py) has no scale-path ops at
all — this is north-star infrastructure for the 100 TB design.

Implementation notes
- Bit positions are computed with a splitmix64-based double hash
  (Kirsch–Mitzenmacher: pos_i = h1 + i*h2 mod m), vectorized in numpy
  over Arrow batches — identical code runs on build and probe, so there
  are NO false negatives by construction.
- Build is distributed end-to-end: each input partition packs its own
  m-bit bitmap inside ``mapInPandas`` (vectorized position scatter),
  and the per-partition bitmaps are OR-merged by a ``treeReduce`` —
  the driver receives exactly ONE m-bit bitmap, never positions, so
  the build cost at the driver is O(m) regardless of key count.
- Keys must be integral (int32/int64).  String keys should be
  pre-hashed to int64 with ``F.xxhash64`` on BOTH sides first.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)
_SEED_2 = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= _SPLITMIX_1
    x ^= x >> np.uint64(27)
    x *= _SPLITMIX_2
    x ^= x >> np.uint64(31)
    return x


def _positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) uint64 bit positions via double hashing."""
    with np.errstate(over="ignore"):
        x = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64(x)
        h2 = _splitmix64(x ^ _SEED_2) | np.uint64(1)  # odd => full cycle
        i = np.arange(k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


@dataclass(frozen=True)
class BloomFilter:
    """Packed bitmap + parameters; pickles into the UDF closure."""

    bits: bytes  # packbits(bitorder='little')
    m: int
    k: int

    def might_contain_np(self, keys: np.ndarray) -> np.ndarray:
        buf = np.frombuffer(self.bits, dtype=np.uint8)
        pos = _positions(keys, self.m, self.k)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        return ((buf[byte_idx] & bit) != 0).all(axis=1)


def optimal_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) minimizing size at the target false-positive
    rate; m is rounded up to a whole byte."""
    n = max(n_keys, 1)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(
    keys: DataFrame, key_col: str, n_keys: int | None = None, fpp: float = 0.01
) -> BloomFilter:
    """Distributed build with no positions collect: every partition
    packs a local m-bit bitmap (one vectorized scatter per Arrow
    batch), and partition bitmaps are OR-merged by ``treeReduce`` so
    the merge work happens in the cluster and the driver receives one
    bitmap of exactly ``m/8`` bytes — independent of key count."""
    if n_keys is None:
        n_keys = keys.count()
    m, k = optimal_params(n_keys, fpp)
    nbytes = m // 8

    def emit(batches):
        bitmap = None
        for pdf in batches:
            vals = pdf[key_col].dropna().to_numpy()
            if len(vals) == 0:
                continue
            if bitmap is None:
                bitmap = np.zeros(nbytes, dtype=np.uint8)
            pos = _positions(vals, m, k).ravel()
            np.bitwise_or.at(
                bitmap,
                (pos >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
            )
        if bitmap is not None:
            yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    parts = (
        keys.select(key_col)
        .mapInPandas(emit, "bm binary")
        .rdd.map(lambda r: np.frombuffer(bytes(r["bm"]), dtype=np.uint8))
    )
    try:
        bitmap = parts.treeReduce(np.bitwise_or, depth=2)
    except ValueError:  # empty key set: no partition emitted a bitmap
        bitmap = np.zeros(nbytes, dtype=np.uint8)
    return BloomFilter(bits=bitmap.tobytes(), m=m, k=k)


def bloom_prefilter(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """Rows of *df* whose *col* MIGHT be in the filter (never drops a
    true match).  Arrow-batched vectorized probe; place this before the
    shuffle of an exact join so only survivors move."""

    @F.pandas_udf(BooleanType())
    def might_contain(s: pd.Series) -> pd.Series:
        vals = s.to_numpy()
        ok = np.zeros(len(vals), dtype=bool)
        mask = ~pd.isna(vals)
        if mask.any():
            ok[mask] = bloom.might_contain_np(vals[mask].astype(np.int64))
        return pd.Series(ok)

    return df.filter(might_contain(F.col(col)))


def bloom_semi_join(
    fact: DataFrame, keys: DataFrame, fact_col: str, key_col: str,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact semi join with a Bloom pre-filter on the fact side: the
    bloom drops ~(1-selectivity) of fact rows map-side, the exact
    ``left_semi`` join then removes false positives."""
    # the keys plan is consumed three times (sizing count, position
    # emit, exact join) — materialize it once; localCheckpoint so the
    # blocks release on GC instead of pinning session storage
    keys = keys.select(key_col).localCheckpoint(eager=True)
    bloom = build_bloom(keys, key_col, fpp=fpp)
    pre = bloom_prefilter(fact, fact_col, bloom)
    return pre.join(
        keys.select(F.col(key_col).alias(fact_col)).distinct(), fact_col, "left_semi"
    )
