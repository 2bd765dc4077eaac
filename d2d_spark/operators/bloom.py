"""Broadcast Bloom-filter membership — shuffle-free seen-set dedup for
recurring crawls. The incremental signature store (dedup.py) answers
"which of these documents NEAR-duplicate something already ingested"
with a band join; this answers the cheaper, far more common exact
question — "which of these keys have we EVER seen" — with zero
shuffle: build once over the historical corpus, broadcast the bitmap,
probe as a map-side filter over the new crawl.

Guarantees are the standard Bloom trade: NO false negatives (a key
the filter rejects is definitely unseen, so no duplicate ever slips
through dedup), false positives at ~``fpp`` (that fraction of
genuinely-new keys is wrongly treated as seen and dropped — the
accepted cost of not shuffling 100 TB against a key store).

Implementation notes:

- Build: each partition fills a local numpy bitmap (vectorized
  double hashing via pandas' stable 64-bit hash, two keyed seeds),
  then bitmaps OR together on a tree (``treeAggregate``) so the driver
  receives ONE bitmap, not one per partition.
- Probe: the bitmap ships in the task closure (Spark broadcasts
  closures > 1 MB via the same torrent machinery as explicit
  broadcasts); membership is a vectorized numpy bit test per Arrow
  batch.
- Sizing: bits are rounded up to a power of two (mask, not modulo).
  1e9 keys at 1% fpp is ~1.2 GB — at that point one broadcast bitmap
  stops being the right design, so ``max_bits`` (default 2^31 =
  256 MB ≈ 180M keys at 1%) refuses with the sharding advice instead
  of silently degrading the fpp.
- Filters serialize to bytes (`to_bytes`/`from_bytes`) for the blob
  store, and `union` merges same-shaped filters so each crawl's
  filter folds into the running seen-set without a rebuild.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame

_MAGIC = b"D2DBLOOM"
_H1_KEY = "d2d_bloom_h1____"  # pandas hash keys must be 16 bytes
_H2_KEY = "d2d_bloom_h2____"


def _hash_pair(values) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd
    from pandas.core.util.hashing import hash_pandas_object

    s = pd.Series(values, dtype="string")
    null = s.isna().to_numpy()
    h1 = hash_pandas_object(s.fillna(""), index=False, hash_key=_H1_KEY).to_numpy(
        dtype=np.uint64
    )
    h2 = hash_pandas_object(s.fillna(""), index=False, hash_key=_H2_KEY).to_numpy(
        dtype=np.uint64
    )
    # NULL is its own key, distinguished by flipping bits rather than a
    # sentinel STRING — a sentinel could equal a real key and alias it
    # deterministically, outside the fpp contract
    h1 = np.where(null, h1 ^ np.uint64(0x9E3779B97F4A7C15), h1)
    h2 = np.where(null, h2 ^ np.uint64(0xC2B2AE3D27D4EB4F), h2)
    # force h2 odd so the double-hash probe sequence cycles the whole
    # power-of-two table instead of a short subgroup
    return h1, h2 | np.uint64(1)


class BloomFilter:
    """Immutable-ish bitmap + parameters; see module docstring."""

    def __init__(self, num_bits: int, num_hashes: int, bits: np.ndarray):
        if num_bits & (num_bits - 1):
            raise ValueError(f"num_bits must be a power of two, got {num_bits}")
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.bits = bits  # uint8 array of num_bits // 8 bytes

    # -- construction ---------------------------------------------------
    @staticmethod
    def sizing(expected_items: int, fpp: float) -> tuple[int, int]:
        """(num_bits rounded up to a power of two, num_hashes)."""
        if expected_items <= 0:
            raise ValueError(f"expected_items must be positive, got {expected_items}")
        if not 0.0 < fpp < 1.0:
            raise ValueError(f"fpp must be in (0, 1), got {fpp}")
        m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
        num_bits = 1 << max(10, math.ceil(math.log2(m)))
        k = max(1, min(16, round(num_bits / expected_items * math.log(2))))
        return num_bits, k

    def _positions(self, values) -> np.ndarray:
        h1, h2 = _hash_pair(values)
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) & np.uint64(self.num_bits - 1)).astype(
            np.uint64
        )

    def add_array(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8))

    def contains_array(self, values) -> np.ndarray:
        """Vectorized membership: bool array, True = maybe-seen."""
        pos = self._positions(values)
        byte = self.bits[(pos >> 3).astype(np.int64)]
        hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    # -- merge / serialize ----------------------------------------------
    def union(self, other: "BloomFilter") -> "BloomFilter":
        if (self.num_bits, self.num_hashes) != (other.num_bits, other.num_hashes):
            raise ValueError("can only union same-shaped Bloom filters")
        return BloomFilter(self.num_bits, self.num_hashes, np.bitwise_or(self.bits, other.bits))

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<QI", self.num_bits, self.num_hashes) + self.bits.tobytes()

    @staticmethod
    def from_bytes(data: bytes) -> "BloomFilter":
        if data[:8] != _MAGIC:
            raise ValueError("not a serialized BloomFilter")
        num_bits, k = struct.unpack("<QI", data[8:20])
        bits = np.frombuffer(data[20:], dtype=np.uint8).copy()
        if len(bits) != num_bits // 8:
            raise ValueError("truncated BloomFilter payload")
        return BloomFilter(num_bits, k, bits)


def build_bloom(
    df: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.01,
    max_bits: int = 1 << 31,
) -> BloomFilter:
    """Distributed build: per-partition numpy bitmaps OR-reduced on a
    tree. The driver's footprint is one bitmap (bounded by
    ``max_bits``), never keys."""
    num_bits, k = BloomFilter.sizing(expected_items, fpp)
    if num_bits > max_bits:
        raise ValueError(
            f"{expected_items:,} keys at fpp={fpp} need {num_bits // 8 // 2**20} MB "
            f"of bitmap (> max_bits={max_bits}). One broadcast bitmap is the wrong "
            "design at that size: shard the key space (one filter per hash-range) "
            "or raise fpp, then raise max_bits explicitly."
        )

    def partition_bitmap(it):
        bf = BloomFilter(num_bits, k, np.zeros(num_bits // 8, dtype=np.uint8))
        saw = False
        for pdf in it:
            vals = pdf[key_col]
            if len(vals):
                saw = True
                bf.add_array(vals)
        if saw:
            yield bf.bits.tobytes()

    import pandas as pd

    rdd = (
        df.select(key_col)
        .mapInPandas(
            lambda it: (pd.DataFrame({"b": [b]}) for b in partition_bitmap(it)),
            "b binary",
        )
        .rdd.map(lambda r: np.frombuffer(r["b"], dtype=np.uint8))
    )
    # treeAggregate (not treeReduce) so an empty input yields the zero
    # bitmap without a separate isEmpty() probe job — isEmpty() would
    # hash a whole partition into a bitmap just to throw it away
    zero = np.zeros(num_bits // 8, dtype=np.uint8)
    merged = rdd.treeAggregate(zero, np.bitwise_or, np.bitwise_or)
    return BloomFilter(num_bits, k, merged.copy())


def filter_seen(
    df: DataFrame, bloom: BloomFilter, key_col: str, keep_seen: bool = False
) -> DataFrame:
    """Map-side membership filter. ``keep_seen=False`` (default) keeps
    the definitely-NEW rows — what the next crawl ingests; the dropped
    side contains every true duplicate plus ~fpp of new keys.
    ``keep_seen=True`` keeps the maybe-seen side instead."""

    def probe(batches):
        for pdf in batches:
            if len(pdf):
                seen = bloom.contains_array(pdf[key_col])
                yield pdf[seen] if keep_seen else pdf[~seen]
            else:
                yield pdf

    return df.mapInPandas(probe, schema=df.schema)


def bloom_dedup_incremental(
    new_df: DataFrame,
    key_col: str,
    prior: BloomFilter | None,
    expected_items: int,
    fpp: float = 0.01,
) -> tuple[DataFrame, BloomFilter]:
    """One crawl round: drop keys already in ``prior``, return the
    surviving rows plus the UPDATED filter (prior ∪ this round's
    survivors) to persist for the next round. With ``prior=None``
    starts a fresh seen-set.

    ``fresh`` is consumed twice — once to fold the survivors into the
    returned filter, once when the caller materializes it — so it is
    persisted here; unpersist it (or clearCache) after the caller's
    write completes."""
    from pyspark import StorageLevel

    if prior is None:
        num_bits, k = BloomFilter.sizing(expected_items, fpp)
        prior = BloomFilter(num_bits, k, np.zeros(num_bits // 8, dtype=np.uint8))
    fresh = filter_seen(new_df, prior, key_col).persist(StorageLevel.MEMORY_AND_DISK)
    add = build_bloom(
        fresh, key_col, expected_items, fpp
    )
    if (add.num_bits, add.num_hashes) != (prior.num_bits, prior.num_hashes):
        raise ValueError(
            "expected_items/fpp changed between rounds — rebuild the seen-set "
            "filter from history instead of unioning mismatched shapes"
        )
    return fresh, prior.union(add)


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    fpp: float = 0.001,
    expected_items: int | None = None,
    max_bits: int = 1 << 31,
) -> DataFrame:
    """Join with a Bloom prefilter on the BIG side — the runtime-filter
    pattern for selective joins where the small side is too large to
    BROADCAST as a hash relation but its key BITMAP fits (a bitmap is
    10-100x smaller than a broadcast hash set; 100M keys at fpp 1e-3
    is ~180 MB).

    The result is EXACTLY ``big.join(small, on, how)``: Bloom false
    positives survive the prefilter but die in the real join, and the
    no-false-negative guarantee means no matching row is ever lost.
    What changes is the shuffle: only the ~matching fraction of the
    big side (plus fpp of the rest) reaches the exchange, so a 1%
    -selective join of a 100-TB fact table shuffles ~1 TB instead of
    100 TB. Spark's AQE injects the same filter only within one query
    and only behind `spark.sql.optimizer.runtime.bloomFilter.*`; this
    operator makes it explicit, reusable across stages, and
    persistable (`BloomFilter.to_bytes`).

    - ``inner`` / ``left_semi``: prefilter the big side to maybe-seen
      rows, then join.
    - ``left_anti``: rows whose key is DEFINITELY unseen skip the join
      entirely (the Bloom "no" is authoritative); only maybe-seen rows
      — matching keys plus ~fpp noise — shuffle into the anti join.
      Costs a second map-only pass over ``big`` (no extra shuffle);
      rows with NULL keys never match a join key, so both paths are
      exact regardless of which side of the filter they land on.

    Multi-column keys hash a '\\x1f'-joined string view; collisions in
    that view only ADD false positives, which the real join removes.
    ``expected_items`` defaults to one COUNT(DISTINCT) job over the
    small side's keys — pass it explicitly to skip that job.
    """
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(
            f"bloom_prune_join supports inner/left_semi/left_anti, got {how!r} "
            "— an outer join keeps every big-side row, so there is nothing "
            "to prune; use a plain join"
        )
    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    for frame, side in ((big, "big"), (small, "small")):
        missing = [k for k in keys if k not in frame.columns]
        if missing:
            raise ValueError(f"bloom_prune_join: {side} side lacks key column(s) {missing}")

    def keyed(df: DataFrame) -> DataFrame:
        if len(keys) == 1:
            return df.withColumn("__bk", F.col(keys[0]).cast("string"))
        return df.withColumn(
            "__bk", F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
        )

    small_keys = keyed(small.select(*keys).distinct())
    if expected_items is None:
        expected_items = small_keys.count()
    bloom = build_bloom(small_keys, "__bk", max(expected_items, 1), fpp, max_bits)

    big_k = keyed(big)
    if how == "left_anti":
        survivors = filter_seen(big_k, bloom, "__bk", keep_seen=True).drop("__bk")
        bypass = filter_seen(big_k, bloom, "__bk", keep_seen=False).drop("__bk")
        return survivors.join(small, keys, "left_anti").unionByName(bypass)
    pruned = filter_seen(big_k, bloom, "__bk", keep_seen=True).drop("__bk")
    return pruned.join(small, keys, how)
