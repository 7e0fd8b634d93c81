"""Explicit Bloom-filter runtime join reduction.

Spark's optimizer injects the same structure automatically on a cluster
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, and the underlying
``BloomFilterAggregate`` expression), but the aggregate is not registered
as a public SQL function in this build — so the engine carries its own
form, built from ordinary JVM expressions:

1. BUILD: hash each build-side key ``k`` times (xxhash64 with k seeds),
   fold the bit positions into 64-bit words with a ``bit_or`` aggregate —
   one small shuffle of (word_index, word) pairs, output bounded at
   ``m/64`` rows by construction.
2. SHIP: collect the word table (``_BLOOM_BITS/64`` longs — a bounded
   artifact like the two-phase offset tables, NOT a data collect) and fold
   it into ONE array literal (``split`` of a CSV string literal — a single
   py4j hop, foldable to one ArrayData; see functions/twophase.py for why
   per-element ``F.lit`` lists and literal maps are driver-time traps).
3. PROBE: a pure-codegen predicate over the fact column — k ``element_at``
   word lookups + bit tests — applied BEFORE the join shuffle, so only
   probable matches are shuffled. False positives (~(1-e^(-kn/m))^k) are
   eliminated by the exact join that follows, so query output is exact and
   the filter is invisible to the oracle.

At 100 TB the collect-and-fold step is exactly what Spark's runtime filter
does (the bloom is built on the dim side and broadcast into the fact
scan); the win is shuffling ~sel·|fact| rows instead of |fact|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 65536 bits / 1024 words keeps the shipped literal ~8 KB; with k=3 hashes
# the false-positive rate stays under 1e-4 up to ~2000 build keys. Size m
# to the build-side cardinality on a real cluster (Spark's own runtime
# filter defaults to 1M bits / 8M max).
BLOOM_BITS = 1 << 16
BLOOM_K = 3
_WORDS = BLOOM_BITS // 64


def _one_shifted_by(bits: Column) -> Column:
    # F.shiftleft only takes a Python-int shift; the SQL function form
    # accepts a column
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _positions(key: Column) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(BLOOM_BITS))
        for i in range(BLOOM_K)
    ]


def build_bloom_words(keys: DataFrame, key_col: str) -> list[int]:
    """Aggregate the build side into the dense ``m/64``-long word table."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    )
    rows = (
        pos.select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            _one_shifted_by((F.col("p") % 64).cast("int")).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * _WORDS
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(words: list[int], probe: Column) -> Column:
    """The probe-side predicate: true iff all k bits for ``probe`` are set.

    Null probe keys test false (they cannot join anyway). The word table is
    folded into a single array literal; each of the k tests is two integer
    ops + one O(1) ``element_at`` — fully inside whole-stage codegen.
    """
    csv = ",".join(str(w) for w in words)
    arr = F.split(F.lit(csv), ",")
    pred = F.lit(True)
    for p in _positions(probe):
        word = F.element_at(arr, (F.floor(p / 64) + 1).cast("int")).cast("long")
        bit = _one_shifted_by((p % 64).cast("int"))
        pred = pred & (word.bitwiseAND(bit) == bit)
    return probe.isNotNull() & pred
