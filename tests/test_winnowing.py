"""Properties of the winnowing fingerprint operator (operators/text.py):
the gap guarantee, agreement with an independent pure-Python
implementation of robust winnowing, and the shared-substring property the
scheme exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators.text import (
    WINNOW_K,
    WINNOW_W,
    _POS_BITS,
    _WIN_B,
    _WIN_M,
    winnowing_fingerprints,
)
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _py_winnow(text: str) -> set[tuple[int, int]]:
    """Independent reference: robust winnowing — per window of W k-gram
    hashes pick the minimum, rightmost on ties; fingerprints = distinct
    (hash, position)."""
    n = len(text) - WINNOW_K + 1
    hs = []
    for p in range(n):
        h = 0
        for ch in text[p : p + WINNOW_K]:
            h = h * _WIN_B + ord(ch)
        hs.append(h % _WIN_M)
    out = set()
    for end in range(WINNOW_W - 1, n):
        window = list(enumerate(hs))[end - WINNOW_W + 1 : end + 1]
        best_pos, best = max(window, key=lambda t: (-t[1], t[0]))
        out.add((best, best_pos + 1))  # 1-based, like the SQL side
    return out


def test_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(8).collect()
    got = {
        r["doc_id"]: r
        for r in winnowing_fingerprints(spark, sf_dir)
        .join(
            spark.createDataFrame([(d["doc_id"],) for d in docs], "doc_id long"),
            "doc_id",
            "left_semi",
        )
        .collect()
    }
    for d in docs:
        fps = _py_winnow(d["text"])
        hashes = [h for h, _ in fps]
        r = got[d["doc_id"]]
        assert r["n_fingerprints"] == len(fps)
        assert r["fp_sum"] == sum(hashes)
        assert r["fp_min"] == min(hashes)
        assert r["fp_max"] == max(hashes)


def test_gap_guarantee(spark, sf_dir):
    """Every window of W consecutive k-grams contains a selected position,
    so consecutive selected positions are at most W apart — the property
    that makes winnowed fingerprints a guaranteed-coverage sample."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    # re-derive the per-doc selected positions via the operator's packing
    codes = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))
    grams = d.where(
        F.length("text") >= WINNOW_K + WINNOW_W - 1
    ).select(
        "doc_id",
        codes.alias("codes"),
        F.explode(F.sequence(F.lit(1), F.length("text") - (WINNOW_K - 1))).alias("p"),
    )
    h = sum(
        F.element_at("codes", F.col("p") + F.lit(j)).cast("long")
        * F.lit(_WIN_B ** (WINNOW_K - 1 - j))
        for j in range(WINNOW_K)
    ) % F.lit(_WIN_M)
    packed = h * F.lit(1 << _POS_BITS) + (F.lit((1 << _POS_BITS) - 1) - F.col("p"))
    w = Window.partitionBy("doc_id").orderBy("p").rowsBetween(-(WINNOW_W - 1), 0)
    sel_pos = (
        grams.select("doc_id", "p", F.min(packed).over(w).alias("wmin"))
        .where(F.col("p") >= WINNOW_W)
        .select(
            "doc_id",
            (F.lit((1 << _POS_BITS) - 1) - F.col("wmin") % (1 << _POS_BITS)).alias(
                "sp"
            ),
        )
        .distinct()
    )
    gap_w = Window.partitionBy("doc_id").orderBy("sp")
    max_gap = (
        sel_pos.select(
            (F.col("sp") - F.lag("sp").over(gap_w)).alias("gap")
        )
        .agg(F.max("gap"))
        .collect()[0][0]
    )
    assert max_gap is not None and max_gap <= WINNOW_W


def test_shared_substring_shares_fingerprint(spark):
    """Two documents sharing a substring of length >= W + K - 1 must share
    at least one fingerprint — the detection guarantee from the paper."""
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "xyzzy plugh " + shared + " 42!"),
        ],
        "doc_id long, text string",
    )
    fps = {1: set(), 2: set()}
    for doc_id, text in df.collect():
        fps[doc_id] = _py_winnow(text)
    assert {h for h, _ in fps[1]} & {h for h, _ in fps[2]}
