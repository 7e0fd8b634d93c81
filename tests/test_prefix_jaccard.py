"""Prefix-filter set-similarity join: the candidate generator must be
LOSSLESS for J >= t — the prefix-filtered result has to equal the naive
join-on-every-shingle result exactly (SSJoin/PPJoin correctness claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.functions.text_funcs import (
    tokens,
    word_shingles,
)
from ssiintegrateddatapipeline_spark.operators import dedup
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def _brute_force(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text"))))
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_id_a"),
            F.col("y.doc_id").alias("doc_id_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    j = F.round(
        F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
    )
    true_ge_t = F.col("n_common") * dedup.PREFIX_T_DEN >= (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ) * dedup.PREFIX_T_NUM
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .where(true_ge_t)
        .withColumn("jaccard", j)
        .select("doc_id_a", "doc_id_b", "n_common", "jaccard")
    )


def test_prefix_filter_is_lossless(spark, sf_dir):
    got = sorted(
        map(tuple, dedup.prefix_jaccard_pairs(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, _brute_force(spark, sf_dir).collect()))
    assert got == want
    assert len(got) > 0  # threshold must not be vacuous on the corpus


def test_prefix_join_stays_jvm_side(spark, sf_dir):
    df = dedup.prefix_jaccard_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_prefix_filter_lossless_on_random_corpora(spark):
    """Property check decoupled from the testdata corpus: random set
    collections from a small vocabulary (high collision rates), several
    thresholds — the prefix-filtered join must equal the naive
    join-on-every-token result every time."""
    import itertools
    import random

    vocab = [f"w{i}" for i in range(14)]
    for seed, (t_num, t_den) in itertools.product(
        [7, 23], [(1, 2), (1, 3), (3, 4)]
    ):
        rng = random.Random(seed)
        rows = []
        for doc_id in range(40):
            n = rng.randint(3, 10)
            for tok in rng.sample(vocab, n):
                rows.append((doc_id, tok))
        sh = spark.createDataFrame(rows, ["doc_id", "shingle"])
        got = sorted(
            map(
                tuple,
                dedup.prefix_filtered_jaccard(sh, t_num, t_den).collect(),
            )
        )
        # naive: every shared token makes a candidate
        sets = {}
        for d, tok in rows:
            sets.setdefault(d, set()).add(tok)
        want = []
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a] | sets[b])
            if inter * t_den >= union * t_num:
                want.append((a, b, inter, round(inter / union, 6)))
        assert got == sorted(want), (seed, t_num, t_den)
        assert len(want) > 0, "vacuous corpus for this threshold"
