"""The two-level exact top-k device (used by brute_force_topk,
analytics_hh_turnover, similarity_late_interaction): a per-(key, salt)
local top-k followed by the per-key top-k must equal the single-window
form EXACTLY — any global top-k row is inside its salt's top-k under
the same total order, so the first level only discards rows the second
level could never keep. Stressed with heavy ties (the tie-break column
is where a wrong order spec would bite)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

K = 10
SALTS = 8


def test_two_level_topk_equals_single_window(spark):
    rnd = random.Random(7)
    rows = [
        (q, i, rnd.randint(0, 40))  # 500 rows over 41 scores: many ties
        for q in range(3)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "q int, id int, score int")
    order = [F.col("score").desc(), F.col("id")]
    w_single = Window.partitionBy("q").orderBy(*order)
    single = (
        df.withColumn("r", F.row_number().over(w_single))
        .where(F.col("r") <= K)
        .select("q", "id", "r")
    )
    w_local = Window.partitionBy("q", "salt").orderBy(*order)
    two = (
        df.withColumn("salt", F.pmod(F.col("id"), F.lit(SALTS)))
        .withColumn("r1", F.row_number().over(w_local))
        .where(F.col("r1") <= K)
        .withColumn("r", F.row_number().over(w_single))
        .where(F.col("r") <= K)
        .select("q", "id", "r")
    )
    assert sorted(map(tuple, single.collect())) == sorted(
        map(tuple, two.collect())
    )
    # and the SHARED helper (the form the operators actually call)
    from ssiintegrateddatapipeline_spark.functions.topk import two_level_topk

    helper = two_level_topk(
        df,
        keys=["q"],
        order=[F.col("score").desc(), F.col("id")],
        k=K,
        salt=F.col("id"),
        n_salts=SALTS,
        rank_name="r",
    ).select("q", "id", "r")
    assert sorted(map(tuple, single.collect())) == sorted(
        map(tuple, helper.collect())
    )
