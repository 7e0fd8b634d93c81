"""Custom Python DataSource: partitioned batch generation, offset-tracked
streaming, and the ingest projection (rename map, type filter, default-fill)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.sources import trade_feed as TF


def test_batch_read_is_partitioned(spark):
    TF.register(spark)
    raw = (
        spark.read.format("trade_feed")
        .option("n", 400)
        .option("numPartitions", 8)
        .load()
    )
    assert raw.rdd.getNumPartitions() == 8
    assert raw.count() == 400


def test_ping_frames_filtered_and_defaults_filled(spark):
    out = TF.feed_ingest(spark, "")
    n_pings = len(range(0, TF.FEED_N, TF.PING_EVERY))
    assert out.count() == TF.FEED_N - n_pings
    # default-fill: null condition lists became empty arrays
    assert out.where(F.col("trade_condition").isNull()).count() == 0
    assert out.where(F.size("trade_condition") == 0).count() > 0


def test_generator_is_deterministic():
    assert TF.gen_frame(5) == TF.gen_frame(5)
    assert TF.gen_frame(0)[0] == "ping"
    assert TF.gen_frame(1)[0] == "trade"


def test_stream_equals_batch(spark):
    got = sorted(map(tuple, TF.feed_ingest_streaming(spark, "").collect()))
    want = sorted(map(tuple, TF.feed_ingest(spark, "").collect()))
    assert got == want


def test_stream_progresses_in_micro_batches(spark):
    """The offset must advance in rows_per_batch steps — real multi-batch
    progression, not a single snapshot."""
    reader = TF._TradeFeedStreamReader({"n": "1000", "rowsperbatch": "300"})
    assert reader.initialOffset() == {"index": 0}
    offsets = [reader.latestOffset()["index"] for _ in range(5)]
    assert offsets == [300, 600, 900, 1000, 1000]
    parts = reader.partitions({"index": 300}, {"index": 600})
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 300 and covered[-1][1] == 600


def test_gap_monitor_finds_exactly_the_ping_holes(spark):
    """Every dropped keepalive slot (except slot 0, which has no
    predecessor for its symbol) is a 2500 ms hole in a 1250 ms cadence."""
    gaps = TF.trade_silence_gaps(spark, "").collect()
    n_pings = len(range(0, TF.FEED_N, TF.PING_EVERY))
    assert len(gaps) == n_pings - 1 == TF._expected_gap_count()
    assert all(g.gap_ms == 2500 for g in gaps)


def test_streaming_gaps_equal_batch_twin(spark):
    """The per-symbol last-seen state must reconstruct the batch lag window
    exactly across micro-batch boundaries."""
    got = sorted(map(tuple, TF.streaming_trade_gaps(spark, "").collect()))
    want = sorted(map(tuple, TF.trade_silence_gaps(spark, "").collect()))
    assert got == want


def test_streaming_realized_vol_equals_batch_twin(spark):
    """The per-symbol (last price, n, sum-of-squares) state must extend the
    delta ledger across micro-batch boundaries exactly like the batch lag
    window."""
    got = sorted(map(tuple, TF.streaming_trade_realized_vol(spark, "").collect()))
    want = sorted(map(tuple, TF.trade_realized_vol(spark, "").collect()))
    assert got == want
