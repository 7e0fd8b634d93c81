"""Sinks: partitioned layout, metrics foreachBatch, upsert merge; and the
schema-driven normalize/denormalize struct renames."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ssiintegrateddatapipeline_spark.operators import transform as X
from ssiintegrateddatapipeline_spark.sources import sinks
from ssiintegrateddatapipeline_spark.sources.batch import load_table


def test_write_partitioned_layout_and_pruning(spark, sf_dir, tmp_path):
    env_path = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    sinks.write_partitioned(ev, env_path, partition_cols=("event_type",))
    # one directory per partition value
    dirs = {d for d in os.listdir(env_path) if d.startswith("event_type=")}
    assert len(dirs) == 5
    # a partition predicate must prune to a single partition directory
    back = spark.read.parquet(env_path).where(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == ev.where(F.col("event_type") == "click").count()
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_dynamic_partition_pruning_on_dim_join(spark, sf_dir, tmp_path):
    """Runtime partition pruning (DPP) must fire when a date-partitioned
    fact joins a small dim filtered on a NON-partition attribute — the
    100 TB pattern where the partitions to read are only known at run
    time (fact JOIN dim WHERE dim.attr = x). Static pruning can't help
    (the filter is not on the partition column); Spark's DPP broadcasts
    the dim's join keys into the fact scan as a dynamic PartitionFilter.
    This pins that the session config leaves DPP enabled and the lake
    layout (write_partitioned) is DPP-eligible."""
    path = str(tmp_path / "events_by_date")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    sinks.write_partitioned(ev, path, partition_cols=("event_date",))
    fact = spark.read.parquet(path)
    dates = [r.event_date for r in fact.select("event_date").distinct().collect()]
    dim = spark.createDataFrame(
        [(d, d.isoweekday()) for d in dates], "event_date date, dow int"
    )
    joined = fact.join(dim.where(F.col("dow") == 2), "event_date").groupBy(
        "event_type"
    ).count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result matches the statically-filtered equivalent
    want = {
        (r.event_type, r["count"])
        for r in fact.where(F.dayofweek("event_date") == 3)  # Spark dow: Tue=3
        .groupBy("event_type")
        .count()
        .collect()
    }
    got = {(r.event_type, r["count"]) for r in joined.collect()}
    assert got == want


def test_foreach_batch_metrics_sink(spark, sf_dir, tmp_path):
    from ssiintegrateddatapipeline_spark.streaming import (
        events_stream,
        last_seen_plan,
    )

    metrics_path = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    q = (
        last_seen_plan(events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sinks.foreach_batch_metrics_sink(metrics_path))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(metrics_path)
    assert {"event_type", "last_ts", "seen", "batch_id", "emitted_at"} <= set(out.columns)
    assert out.count() >= 5


def test_credential_store_merge(spark):
    existing = spark.createDataFrame(
        [("did:key:a", "jwt1"), ("did:key:b", "jwt2")], "did string, jwt string"
    )
    updates = spark.createDataFrame(
        [("did:key:b", "jwt2-new"), ("did:key:c", "jwt3")], "did string, jwt string"
    )
    merged = {
        r["did"]: r["jwt"]
        for r in sinks.credential_store_merge(existing, updates).collect()
    }
    assert merged == {"did:key:a": "jwt1", "did:key:b": "jwt2-new", "did:key:c": "jwt3"}


def test_normalize_denormalize_identity(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20).select(
        "doc_id", "lang", X._credential_struct().alias("credential")
    )
    roundtrip = X.denormalize_credential(X.normalize_credential(d))
    assert roundtrip.schema["credential"].dataType == d.schema["credential"].dataType
    a = sorted(map(tuple, d.select("doc_id", "credential").collect()))
    b = sorted(map(tuple, roundtrip.select("doc_id", "credential").collect()))
    assert a == b


def test_normalized_field_name_changes(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(5).select(
        "doc_id", "lang", X._credential_struct().alias("credential")
    )
    names = [f.name for f in d.schema["credential"].dataType.fields]
    assert "@context" in names
    norm = X.normalize_credential(d)
    norm_names = [f.name for f in norm.schema["credential"].dataType.fields]
    assert "context" in norm_names and "@context" not in norm_names


def test_renames_derived_from_schema_catalog(spark):
    """The alias map recorded by the .avsc compiler drives the rename."""
    from ssiintegrateddatapipeline_spark.schemas import SchemaCatalog
    from ssiintegrateddatapipeline_spark.schemas.avsc import alias_renames

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "avro")
    cat = SchemaCatalog.from_dir(fx)
    cred = cat.compile("io.malmike.trades.TradeCredentialRef")
    renames = alias_renames(cred)  # {"@context": "context"}
    df = spark.createDataFrame(
        [(1,)], "id long"
    ).withColumn("c", F.struct(F.lit("x").alias("@context"), F.lit("y").alias("other")))
    out = df.withColumn("c", X.rename_struct_fields(F.col("c"), renames))
    fields = [f.name for f in out.schema["c"].dataType.fields]
    assert fields == ["other", "context"]


def test_format_roundtrips_csv_json_orc(spark, sf_dir, tmp_path):
    """Interchange formats: the engine must read back its own CSV/JSON/ORC
    writes losslessly (CSV needs explicit schema + timestamp format; JSON
    and ORC carry types themselves). Parquet is the primary format and is
    exercised everywhere else."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    expected = sorted(map(tuple, ev.collect()))

    orc_path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(orc_path)
    assert sorted(map(tuple, spark.read.orc(orc_path).collect())) == expected

    json_path = str(tmp_path / "events_json")
    ev.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).json(json_path)
    back_json = (
        spark.read.schema(ev.schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(json_path)
    )
    assert sorted(map(tuple, back_json.collect())) == expected

    csv_path = str(tmp_path / "events_csv")
    ev.write.mode("overwrite").option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).csv(csv_path)
    back_csv = (
        spark.read.schema(ev.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(csv_path)
    )
    assert sorted(map(tuple, back_csv.collect())) == expected


def test_compact_files_reduces_file_count(spark, sf_dir, tmp_path):
    """64 tiny files -> the row-budget file count, same rows, and the
    range-sort leaves each output file a disjoint user_id range (the
    min/max-stats property that makes post-compaction scans skippable)."""
    import pyarrow.parquet as pq
    import os

    path = str(tmp_path / "shredded")
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    ev.repartition(64).write.parquet(path)
    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) == 64

    n_files = sinks.compact_files(spark, path, target_rows_per_file=(n + 3) // 4,
                                  order_by=("user_id",))
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n_files == 4
    back = spark.read.parquet(path)
    assert back.count() == n

    # disjoint user_id ranges across files (row-group stats are selective)
    ranges = []
    for f in files:
        md = pq.read_metadata(os.path.join(path, f))
        cols = {md.schema.column(j).name: j for j in range(md.num_columns)}
        uid = cols["user_id"]
        stats = [md.row_group(i).column(uid).statistics for i in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """A lake accretes columns over time: files written before a column
    existed must still read alongside new files, with nulls backfilled —
    `mergeSchema` is the read-side contract for schema evolution."""
    from ssiintegrateddatapipeline_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events").limit(50)
    path = str(tmp_path / "evolved")
    ev.select("event_id", "user_id").write.parquet(f"{path}/batch=1")
    ev.select("event_id", "user_id", "value").write.parquet(f"{path}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"event_id", "user_id", "value", "batch"}
    old_rows = merged.where(F.col("batch") == 1)
    assert old_rows.count() == 50
    # the column born later is null for pre-existing files, never dropped
    assert old_rows.where(F.col("value").isNull()).count() == 50
    assert merged.where(F.col("batch") == 2).where(
        F.col("value").isNotNull()
    ).count() == 50


def test_host_did_web_documents_layout(spark, tmp_path):
    import json

    from ssiintegrateddatapipeline_spark.functions import crypto
    from ssiintegrateddatapipeline_spark.sources.sinks import host_did_web_documents

    manifest = {r.did: r.path for r in host_did_web_documents(spark, str(tmp_path)).collect()}
    assert len(manifest) == 5
    for did, path in manifest.items():
        doc = json.loads(open(path).read())
        assert doc["id"] == did
        vm = doc["verificationMethod"][0]
        # did:web keys are WebDIDProvider-minted Secp256k1 — the hosted
        # document must declare the type the ES256K tokens verify against
        assert vm["type"] == "EcdsaSecp256k1VerificationKey2019"
        assert len(bytes.fromhex(vm["publicKeyHex"])) == 33
        # on-disk layout mirrors the resolution URL path exactly
        url = crypto.did_web_document_url(did)
        rel_url = url.split("/", 3)[3]          # path after host
        rel_fs = path[len(str(tmp_path)) + 1:]  # path after root
        assert rel_url == rel_fs
