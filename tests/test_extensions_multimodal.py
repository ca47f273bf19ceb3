"""Extensions (U1-U3), multimodal plumbing, audit/resume, streaming."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from check_datapackage_spark import TableSpec, check_table
from check_datapackage_spark.extensions import (
    CustomCheck,
    ExtensionError,
    RequiredCheck,
    compile_extensions,
)
from check_datapackage_spark.fixtures import sequences_df, sequences_spec
from check_datapackage_spark.operators import audit, multimodal


# --- extensions --------------------------------------------------------------


def test_custom_check_pandas_udf(spark):
    df = sequences_df(spark, 100).drop("_row")
    even = CustomCheck(
        type="even-doc",
        message="doc number must be even",
        column="doc_id",
        check=lambda s: s.str[-1].astype(int) % 2 == 0,
    )
    res = check_table(df, sequences_spec(), extra_checks=compile_extensions([even]))
    v = res.violations.where(F.col("type") == "even-doc")
    assert v.count() == 50  # half the rows have odd last digit


def test_custom_check_required_type_forbidden():
    # ref extensions.py:61-69
    with pytest.raises(ExtensionError):
        CustomCheck(type="required", message="m", column="c", check=lambda s: s)


def test_required_check_extension(spark):
    df = sequences_df(spark, 100).drop("_row").withColumn(
        "maybe", F.when(F.col("n_tok") % 2 == 0, F.lit("x"))
    )
    spec = TableSpec.from_dict(
        {"name": "t", "schema": {"fields": [{"name": "maybe", "type": "string"}]}}
    )
    req = RequiredCheck(column="maybe")
    res = check_table(df, spec, extra_checks=compile_extensions([req]))
    n_null = df.where(F.col("maybe").isNull()).count()
    assert res.violations.where(F.col("type") == "required").count() == n_null > 0


# --- multimodal ---------------------------------------------------------------


@pytest.fixture(scope="module")
def assets(spark):
    return multimodal.synth_assets(spark, 60).cache()


def test_asset_checks_pass_on_valid(spark, assets):
    from check_datapackage_spark.plans.validation import violations_plan

    checks = multimodal.asset_checks()
    v = violations_plan(assets, checks, "assets", row_key="doc_id")
    assert v.count() == 0


def test_asset_checks_catch_bad_media_type(spark, assets):
    from check_datapackage_spark.plans.validation import violations_plan

    bad = assets.withColumn(
        "meta",
        F.when(
            F.col("doc_id") == "doc-000003",
            F.named_struct(
                F.lit("media_type"), F.lit("video/mp4"),
                F.lit("width"), F.col("meta.width"),
                F.lit("height"), F.col("meta.height"),
                F.lit("n_channels"), F.col("meta.n_channels"),
                F.lit("duration_ms"), F.col("meta.duration_ms"),
                F.lit("sample_rate"), F.col("meta.sample_rate"),
            ),
        ).otherwise(F.col("meta")),
    )
    checks = multimodal.asset_checks()
    v = violations_plan(bad, checks, "assets", row_key="doc_id").collect()
    assert len(v) == 1
    assert v[0]["type"] == "enum" and v[0]["row_key"] == "doc-000003"


def test_extract_features_deterministic(spark, assets):
    out1 = multimodal.extract_features(assets).orderBy("doc_id").collect()
    out2 = multimodal.extract_features(assets).orderBy("doc_id").collect()
    assert [r["sha1"] for r in out1] == [r["sha1"] for r in out2]
    assert all(len(r["features"]) == 16 for r in out1)
    # payload = 12-byte id × 7 = 84 bytes (capped at 100)
    assert all(r["byte_len"] == 84 for r in out1)


def test_frame_sample_plan(spark, assets):
    fs = multimodal.frame_sample_plan(assets, n_frames=4)
    assert fs.count() == 60 * 4
    assert fs.groupBy("doc_id").count().where("count != 4").count() == 0


# --- audit / resume -----------------------------------------------------------


def test_resumable_run_skips_completed(spark):
    tmp = tempfile.mkdtemp()
    try:
        ledger = f"{tmp}/ledger"
        df = sequences_df(spark, 400).drop("_row")

        def validate(pending):
            # trivial validator: rows with n_tok > 2000 are violations
            v = pending.where(F.col("n_tok") > 2000).select(
                F.lit("x").alias("jsonpath"),
                F.lit("maximum").alias("type"),
                F.lit("m").alias("message"),
                F.col("n_tok").cast("string").alias("instance"),
                F.lit("c").alias("check"),
                F.lit("n_tok").alias("column"),
                F.col("doc_id").alias("row_key"),
                F.col("source").alias("partition"),
            )
            return v, None

        run = audit.ResumableRun(ledger_path=ledger, n_buckets=8)
        v1, n1 = run.run(df, validate, run_id="r1")
        assert n1 > 0
        # second run: everything completed → nothing pending
        v2, n2 = run.run(df, validate, run_id="r2")
        assert n2 == 0 and v2 is None
        led = spark.read.parquet(ledger)
        assert led.where("run_id = 'r1'").count() == n1
        # ledger n_rows covers the whole table exactly once
        assert led.agg(F.sum("n_rows")).collect()[0][0] == 400
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_resume_processes_only_missing_units(spark):
    tmp = tempfile.mkdtemp()
    try:
        ledger = f"{tmp}/ledger"
        df = audit.with_bucket(sequences_df(spark, 400).drop("_row"), n_buckets=8)
        units = audit.plan_units(df)
        # pretend 3 units were done in a prior run
        done = units.limit(3).select(
            F.lit("r0").alias("run_id"),
            "source",
            F.col("_bucket").alias("bucket"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(0).cast("long").alias("n_violations"),
            F.lit(True).alias("passed"),
            F.lit(0).cast("long").alias("completed_at_ms"),
        )
        done.write.mode("overwrite").parquet(ledger)
        pend = audit.pending_units(df, spark, ledger)
        assert pend.count() == units.count() - 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- streaming ----------------------------------------------------------------


def test_streaming_violations_memory_sink(spark, tmp_path):
    """Drive the stateless fused checks through a real streaming query."""
    from check_datapackage_spark.compile import compile_table_checks
    from check_datapackage_spark.streaming.checks import streaming_violations

    src = str(tmp_path / "in")
    df, _ = __import__(
        "check_datapackage_spark.fixtures", fromlist=["sequences_with_violations"]
    ).sequences_with_violations(spark, 200)
    df.drop("_row").write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    checks = compile_table_checks(sequences_spec(), schema=schema)
    v = streaming_violations(stream, checks, "sequences", row_key="doc_id")
    q = (
        v.writeStream.format("memory")
        .queryName("viol")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM viol").collect()
    finally:
        q.stop()
    types = {r["type"] for r in rows}
    assert {"required", "pattern", "minimum", "maximum"} <= types
