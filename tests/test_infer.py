"""Type inference (`frictionless describe` analog) — operators/infer.py.

The reference is check-only (it validates a descriptor the user already
wrote, src/check_datapackage/check.py); `describe` sits upstream in the
same Frictionless workflow. These tests pin the syntactic inference
semantics and the propose → check round-trip."""

from __future__ import annotations

from check_datapackage_spark.operators.infer import (
    infer_field_types,
    profile_constraints,
    suggest_spec,
)
from check_datapackage_spark.plans.validation import check_table
from check_datapackage_spark.spec import TableSpec


def _fixture(spark):
    rows = [
        # i: ints   f: numbers   b: bools   d: dates  t: datetimes
        # m: mixed  z: all-null  s: strings
        ("1", "1.5", "true", "2024-01-02", "2024-01-02T03:04:05", "1", None, "x"),
        ("-7", "-.5", "False", "1999-12-31", "1999-12-31 23:59:59.123", "a", None, "y"),
        ("+42", "2e10", "TRUE", "2024-02-29", "2024-02-29T00:00:00", "3", None, None),
    ]
    return spark.createDataFrame(
        rows, "i string, f string, b string, d string, t string, m string, z string, s string"
    )


def test_infer_types_per_column(spark):
    out = {
        r["field"]: r
        for r in infer_field_types(_fixture(spark)).collect()
    }
    assert out["i"]["inferred_type"] == "integer"
    assert out["f"]["inferred_type"] == "number"
    assert out["b"]["inferred_type"] == "boolean"
    assert out["d"]["inferred_type"] == "date"
    assert out["t"]["inferred_type"] == "datetime"
    assert out["m"]["inferred_type"] == "string"  # mixed
    assert out["z"]["inferred_type"] == "string"  # all-null → default
    assert out["s"]["inferred_type"] == "string"
    # integers are also numbers (precedence picks integer first)
    assert out["i"]["n_number"] == out["i"]["n_nonnull"] == 3
    assert out["z"]["n_nonnull"] == 0 and out["z"]["n_rows"] == 3
    # a date is NOT a datetime (full-match, not prefix)
    assert out["d"]["n_datetime"] == 0


def test_infer_column_subset_prunes(spark):
    df = _fixture(spark)
    out = infer_field_types(df, ["i", "s"])
    assert [r["field"] for r in out.collect()] == ["i", "s"]
    # only the inspected columns reach the aggregate
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "'m" not in plan and "'t" not in plan


def test_suggest_spec_round_trip(spark):
    df = _fixture(spark)
    d = suggest_spec(df, "probe")
    by_name = {f["name"]: f for f in d["schema"]["fields"]}
    assert by_name["i"]["type"] == "integer"
    # null-free columns proposed required; null-bearing ones not
    assert by_name["i"]["constraints"] == {"required": True}
    assert "constraints" not in by_name["s"]
    assert "constraints" not in by_name["z"]
    # the proposed descriptor is a valid TableSpec and the data it was
    # inferred from passes its own proposed checks
    spec = TableSpec.from_dict(d)
    res = check_table(df, spec)
    assert res.violations.count() == 0


def test_profile_constraints(spark):
    df = _fixture(spark)
    out = {r["field"]: r for r in profile_constraints(df).collect()}
    # low-cardinality → sorted enum proposal; distinct counts exact
    assert out["b"]["suggested_enum"] == "False,TRUE,true"
    assert out["b"]["n_distinct"] == 3 and out["b"]["n_nonnull"] == 3
    # numeric range from regex-guarded casts only
    assert out["i"]["min_num"] == -7.0 and out["i"]["max_num"] == 42.0
    assert out["f"]["min_num"] == -0.5 and out["f"]["max_num"] == 2e10
    # non-numeric strings have NULL range; all-null column absent rows
    assert out["s"]["min_num"] is None
    assert "z" not in out  # all-null column yields no (field, v) pairs
    # the distinct gate: raise the bar and the enum disappears
    tight = {
        r["field"]: r
        for r in profile_constraints(df, enum_max_distinct=2).collect()
    }
    assert tight["b"]["suggested_enum"] is None


def test_suggest_spec_with_constraints(spark):
    df = _fixture(spark)
    d = suggest_spec(df, "probe", with_constraints=True)
    by_name = {f["name"]: f for f in d["schema"]["fields"]}
    assert by_name["i"]["constraints"]["minimum"] == -7.0
    assert by_name["i"]["constraints"]["maximum"] == 42.0
    assert by_name["s"]["constraints"]["enum"] == ["x", "y"]
    # enum only proposed for string-typed fields; bools get none
    assert "enum" not in by_name["b"].get("constraints", {})


def test_infer_arrow_matches_sql_on_edge_strings(spark):
    """r6: the Arrow (RE2) count path must be bit-identical to the JVM
    fused-rlike path - including Java's dollar-before-final-newline
    quirk, emulated in the Arrow patterns."""
    nl = chr(10)
    cr = chr(13)
    rows = [
        ("123",), ("123" + nl,), ("123" + cr + nl,), ("123" + cr,),
        ("12" + nl + "3",), ("1.5e3" + nl,), ("true" + nl,),
        ("2024-01-02" + nl,), ("2024-01-02T03:04:05 ",), (" 123",),
        ("123 ",), ("",), (None,), ("+.5",), ("-0.e2",), ("10",), ("7",),
    ]
    df = spark.createDataFrame(rows, "v string")
    a = infer_field_types(df, ["v"], method="arrow").collect()
    s = infer_field_types(df, ["v"], method="sql").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in s]
