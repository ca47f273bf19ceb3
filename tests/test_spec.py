"""Spec model + driver-side spec validation tests (no Spark needed).

Mirrors the reference's spec-structural tests
(/root/reference/tests/test_check.py:130-199, 831-994): PK/FK field
existence, arity, string-or-list normalization, unknown field type.
"""

from __future__ import annotations

import pytest

from check_datapackage_spark import (
    FIELD_TYPES,
    FieldSpec,
    Issue,
    TableSpec,
    finalize_issues,
    validate_spec,
    validate_spec_against,
)
from check_datapackage_spark.issue import MISSING, MissingValue, explain


def make_spec(**schema_overrides):
    schema = {
        "fields": [
            {"name": "doc_id", "type": "string"},
            {"name": "n_tok", "type": "integer"},
        ],
        "primaryKey": "doc_id",
    }
    schema.update(schema_overrides)
    return TableSpec.from_dict({"name": "t", "schema": schema})


def test_valid_spec_has_no_issues():
    assert validate_spec(make_spec()) == []


def test_string_or_list_primary_key():
    # ref check.py:390-400 — "doc_id" and ["doc_id"] are equivalent
    assert make_spec(primaryKey="doc_id").primary_key == ("doc_id",)
    assert make_spec(primaryKey=["doc_id"]).primary_key == ("doc_id",)


def test_unknown_pk_field_flagged():
    # ref _check_primary_key check.py:340-358; test_check.py:130-181
    issues = validate_spec(make_spec(primaryKey="nope"))
    assert len(issues) == 1
    assert issues[0].type == "primary-key"
    assert issues[0].jsonpath == "$.t.schema.primaryKey"
    assert "nope" in issues[0].message


def test_empty_string_pk_field_flagged():
    # ref: "" is flagged too (check.py:403-410)
    issues = validate_spec(make_spec(primaryKey=""))
    assert issues and issues[0].type == "primary-key"


def test_unknown_field_type_single_enum_issue():
    # ref check.py:683-725: unknown type → ONE enum issue on .type
    spec = make_spec(fields=[{"name": "x", "type": "wat"}], primaryKey=[])
    issues = validate_spec(spec)
    assert len(issues) == 1
    assert issues[0].type == "enum"
    assert issues[0].jsonpath == "$.t.schema.fields[0].type"


def test_default_type_is_string():
    # ref check.py:698
    spec = make_spec(fields=[{"name": "x"}], primaryKey=[])
    assert spec.fields[0].type == "string"
    assert validate_spec(spec) == []


def test_fk_source_fields_must_exist():
    # ref _check_fk_source_fields check.py:417-432
    spec = make_spec(
        foreignKeys=[{"fields": "ghost", "reference": {"resource": "d", "fields": "k"}}]
    )
    issues = validate_spec(spec)
    assert any(i.type == "foreign-key-source-fields" for i in issues)
    assert issues[0].jsonpath == "$.t.schema.foreignKeys[0].fields"


def test_fk_arity_mismatch():
    # ref check.py:434-446
    spec = make_spec(
        foreignKeys=[
            {
                "fields": ["doc_id", "n_tok"],
                "reference": {"resource": "d", "fields": "k"},
            }
        ]
    )
    issues = validate_spec(spec)
    assert any(
        i.type == "foreign-key-source-fields" and "number of fields" in i.message
        for i in issues
    )


def test_fk_self_referential_dest_fields():
    # ref _check_fk_dest_fields_same_resource check.py:450-471:
    # empty reference.resource means same-resource
    spec = make_spec(
        foreignKeys=[{"fields": "doc_id", "reference": {"resource": "", "fields": "ghost"}}]
    )
    issues = validate_spec(spec)
    assert any(i.type == "foreign-key-destination-fields" for i in issues)


def test_fk_missing_dest_resource():
    # ref check.py:474-513 → foreign-key-destination-resource
    spec = make_spec(
        foreignKeys=[{"fields": "doc_id", "reference": {"resource": "ghost", "fields": "k"}}]
    )
    issues = validate_spec_against(spec, {})
    assert len(issues) == 1
    assert issues[0].type == "foreign-key-destination-resource"


def test_fk_missing_dest_fields_cross_resource():
    spec = make_spec(
        foreignKeys=[{"fields": "doc_id", "reference": {"resource": "dim", "fields": "nope"}}]
    )
    dim = TableSpec(name="dim", fields=(FieldSpec(name="k"),))
    issues = validate_spec_against(spec, {"dim": dim})
    assert len(issues) == 1
    assert issues[0].type == "foreign-key-destination-fields"


def test_mixed_type_enum_values():
    # ref _handle_…_constraints_enum check.py:728-783 exact message.
    # The grouped "same type" message arises on oneOf-alternative types
    # (number admits strings OR numbers, never a mix) — a plain string
    # field gets the raw per-item jsonschema error instead (see
    # test_enum_simple_wrong_member_type).
    spec = make_spec(
        fields=[{"name": "x", "type": "number", "constraints": {"enum": ["a", 1]}}], primaryKey=[]
    )
    issues = validate_spec(spec)
    assert any(i.message == "All enum values must be the same type." for i in issues)


def test_constraint_applicability():
    # pattern on integer → spec issue (SURVEY §1.4 vocabulary)
    spec = make_spec(
        fields=[{"name": "x", "type": "integer", "constraints": {"pattern": "a+"}}], primaryKey=[]
    )
    assert any("pattern" in i.jsonpath for i in validate_spec(spec))


def test_issue_equality_excludes_instance():
    # ref issue.py:52 — instance excluded from eq/hash
    a = Issue("$.x", "required", "m", instance="A")
    b = Issue("$.x", "required", "m", instance="B")
    assert a == b
    assert len({a, b}) == 1


def test_finalize_issues_dedup_and_order():
    # ref check.py:279 sorted(set(...))
    a = Issue("$.b", "type", "m2")
    b = Issue("$.a", "required", "m1")
    c = Issue("$.a", "required", "m1", instance="dup")
    assert finalize_issues([a, b, c]) == [b, a]


def test_missing_singleton():
    # ref issue.py:5-17
    assert MissingValue() is MISSING
    assert repr(MISSING) == "<MISSING>"


def test_explain_renders():
    out = explain([Issue("$.a", "required", "a is required", instance=MISSING)])
    # exact reference rendering (ref check.py:205-233,
    # tests/test_check.py:583-597): singular header, parent-path
    # display, '| prop: value' snippet, caret underline sized to value
    assert "1 issue was found" in out
    assert "At top level:" in out
    assert "| a: <MISSING>" in out
    assert f"[red]{'^' * len('<MISSING>')}[/red]" in out
    assert "a is required" in out


def test_explain_nested_at_parent_path():
    out = explain(
        [Issue("$.orders[5].status", "enum", "bad value", instance="Z")]
    )
    assert "At orders[5]:" in out
    assert "| status: Z" in out
    assert "At orders[5].status:" not in out
    assert "[red]^[/red]" in out


def test_explain_plural_header():
    issues = [
        Issue("$.a", "required", "m1", instance=MISSING),
        Issue("$.b", "required", "m2", instance=MISSING),
    ]
    assert "2 issues were found" in explain(issues)


def test_pretty_print_strips_markup_without_rich(capsys):
    from check_datapackage_spark.issue import pretty_print

    pretty_print("x [red]^^[/red] [u]data[/u]")
    got = capsys.readouterr().out
    assert "[red]" not in got or "^^" in got


def test_field_types_list_matches_reference():
    # ref constants.py:12-28 — exactly these 15, in this order
    assert FIELD_TYPES == [
        "string", "number", "integer", "date", "time", "datetime",
        "year", "yearmonth", "boolean", "object", "geopoint", "geojson",
        "array", "duration", "any",
    ]


def test_config_version_validates():
    # ref config.py:53 Literal["v1","v2"]
    from check_datapackage_spark.spec import CheckConfig

    assert CheckConfig(version="v1").version == "v1"
    with pytest.raises(ValueError):
        CheckConfig(version="v3")


def test_v1_flags_unique_keys():
    from check_datapackage_spark.spec import TableSpec, validate_spec

    spec = TableSpec.from_dict(
        {"name": "t", "schema": {"fields": [{"name": "a"}], "uniqueKeys": [["a"]]}}
    )
    assert validate_spec(spec, version="v2") == []
    v1 = validate_spec(spec, version="v1")
    assert len(v1) == 1 and v1[0].type == "additionalProperties"
    assert v1[0].jsonpath == "$.t.schema.uniqueKeys"


def test_remote_spec_refused_without_flag(tmp_path):
    from check_datapackage_spark.sources.registry import read_spec

    with pytest.raises(NotImplementedError, match="allow_remote"):
        read_spec("https://example.com/datapackage.json")
    # gh: resolution goes through the same gate
    with pytest.raises(NotImplementedError, match="allow_remote"):
        read_spec("gh:org/repo@1.0.0")


# --- golden example specs (ref examples.py:5-72) ----------------------------


def test_golden_example_all_pass(spark):
    """The exported golden fixture is the canonical all-pass base:
    zero spec issues, zero violations (ref examples.py's role as the
    mutate-from-valid seed for the whole test style)."""
    from check_datapackage_spark import (
        check_table,
        example_table,
        example_table_spec,
        validate_spec,
    )

    spec = example_table_spec()
    assert validate_spec(spec) == []
    res = check_table(example_table(spark), spec)
    assert res.spec_issues == []
    assert res.violations.count() == 0
    assert res.passed()


def test_golden_example_mutate_from_valid(spark):
    """Mutating ONE value in the golden table yields exactly that
    violation — the reference's test idiom on our fixture."""
    from pyspark.sql import functions as F

    from check_datapackage_spark import (
        check_table,
        example_table,
        example_table_spec,
    )

    bad = example_table(spark).withColumn(
        "eye_colour",
        F.when(F.col("id") == 2, F.lit("purple")).otherwise(F.col("eye_colour")),
    )
    rows = check_table(bad, example_table_spec()).violations.collect()
    assert len(rows) == 1
    assert rows[0]["type"] == "enum"
    assert rows[0]["column"] == "eye_colour"
    assert rows[0]["row_key"] == "2"


def test_golden_example_properties_shapes():
    from check_datapackage_spark import (
        example_field_properties,
        example_table_properties,
    )

    f = example_field_properties()
    t = example_table_properties()
    assert f["name"] == "eye_colour" and "constraints" in f
    assert t["schema"]["fields"][1] == f
    assert t["schema"]["primaryKey"] == ["id"]


def test_explain_subject_wording():
    """Spec-level reports use the reference's exact header wording
    (check.py:212 'datapackage.json'); data-plane reports say 'data' —
    the single deliberate divergence, decided per VERDICT r2."""
    from check_datapackage_spark.issue import MISSING, Issue, explain

    issues = [Issue("$.a", "required", "a is required", instance=MISSING)]
    assert "found in your [u]data[/u]" in explain(issues)
    assert "found in your [u]datapackage.json[/u]" in explain(
        issues, subject="datapackage.json"
    )


# --- enum constraint spec validation (ref test_check.py:758-831) ------------


def _enum_issues(ftype, enum):
    from check_datapackage_spark.spec import TableSpec, validate_spec

    spec = TableSpec.from_dict(
        {
            "name": "t",
            "schema": {
                "fields": [
                    {"name": "a", "type": ftype, "constraints": {"enum": enum}}
                ]
            },
        }
    )
    return validate_spec(spec)


def test_enum_non_unique_values():
    """ref test_fail_field_with_non_unique_enum_values."""
    issues = _enum_issues("number", [1, 1])
    assert len(issues) == 1
    assert issues[0].type == "uniqueItems"
    assert issues[0].jsonpath == "$.t.schema.fields[0].constraints.enum"


def test_enum_simple_wrong_member_type():
    """ref test_fail_simple_field_with_bad_enum_constraint: default
    string field expects string members — raw per-item error at [i]."""
    issues = _enum_issues("string", [1])
    assert len(issues) == 1
    assert issues[0].type == "type"
    assert issues[0].jsonpath == "$.t.schema.fields[0].constraints.enum[0]"
    assert issues[0].message == "1 is not of type 'string'"


def test_enum_complex_wrong_member_type():
    """ref test_fail_complex_field_with_bad_enum_constraint: number
    field admits string-or-number members; an object fits neither."""
    issues = _enum_issues("number", [{}])
    assert len(issues) == 1
    assert issues[0].type == "type"
    assert issues[0].jsonpath == "$.t.schema.fields[0].constraints.enum"
    assert issues[0].message == (
        "The enum value type is not correct. Enum values should be one "
        "of string, number."
    )


def test_enum_mixed_member_types():
    """ref test_fail_field_with_mixed_type_enum_constraint."""
    issues = _enum_issues("geopoint", [{}, [], "string", 1])
    assert len(issues) == 1
    assert issues[0].type == "type"
    assert issues[0].message == "All enum values must be the same type."


def test_enum_valid_shapes_pass():
    # number admits all-ints, all-floats, int+float mix, or all-strings
    assert _enum_issues("number", [1, 2.5]) == []
    assert _enum_issues("number", ["a", "b"]) == []
    # integer admits ints or strings, not floats
    assert len(_enum_issues("integer", [1.5])) == 1
    # bools are never integers (Python bool ⊂ int trap)
    assert len(_enum_issues("integer", [True])) == 1
    # any: unrestricted
    assert _enum_issues("any", [{}, 1, "x"]) == []


def test_enum_empty_is_min_items():
    issues = _enum_issues("string", [])
    assert len(issues) == 1 and issues[0].type == "minItems"
