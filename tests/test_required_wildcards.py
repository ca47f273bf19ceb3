"""RequiredCheck jsonpath-target derivation + full strict mode.

Mirrors ref tests/test_extensions.py:120-240 (wildcard, array wildcard,
union, non-final recursive descent, ValueError matrix) and
tests/test_check.py:446-496 (strict-mode rule set)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from check_datapackage_spark import TableSpec, check_table
from check_datapackage_spark.extensions import (
    ExtensionError,
    RequiredCheck,
    compile_extensions,
)
from check_datapackage_spark.plans.validation import violations_plan


@pytest.fixture(scope="module")
def nested_df(spark):
    """Rows with struct + array<struct> columns for target derivation."""
    rows = [
        # id, meta(id,title), contributors[(name,title)], licenses[(name)]
        (1, ("m1", "t1"), [("alice", "Dr")], [("mit",)]),
        (2, ("m2", None), [(None, "Mx"), ("bob", None)], [("gpl",)]),
        (3, (None, "t3"), None, None),
        (4, None, [], [(None,)]),
    ]
    schema = (
        "id int, meta struct<id:string,title:string>, "
        "contributors array<struct<name:string,title:string>>, "
        "licenses array<struct<name:string>>"
    )
    return spark.createDataFrame(rows, schema).cache()


def run_checks(df, checks):
    return violations_plan(df, checks, "t", row_key="id").collect()


def keys(rows):
    return {(r["row_key"], r["check"]) for r in rows}


def test_wildcard_struct_targets(spark, nested_df):
    """$.*.id — every top-level struct column must have non-null id
    (ref test_required_check_wildcard)."""
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.*.id", message="All fields must have an id.")],
        schema=nested_df.schema,
    )
    # only meta is a struct with an id child; arrays have no id child
    assert [c.name for c in checks] == ["meta.id.required.ext"]
    rows = run_checks(nested_df, checks)
    # row 3 has meta.id null; row 4 has meta null (matches nothing)
    assert keys(rows) == {("3", "meta.id.required.ext")}


def test_array_wildcard_per_item(spark, nested_df):
    """$.contributors[*].name — per-item requirement via forall
    (ref test_required_check_array_wildcard)."""
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.contributors[*].name")],
        schema=nested_df.schema,
    )
    rows = run_checks(nested_df, checks)
    # row 2: first item name null → violation; rows 3 (null) and 4
    # (empty) match nothing
    assert keys(rows) == {("2", "contributors[*].name.required.ext")}


def test_index_targets_guard_null_and_short_arrays(spark, nested_df):
    """$.contributors[1].name — rows whose parent array is null or too
    short match nothing ⇒ no-op (ref: unmatched paths), and no ANSI
    INVALID_ARRAY_INDEX is raised for the short rows (ADVICE r2: the
    old getItem path threw under Spark 4 ANSI)."""
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.contributors[1].name")],
        schema=nested_df.schema,
    )
    rows = run_checks(nested_df, checks)
    # row 1 has only 1 contributor (short), row 3 null, row 4 empty —
    # all unmatched; row 2's second item has name "bob" → pass.
    assert keys(rows) == set()

    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.contributors[1].title")],
        schema=nested_df.schema,
    )
    rows = run_checks(nested_df, checks)
    # row 2 item[1] = ("bob", None): title null → violation
    assert keys(rows) == {("2", "contributors[1].title.required.ext")}


def test_negative_index_counts_from_end(spark, nested_df):
    """$.contributors[-1].name — jsonpath negative index = from the
    end (Spark element_at semantics, not getItem(-1)≡NULL)."""
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.contributors[-1].name")],
        schema=nested_df.schema,
    )
    rows = run_checks(nested_df, checks)
    # last items: row1 ("alice","Dr") pass, row2 ("bob",None) pass on
    # name; rows 3/4 unmatched
    assert keys(rows) == set()

    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.contributors[-2].name")],
        schema=nested_df.schema,
    )
    rows = run_checks(nested_df, checks)
    # row 2 item[-2] = (None, "Mx") → name null → violation; row 1 has
    # only one item → unmatched
    assert keys(rows) == {("2", "contributors[-2].name.required.ext")}


def test_index_leaf_target_rejected(spark):
    """$.licenses[0] — a path ending in an index (no name selector) is
    rejected at construction, same ValueError parity as ends-in-[*]."""
    with pytest.raises(ValueError):
        RequiredCheck(jsonpath="$.licenses[0]")


def test_union_selectors_and_paths(spark, nested_df):
    got = compile_extensions(
        [RequiredCheck(jsonpath="$.meta['id','title'] | $.id")],
        schema=nested_df.schema,
    )
    assert sorted(c.name for c in got) == [
        "id.required.ext",
        "meta.id.required.ext",
        "meta.title.required.ext",
    ]
    rows = run_checks(nested_df, got)
    assert keys(rows) == {
        ("2", "meta.title.required.ext"),
        ("3", "meta.id.required.ext"),
    }


def test_recursive_descent_non_final(spark, nested_df):
    """$..contributors[*].name — descent locates the named node
    anywhere in the schema tree, then the rest of the path applies
    (ref test_required_check_non_final_recursive_descent; descent-FINAL
    paths raise, covered in the bad-path matrix below)."""
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$..contributors[*].name")],
        schema=nested_df.schema,
    )
    assert sorted(c.name for c in checks) == [
        "contributors[*].name.required.ext",
    ]
    rows = run_checks(nested_df, checks)
    assert keys(rows) == {("2", "contributors[*].name.required.ext")}


def test_recursive_descent_finds_nested_nodes(spark):
    """Descent reaches the same-named node at several depths."""
    df = spark.createDataFrame(
        [(1, [("mit",)], (("gpl",), "x")), (2, [(None,)], ((None,), "y"))],
        "id int, licenses array<struct<name:string>>, "
        "res struct<licenses:struct<name:string>,other:string>",
    )
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$..licenses.name")], schema=df.schema
    )
    assert sorted(c.name for c in checks) == [
        "licenses[*].name.required.ext",
        "res.licenses.name.required.ext",
    ]
    rows = run_checks(df, checks)
    assert keys(rows) == {
        ("2", "licenses[*].name.required.ext"),
        ("2", "res.licenses.name.required.ext"),
    }


@pytest.mark.parametrize(
    "bad",
    [
        "<><>bad.path",
        "..*",
        "$..path",
        "..resources",
        "$.resources[0].*",
        "$.resources[*]",
        "$.no & $.intersection",
        "$.no & $.intersection | $.operator",
    ],
)
def test_bad_paths_raise_at_construction(bad):
    """ValueError parity with ref
    test_required_check_cannot_apply_to_bad_or_ambiguous_path."""
    with pytest.raises(ValueError):
        RequiredCheck(jsonpath=bad, message="should fail")


def test_root_path_matches_nothing(spark, nested_df):
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$")], schema=nested_df.schema
    )
    assert checks == []


def test_exactly_one_of_column_jsonpath():
    with pytest.raises(ExtensionError):
        RequiredCheck()
    with pytest.raises(ExtensionError):
        RequiredCheck(column="a", jsonpath="$.a")


def test_unmatched_name_is_noop(spark, nested_df):
    checks = compile_extensions(
        [RequiredCheck(jsonpath="$.nonexistent.field")],
        schema=nested_df.schema,
    )
    assert checks == []


def test_jsonpath_targets_through_check_table(spark, nested_df):
    """End-to-end: jsonpath RequiredChecks ride extra_checks through
    check_table, root-column runnability filter included."""
    spec = TableSpec.from_dict({"name": "t", "schema": {"primaryKey": ["id"]}})
    extra = compile_extensions(
        [RequiredCheck(jsonpath="$.meta.id")], schema=nested_df.schema
    )
    res = check_table(nested_df, spec, extra_checks=extra)
    rows = res.violations.collect()
    assert {r["row_key"] for r in rows} == {"3"}


# --- strict mode (full reference rule set) ----------------------------------


def _strict_spec(fields):
    from check_datapackage_spark.cli import strictify

    return strictify(
        TableSpec.from_dict({"name": "pkg", "schema": {"fields": fields}})
    )


def test_strict_version_semver(spark):
    df = spark.createDataFrame(
        [(1, "1.2.3"), (2, "1.2.3-alpha.1+build.5"), (3, "v1.2"), (4, "1.2")],
        "id int, version string",
    )
    spec = _strict_spec([{"name": "version", "type": "string"}])
    res = check_table(df, spec)
    rows = res.violations.collect()
    bad = {r["instance"] for r in rows if r["type"] == "pattern"}
    assert bad == {"v1.2", "1.2"}


def test_strict_contributors_sources_item_title(spark):
    df = spark.createDataFrame(
        [
            (1, [("a", "T")], '[{"title": "S"}]'),
            (2, [("b", None)], '[{"path": "p"}]'),
        ],
        "id int, contributors array<struct<name:string,title:string>>, "
        "sources string",
    )
    spec = _strict_spec(
        [
            {"name": "contributors", "type": "array"},
            {"name": "sources", "type": "string"},
        ]
    )
    res = check_table(df, spec)
    rows = [r for r in res.violations.collect() if "items.required" in r["check"]]
    got = {(r["check"]) for r in rows}
    assert got == {
        "contributors.jsonSchema.items.required.title",
        "sources.jsonSchema.items.required.title",
    }


def test_strict_table_name_pattern(spark):
    from check_datapackage_spark.spec import strict_spec_issues

    ok = TableSpec.from_dict({"name": "my_table-2.0", "schema": {}})
    bad = TableSpec.from_dict({"name": "My Table!", "schema": {}})
    assert strict_spec_issues(ok) == []
    issues = strict_spec_issues(bad)
    assert len(issues) == 1 and issues[0].type == "pattern"


def test_strict_flag_flows_through_check_table(spark):
    from check_datapackage_spark import CheckConfig

    df = spark.createDataFrame([(1,)], "id int")
    spec = TableSpec.from_dict({"name": "Bad Name", "schema": {}})
    res = check_table(df, spec, config=CheckConfig(strict=True))
    assert any(i.type == "pattern" for i in res.spec_issues)
    res2 = check_table(df, spec, config=CheckConfig(strict=False))
    assert not any(i.type == "pattern" for i in res2.spec_issues)


# --- CustomCheck jsonpath targets (ref test_extensions.py:27-117) -----------


def test_custom_check_direct_jsonpath(spark, nested_df):
    """ref test_direct_jsonpath: a scalar path applies the predicate
    to that value; violations carry the check's type/message."""
    from check_datapackage_spark.extensions import CustomCheck

    chk = CustomCheck(
        type="lowercase",
        message="meta id must be lowercase",
        jsonpath="$.meta.id",
        check=lambda s: s == s.str.lower(),
    )
    upper = nested_df.withColumn(
        "meta",
        F.when(
            F.col("id") == 1,
            F.struct(F.lit("M1").alias("id"), F.col("meta.title").alias("title")),
        ).otherwise(F.col("meta")),
    )
    rows = run_checks(upper, compile_extensions([chk], schema=upper.schema))
    assert keys(rows) == {("1", "meta.id.custom.lowercase")}
    assert rows[0]["type"] == "lowercase"
    assert rows[0]["message"] == "meta id must be lowercase"


def test_custom_check_array_jsonpath(spark, nested_df):
    """ref test_indirect_jsonpath analog: [*] targets check every
    non-null item; null/empty arrays and null items are no-ops."""
    from check_datapackage_spark.extensions import CustomCheck

    chk = CustomCheck(
        type="name-style",
        message="contributor names must be lowercase",
        jsonpath="$.contributors[*].name",
        check=lambda s: s == s.str.lower(),
    )
    staged = nested_df.withColumn(
        "contributors",
        F.when(
            F.col("id") == 2,
            F.expr(
                "array(named_struct('name', 'ALICE', 'title', 'Mx'),"
                " named_struct('name', 'bob', 'title', 'Dr'))"
            ),
        ).otherwise(F.col("contributors")),
    )
    rows = run_checks(staged, compile_extensions([chk], schema=staged.schema))
    assert keys(rows) == {("2", "contributors[*].name.custom.name-style")}


def test_custom_check_unmatched_jsonpath_is_noop(spark, nested_df):
    """ref test_no_matching_jsonpath."""
    from check_datapackage_spark.extensions import CustomCheck

    chk = CustomCheck(
        type="x",
        message="m",
        jsonpath="$.nonexistent.path",
        check=lambda s: s == "never",
    )
    assert compile_extensions([chk], schema=nested_df.schema) == []


@pytest.mark.parametrize(
    "bad",
    ["<><>bad.path", "$.no & $.intersection", "$.no & $.intersection | $.operator"],
)
def test_custom_check_bad_path_raises(bad):
    """ref test_custom_check_cannot_apply_to_bad_path."""
    from check_datapackage_spark.extensions import CustomCheck

    with pytest.raises(ValueError):
        CustomCheck(type="x", message="m", jsonpath=bad, check=lambda s: s)


def test_custom_check_required_type_forbidden_with_jsonpath():
    """ref test_custom_check_cannot_be_type_required."""
    from check_datapackage_spark.extensions import CustomCheck

    with pytest.raises(ValueError):
        CustomCheck(
            type="required", message="m", jsonpath="$.name", check=lambda s: s
        )


def test_custom_check_needs_exactly_one_target():
    from check_datapackage_spark.extensions import CustomCheck

    with pytest.raises(ValueError):
        CustomCheck(type="x", message="m", check=lambda s: s)
    with pytest.raises(ValueError):
        CustomCheck(
            type="x", message="m", column="a", jsonpath="$.a", check=lambda s: s
        )
