"""Nested array<struct> validation (P2 wildcard → posexplode with [i]
addresses) + wrong-typed spec keys (G5/G6)."""

from __future__ import annotations

import pytest

from check_datapackage_spark.plans.nested import nested_violations
from check_datapackage_spark.spec import SpecTypeError, TableSpec


@pytest.fixture(scope="module")
def contrib_df(spark):
    rows = [
        (1, [{"title": "Ada", "email": "ada@example.com"}, {"title": "Bob", "email": "bad"}]),
        (2, [{"title": None, "email": "c@example.com"}]),
        (3, []),
        (4, None),
    ]
    return spark.createDataFrame(
        rows,
        "id int, contributors array<struct<title:string, email:string>>",
    )


CONTRIB_SPEC = TableSpec.from_dict(
    {
        "name": "pkg",
        "schema": {
            "fields": [
                {"name": "title", "type": "string", "constraints": {"required": True}},
                {"name": "email", "type": "string", "format": "email"},
            ]
        },
    }
)


def test_nested_violations_indexed_addresses(spark, contrib_df):
    v = nested_violations(contrib_df, "contributors", CONTRIB_SPEC, "pkg", row_key="id").collect()
    got = {(r["jsonpath"], r["type"]) for r in v}
    # ref convention: $.pkg[<row>].contributors[<i>].<field>
    assert ("$.pkg[1].contributors[1].email", "format") in got
    assert ("$.pkg[2].contributors[0].title", "required") in got
    assert len(v) == 2  # rows 3 (empty) and 4 (null) emit nothing


def test_wrong_typed_primary_key_rejected():
    # ref G5 (check.py:786-817): primaryKey must be a string or an array
    with pytest.raises(SpecTypeError, match="must be a string or an array"):
        TableSpec.from_dict({"name": "t", "schema": {"fields": [], "primaryKey": 42}})


def test_wrong_typed_fk_fields_rejected():
    # ref G6 (check.py:820-875)
    with pytest.raises(SpecTypeError, match="must be a string or an array"):
        TableSpec.from_dict(
            {
                "name": "t",
                "schema": {
                    "fields": [],
                    "foreignKeys": [{"fields": {"not": "valid"}, "reference": {}}],
                },
            }
        )


def test_non_string_list_elements_rejected():
    with pytest.raises(SpecTypeError, match="non-string"):
        TableSpec.from_dict(
            {"name": "t", "schema": {"fields": [], "primaryKey": ["a", 7]}}
        )
