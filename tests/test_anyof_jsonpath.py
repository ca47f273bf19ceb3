"""G7 anyOf-required analog + P4 jsonpath syntax validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from check_datapackage_spark.compile import compile_any_of_required
from check_datapackage_spark.plans.validation import violations_plan
from check_datapackage_spark.spec import Exclusion, SpecTypeError, is_jsonpath


def test_any_of_required(spark):
    # ref _handle_licenses (check.py:878-898): at least one of name/path
    df = spark.createDataFrame(
        [(1, "n", None), (2, None, "p"), (3, None, None), (4, "n", "p")],
        "id int, name string, path string",
    )
    ck = compile_any_of_required(["name", "path"])
    v = violations_plan(df, [ck], "licenses", row_key="id").collect()
    assert len(v) == 1
    assert v[0]["type"] == "anyOf"
    assert v[0]["message"] == "must have at least one of: `name`, `path`"
    assert v[0]["row_key"] == "3"


@pytest.mark.parametrize(
    "path,ok",
    [
        ("$.a.b", True),
        ("$.resources[*].name", True),
        ("$", True),
        ("a.b", False),  # must start with $
        ("$.a[0", False),  # unbalanced
        ("$.a & $.b", False),  # ref internals.py:49-67: '&' rejected
    ],
)
def test_is_jsonpath(path, ok):
    assert is_jsonpath(path) is ok


def test_exclusion_validates_jsonpath_at_build():
    # ref internals.py:70: validation happens at config-build time
    with pytest.raises(SpecTypeError, match="invalid jsonpath"):
        Exclusion(jsonpath="not-a-path")
    Exclusion(jsonpath="$.t[*].col")  # valid builds fine
