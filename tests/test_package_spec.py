"""Package-descriptor G1/G2 adjudication (spec.validate_package).

Mirrors the reference matrix at tests/test_check.py:545-664: missing
path+data collapse to ONE issue, name required with MISSING instance,
both path+data → oneOf, and the path string-vs-array type routing.
Pure driver-side — no SparkSession needed.
"""

from __future__ import annotations

import pytest

from check_datapackage_spark.issue import MISSING
from check_datapackage_spark.spec import validate_package


def _pkg(**resource):
    base = {"name": "res1", "path": "data.csv"}
    base.update(resource)
    for k, v in list(base.items()):
        if v is None:
            del base[k]
    return {"resources": [base]}


def test_pass_with_data_instead_of_path():
    assert validate_package(_pkg(path=None, data=[1, 2, 3])) == []


def test_fail_path_and_data_both_missing_single_issue():
    issues = validate_package(_pkg(path=None))
    assert len(issues) == 1
    assert issues[0].jsonpath == "$.resources[0]"
    assert issues[0].type == "required"
    assert "no `path` or `data`" in issues[0].message


def test_fail_name_and_path_missing_two_issues():
    issues = validate_package({"resources": [{}]})
    assert [(i.jsonpath, i.type) for i in issues] == [
        ("$.resources[0]", "required"),
        ("$.resources[0].name", "required"),
    ]
    assert issues[1].instance is MISSING


def test_fail_both_path_and_data_present():
    issues = validate_package(_pkg(data=[1]))
    assert len(issues) == 1
    assert issues[0].type == "oneOf"
    assert issues[0].jsonpath == "$.resources[0]"


def test_fail_multiple_resources_each_flagged():
    doc = {"resources": [{"name": "a"}, {"name": "b"}]}
    issues = validate_package(doc)
    assert [(i.jsonpath, i.type) for i in issues] == [
        ("$.resources[0]", "required"),
        ("$.resources[1]", "required"),
    ]


def test_fail_one_resource_pass_another():
    doc = {"resources": [{"name": "a"}, {"name": "b", "path": "ok.csv"}]}
    issues = validate_package(doc)
    assert len(issues) == 1
    assert issues[0].jsonpath == "$.resources[0]"


@pytest.mark.parametrize(
    "path, location, type_",
    [
        (123, "$.resources[0].path", "type"),
        ("/bad/path", "$.resources[0].path", "pattern"),
        ("../up.csv", "$.resources[0].path", "pattern"),
        ("file:stuff.csv", "$.resources[0].path", "pattern"),
        ([], "$.resources[0].path", "minItems"),
        ([123], "$.resources[0].path[0]", "type"),
        (["/bad/path"], "$.resources[0].path[0]", "pattern"),
    ],
)
def test_fail_with_bad_resource_path(path, location, type_):
    issues = validate_package(_pkg(path=path))
    assert len(issues) == 1
    assert issues[0].type == type_
    assert issues[0].jsonpath == location


@pytest.mark.parametrize(
    "path",
    ["data.csv", "dir/file.parquet", "https://example.com/f.csv",
     ["a.csv", "b.csv"], "ftp://host/f.csv"],
)
def test_pass_with_good_resource_path(path):
    assert validate_package(_pkg(path=path)) == []


def test_missing_resources_key():
    issues = validate_package({"name": "pkg"})
    assert [(i.jsonpath, i.type) for i in issues] == [("$", "required")]
    assert issues[0].instance is MISSING


def test_non_object_resource():
    issues = validate_package({"resources": ["nope"]})
    assert [(i.jsonpath, i.type) for i in issues] == [
        ("$.resources[0]", "type")]
