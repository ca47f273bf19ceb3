"""Golden example specs — the canonical all-pass fixtures.

The reference exports ``example_package_properties`` /
``example_resource_properties`` / ``example_field_properties``
(ref src/check_datapackage/examples.py:5-72, re-exported in
``__init__.py:11-15``) as the valid base its whole test style mutates
from. These are the TableSpec analogs: a field dict, a resource-shaped
table dict, a parsed :class:`TableSpec`, and a matching all-valid
DataFrame — ``check_table(example_table(spark), example_table_spec())``
yields zero spec issues and zero violations (pinned in
tests/test_spec.py), so tests can mutate one value and assert exactly
one new violation.
"""

from __future__ import annotations

from typing import Any

from .spec import TableSpec


def example_field_properties() -> dict[str, Any]:
    """An example field declaration (ref examples.py:5-22's
    ``eye-colour`` field, given an enum so the golden fixture exercises
    a value constraint, not just a type)."""
    return {
        "name": "eye_colour",
        "type": "string",
        "title": "Woolly dormouse eye colour",
        "constraints": {"required": True, "enum": ["amber", "brown", "black"]},
    }


def example_table_properties() -> dict[str, Any]:
    """An example resource-shaped table declaration (ref
    examples.py:25-43 ``example_resource_properties``), covering the
    core constraint kinds — required, enum, range, date type — plus a
    primary key. ``example_table`` builds rows that satisfy all of it.
    """
    return {
        "name": "woolly-dormice-2015",
        "title": "Body fat percentage in the hibernating woolly dormouse",
        "schema": {
            "fields": [
                {"name": "id", "type": "integer", "constraints": {"required": True}},
                example_field_properties(),
                {"name": "measured_on", "type": "date"},
                {
                    "name": "body_fat_pct",
                    "type": "number",
                    "constraints": {"minimum": 0, "maximum": 100},
                },
            ],
            "primaryKey": ["id"],
        },
    }


def example_table_spec() -> TableSpec:
    """The golden all-pass :class:`TableSpec` (parsed
    :func:`example_table_properties`)."""
    return TableSpec.from_dict(example_table_properties())


def example_table(spark):
    """A DataFrame that passes every check in :func:`example_table_spec`."""
    import datetime as _dt

    rows = [
        (1, "amber", _dt.date(2015, 1, 14), 23.5),
        (2, "brown", _dt.date(2015, 2, 2), 31.0),
        (3, "black", None, 0.0),
    ]
    return spark.createDataFrame(
        rows,
        "id int, eye_colour string, measured_on date, body_fat_pct double",
    )
