"""Violation/issue model.

Re-expresses the reference's ``Issue`` contract
(``/root/reference/src/check_datapackage/issue.py:20-52``) as both a
driver-side dataclass (for spec-level checks, which never touch data) and
a Spark row schema (for data-plane violations emitted by the fused
validation plan).

Reference semantics preserved:

* ``Issue`` is frozen + ordered; ``instance`` is excluded from
  equality/hash (``issue.py:52`` → our dedup key is
  ``(jsonpath, type, message)``).
* The ``MISSING`` marker (``issue.py:5-17``) renders as ``<MISSING>``;
  in the data plane a missing value is SQL ``NULL`` in the ``instance``
  column with ``type='required'``.
* ``check()`` returns ``sorted(set(issues))``
  (``check.py:279``) → :func:`finalize_issues` /
  :func:`finalize_violations`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MissingValue:
    """Singleton marker for a missing required property (ref issue.py:5-17)."""

    _instance: Optional["MissingValue"] = None

    def __new__(cls) -> "MissingValue":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "<MISSING>"


MISSING = MissingValue()


@dataclass(frozen=True, order=True)
class Issue:
    """One validation issue (ref issue.py:20-52).

    ``instance`` carries the offending value but is excluded from
    comparison and hashing, exactly like the reference's
    ``field(compare=False, hash=False)``.
    """

    jsonpath: str
    type: str
    message: str
    instance: Any = field(default=None, compare=False, hash=False)


def finalize_issues(issues: list[Issue]) -> list[Issue]:
    """Dedup on (jsonpath, type, message) + canonical sort (ref check.py:279)."""
    return sorted(set(issues))


# ---------------------------------------------------------------------------
# Data-plane violation rows
# ---------------------------------------------------------------------------

#: Core violation columns, mirroring Issue(jsonpath, type, message, instance).
#: ``instance`` is stringified (values may be any source type).
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("jsonpath", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
        T.StructField("instance", T.StringType(), True),
    ]
)

#: Extended schema adds engine context: which check fired, where in the data.
VIOLATION_FULL_SCHEMA = T.StructType(
    list(VIOLATION_SCHEMA.fields)
    + [
        T.StructField("check", T.StringType(), False),
        T.StructField("column", T.StringType(), True),
        T.StructField("row_key", T.StringType(), True),
        T.StructField("partition", T.StringType(), True),
    ]
)

VIOLATION_COLUMNS = [f.name for f in VIOLATION_FULL_SCHEMA.fields]

#: Dedup key matching Issue equality (instance excluded, issue.py:52).
DEDUP_KEY = ["jsonpath", "type", "message"]


def finalize_violations(violations: DataFrame) -> DataFrame:
    """DataFrame analog of ``sorted(set(issues))`` (ref check.py:279).

    One-row-per-Issue-equality-key then canonical order, via a window
    ``row_number`` instead of ``dropDuplicates``: dedup-by-subset-key
    rewrites to first() aggregates whose var-width string buffers make
    HashAggregateExec ineligible — the planner emits a SortAggregate
    PAIR (sort, partial agg, exchange, sort, final agg), i.e. two full
    sorts of the violation stream, and the partial level reduces
    nothing when keys are mostly unique (measured 1.8 s of q34's 3.2 s
    at sf1.0). The window shape is exchange + ONE sort + a streaming
    row_number. Which row survives per key is arbitrary in both
    formulations (Issue equality ignores the non-key payload), so the
    emitted set is identical — oracle-gated at sf0.01/sf0.1 across all
    violation queries.
    """
    from pyspark.sql import Window as W

    key = [c for c in DEDUP_KEY if c in violations.columns]
    if not key:
        return violations.dropDuplicates()
    w = W.partitionBy(*key).orderBy(F.lit(1))
    return (
        violations.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(*[F.col(c) for c in key])
    )


def issues_from_rows(rows: list) -> list[Issue]:
    """Convert collected violation rows back to driver-side Issues."""
    return [
        Issue(
            jsonpath=r["jsonpath"],
            type=r["type"],
            message=r["message"],
            instance=r["instance"],
        )
        for r in rows
    ]


class DataPackageError(Exception):
    """Raised when error-mode checks find issues (ref check.py:161-169)."""


def explain(issues: list[Issue], subject: str = "data") -> str:
    """Human report (ref check.py:172-214): header + per-issue snippet
    with the property underlined by carets at its PARENT path — exact
    rendering parity with the reference (tests/test_check.py:66-97:
    'At top level:' / 'At resources[0]:' display, '| name: <value>'
    line, '^'-underline sized to the instance text).

    ``subject`` names what was validated in the header. The reference
    always says ``datapackage.json`` (check.py:212) because it only
    validates descriptors; this engine validates both, so SPEC-level
    issue reports pass ``subject="datapackage.json"`` (exact reference
    wording) and data-plane violation reports keep the default
    ``"data"`` — the one deliberate divergence, decided per VERDICT r2.
    """
    explanations = [_create_explanation(i) for i in issues]
    n = len(explanations)
    singular_or_plural = " was" if n == 1 else "s were"
    return (
        f"{n} issue{singular_or_plural} found in your [u]{subject}[/u]:\n\n"
        + "\n".join(explanations)
    )


def _create_explanation(issue: Issue) -> str:
    """One issue → caret-underlined snippet (ref check.py:217-233)."""
    display_jsonpath, property_name = _display_jsonpath_and_property(issue)
    if not property_name:
        return (
            "check() requires a dictionary with metadata,"
            f" but received {issue.instance}."
        )
    number_of_carets = len(str(issue.instance))
    return (
        f"At {display_jsonpath}:\n"
        "|\n"
        f"| {property_name}{': ' if property_name else '  '}{issue.instance}\n"
        f"| {' ' * len(property_name)}  [red]{'^' * number_of_carets}[/red]\n"
        f"{issue.message}\n"
    )


def _display_jsonpath_and_property(issue: Issue) -> tuple[str, str]:
    """Split the issue address into (parent display path, property) —
    ref check.py:237-247; '$' alone → ('top level', '')."""
    if issue.jsonpath == "$":
        return "top level", ""
    parent_jsonpath, property_name = issue.jsonpath.rsplit(".", maxsplit=1)
    return _display_jsonpath(parent_jsonpath), property_name


def _display_jsonpath(jsonpath: str) -> str:
    if jsonpath == "$":
        return "top level"
    return jsonpath.removeprefix("$.")


def pretty_print(obj, file=None) -> None:
    """Render an explain() report with rich markup (ref __init__.py:3
    re-exports ``rich.print``); falls back to stripping the [red]/[u]
    tags when rich isn't installed. ``file`` routes the output (the CLI
    sends spec issues to stderr)."""
    try:
        from rich import print as _rich_print

        _rich_print(obj, file=file)
    except ImportError:
        import re as _re

        print(_re.sub(r"\[/?(?:red|u)\]", "", str(obj)), file=file)
