"""Differential parity: the typed jsonSchema compile vs the REAL
reference engine (python-jsonschema Draft7Validator — the exact
library the reference calls at check.py:559-561).

Every (schema, value) cell of a deterministic matrix is evaluated by
BOTH engines; a mismatch anywhere fails with the offending cell. All
schemas use only the vocabulary _schema_pred implements (everything
else raises at compile time by design). All cells are evaluated in
ONE Spark job (one column per schema)."""

from __future__ import annotations

import json

import pytest
from jsonschema import Draft7Validator, FormatChecker
from pyspark.sql import functions as F

from check_datapackage_spark.compile import _schema_pred, resolve_refs

#: the exact validator construction the reference uses (check.py:560)
_FC = FormatChecker()


def _ref_valid(schema, inst) -> bool:
    return Draft7Validator(schema, format_checker=_FC).is_valid(inst)

VALUES = [
    # scalars
    "1", "2.0", "-3", "1.5", "0", "true", "false", "null",
    '"abc"', '"ABC"', '"a"', '""', '"12"', '"1"',
    # arrays
    "[]", "[1, 2, 3]", "[1, 1]", "[1, 1.0]", '["a", "b"]',
    '["a", "a"]', '[1, "1"]', "[true, 1]",
    '[{"x": 1}, {"x": 1}]', "[[1], [1]]", '["S", "M"]', '[1, 2, "x"]',
    "[null, null]",
    # objects
    "{}", '{"a": 1}', '{"a": 1, "b": 2}', '{"a": null}',
    '{"credit": "v"}', '{"credit": "v", "cvv": "1"}',
    '{"credit": "v", "cvv": 5}', '{"BAD": 1}', '{"ab": 1, "cd": 2}',
    '{"a": {"b": 1}}', '{"a": [1, 2]}', '{"a": "x"}',
    # format fodder
    '"a@b.c"', '"nope"', '"2024-02-29"', '"2023-02-29"', '"0000-01-01"',
    '"03:04:05"', '"3:4:5"', '"03:04:05.5"', '"25:00:00"',
    '"2024-01-02T03:04:05Z"', '"2024-01-02t03:04:05.5z"',
    '"2024-01-02T03:04:05"', '"2024-02-30T01:00:00Z"',
    '"2024-01-02T03:04:05-23:59"',
    '"1.2.3.4"', '"256.1.1.1"', '"01.2.3.4"',
    '"::ffff:1.2.3.4"', '"1:2:3:4:5:6:7:8"', '"1::2::3"', '"fe80::1%eth0"',
    '"123e4567-e89b-12d3-a456-426614174000"',
    '"123E4567-E89B-12D3-A456-426614174000"',
    '"/a~1b"', '"/a~2b"', '"a/b"',
    # tuple / pattern-properties fodder
    '[1, "a", 2]', '["a", 1]', '{"ax": 1, "ay": "s"}', '{"cx": "s"}',
    '{"cx": 5}', '{"ax": "bad"}',
]

SCHEMAS = [
    {"type": "integer"},
    {"type": "number"},
    {"type": "string"},
    {"type": "boolean"},
    {"type": "null"},
    {"type": "array"},
    {"type": "object"},
    {"type": ["integer", "string"]},
    {"enum": [1, "a", True]},
    {"enum": ["S", "M", "L"]},
    {"const": 1},
    {"const": "a"},
    {"pattern": "^[a-z]+$"},
    {"minLength": 2},
    {"maxLength": 2},
    {"minimum": 0},
    {"maximum": 1},
    {"exclusiveMinimum": 0},
    {"exclusiveMaximum": 2},
    {"multipleOf": 2},
    {"minItems": 2},
    {"maxItems": 2},
    {"uniqueItems": True},
    {"items": {"type": "integer"}},
    {"items": {"enum": ["S", "M", "L"]}},
    {"items": {"type": "string", "pattern": "^[A-Z]$"}},
    {"contains": {"type": "string"}},
    {"required": ["a"]},
    {"properties": {"a": {"type": "integer"}}},
    {"properties": {"a": {"properties": {"b": {"type": "integer"}}}}},
    {"minProperties": 1},
    {"maxProperties": 1},
    {"additionalProperties": False, "properties": {"a": {}, "b": {}}},
    {"propertyNames": {"pattern": "^[a-z]+$"}},
    {"propertyNames": {"maxLength": 2}},
    {"dependencies": {"credit": ["cvv"]}},
    {"dependencies": {"credit": {"properties": {"cvv": {"type": "string"}}}}},
    {"anyOf": [{"type": "string"}, {"minimum": 2}]},
    {"oneOf": [{"type": "integer"}, {"minimum": 1.5}]},
    {"allOf": [{"type": "integer"}, {"minimum": 0}]},
    {"not": {"type": "string"}},
    {"if": {"type": "integer"}, "then": {"minimum": 0},
     "else": {"type": "string"}},
    {"properties": {"a": {"anyOf": [{"type": "integer"},
                                    {"type": "array"}]}}},
    # round-5 additions: format / patternProperties / schema-valued
    # additionalProperties / tuple items
    {"format": "email"},
    {"format": "date"},
    {"format": "time"},
    {"format": "date-time"},
    {"format": "uuid"},
    {"format": "ipv4"},
    {"format": "ipv6"},
    {"format": "json-pointer"},
    {"format": "relative-json-pointer"},
    {"patternProperties": {"^a": {"type": "integer"}}},
    {"patternProperties": {"^c": {"type": "string"}},
     "additionalProperties": False},
    {"patternProperties": {"^a": {"type": "integer"}},
     "properties": {"ab": {"type": "integer"}},
     "additionalProperties": False},
    {"additionalProperties": {"type": "integer"}},
    {"additionalProperties": {"type": "integer"},
     "properties": {"a": {}, "b": {}}},
    {"items": [{"type": "integer"}, {"type": "string"}]},
    {"items": [{"type": "integer"}], "additionalItems": False},
    {"items": [{"type": "integer"}],
     "additionalItems": {"type": "integer"}},
    {"properties": {"a": {"patternProperties": {"^b": {"type": "integer"}}}}},
    {"properties": {"a": {"format": "ipv4"}}},
]

#: adjudicated divergences (value, schema-index) with rationale.
ADJUDICATED: dict = {
    # [[1], [1.0]]-style NESTED mixed-numeric duplicates would go here;
    # none of the matrix's cells currently diverge.
}


def test_schema_pred_matches_draft7validator(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "j string")
    v = F.try_parse_json(F.col("j"))
    cols = [
        F.coalesce(_schema_pred(s, v, "$"), F.lit(False)).alias(f"s{i}")
        for i, s in enumerate(SCHEMAS)
    ]
    rows = df.select(F.col("j"), *cols).collect()
    assert len(rows) == len(VALUES)
    mismatches = []
    for r in rows:
        inst = json.loads(r["j"])
        for i, s in enumerate(SCHEMAS):
            expected = _ref_valid(s, inst)
            got = r[f"s{i}"]
            if got != expected and (r["j"], i) not in ADJUDICATED:
                mismatches.append(
                    {"value": r["j"], "schema": s,
                     "jsonschema": expected, "spark": got}
                )
    assert not mismatches, f"{len(mismatches)} cells diverge: " + json.dumps(
        mismatches[:10], default=str
    )


def test_unsupported_keywords_raise(spark):
    v = F.try_parse_json(F.lit('{"a": 1}'))
    for bad in (
        {"$ref": "#/definitions/x"},  # must be resolve_refs'd first
        {"unevaluatedProperties": False},  # draft 2019-09, not Draft-7
        {"propertyNames": {"minimum": 3}},  # non-string keyword on names
    ):
        with pytest.raises(ValueError):
            _schema_pred(bad, v, "$")


#: $ref-heavy schemas, resolved by resolve_refs then compiled — the
#: jsonschema side resolves the SAME original schema itself, so any
#: substitution bug diverges.
REF_SCHEMAS = [
    {"definitions": {"pos": {"type": "integer", "minimum": 1}},
     "properties": {"a": {"$ref": "#/definitions/pos"}}},
    {"$defs": {"name": {"type": "string", "pattern": "^[a-z]+$"}},
     "items": {"$ref": "#/$defs/name"}},
    {"definitions": {
        "leaf": {"type": "integer"},
        "node": {"properties": {"b": {"$ref": "#/definitions/leaf"}}}},
     "properties": {"a": {"$ref": "#/definitions/node"}}},
    {"definitions": {"sizes": {"enum": ["S", "M", "L"]}},
     "anyOf": [{"$ref": "#/definitions/sizes"}, {"type": "integer"}]},
    # ref with ignored siblings (Draft-7: siblings of $ref are ignored)
    {"definitions": {"s": {"type": "string"}},
     "properties": {"a": {"$ref": "#/definitions/s",
                          "type": "integer"}}},
    # pointer into a nested structure
    {"definitions": {"wrap": {"inner": {"type": "boolean"}}},
     "properties": {"a": {"$ref": "#/definitions/wrap/inner"}}},
]


def test_resolve_refs_parity(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "j string")
    v = F.try_parse_json(F.col("j"))
    cols = [
        F.coalesce(
            _schema_pred(resolve_refs(s), v, "$"), F.lit(False)
        ).alias(f"s{i}")
        for i, s in enumerate(REF_SCHEMAS)
    ]
    rows = df.select(F.col("j"), *cols).collect()
    mismatches = []
    for r in rows:
        inst = json.loads(r["j"])
        for i, s in enumerate(REF_SCHEMAS):
            expected = _ref_valid(s, inst)
            if r[f"s{i}"] != expected:
                mismatches.append(
                    {"value": r["j"], "schema": s,
                     "jsonschema": expected, "spark": r[f"s{i}"]}
                )
    assert not mismatches, f"{len(mismatches)} cells diverge: " + json.dumps(
        mismatches[:10], default=str
    )


def test_resolve_refs_cycle_raises():
    with pytest.raises(ValueError, match="recursive"):
        resolve_refs(
            {"definitions": {"a": {"$ref": "#/definitions/b"},
                             "b": {"$ref": "#/definitions/a"}},
             "properties": {"x": {"$ref": "#/definitions/a"}}}
        )
    with pytest.raises(ValueError, match="recursive"):
        resolve_refs({"properties": {"x": {"$ref": "#"}}})


def test_resolve_refs_diamond_ok():
    # the same definition referenced from two branches is NOT a cycle
    out = resolve_refs(
        {"definitions": {"s": {"type": "string"}},
         "properties": {"a": {"$ref": "#/definitions/s"},
                        "b": {"$ref": "#/definitions/s"}}}
    )
    assert out == {"properties": {"a": {"type": "string"},
                                  "b": {"type": "string"}}}


def test_resolve_refs_bad_pointer_raises():
    with pytest.raises(ValueError, match="does not resolve"):
        resolve_refs({"properties": {"a": {"$ref": "#/definitions/nope"}}})
    with pytest.raises(ValueError, match="local"):
        resolve_refs(
            {"properties": {"a": {"$ref": "https://example.com/x.json"}}}
        )


def _rand_values(seed: int = 42, n: int = 80) -> list[str]:
    """Deterministic pseudo-random JSON values, depth <= 2 — scalars,
    arrays and objects over a small alphabet so collisions (duplicate
    items, repeated keys-domains) actually occur."""
    import random

    rng = random.Random(seed)
    scalars = [1, 2, -3, 0, 1.5, 2.0, True, False, None,
               "a", "ab", "A", "S", "M", "x", "1", ""]

    def scalar():
        return rng.choice(scalars)

    def value(depth: int):
        kind = rng.random()
        if depth >= 2 or kind < 0.5:
            return scalar()
        if kind < 0.75:
            return [value(depth + 1) for _ in range(rng.randint(0, 4))]
        keys = rng.sample(["a", "b", "ab", "cd", "credit", "cvv", "BAD"],
                          k=rng.randint(0, 3))
        return {k: value(depth + 1) for k in keys}

    return [json.dumps(value(0)) for _ in range(n)]


def test_schema_pred_matches_draft7validator_fuzz(spark):
    values = _rand_values()
    df = spark.createDataFrame([(v,) for v in values], "j string")
    v = F.try_parse_json(F.col("j"))
    cols = [
        F.coalesce(_schema_pred(s, v, "$"), F.lit(False)).alias(f"s{i}")
        for i, s in enumerate(SCHEMAS)
    ]
    rows = df.select(F.col("j"), *cols).collect()
    mismatches = []
    for r in rows:
        inst = json.loads(r["j"])
        for i, s in enumerate(SCHEMAS):
            expected = _ref_valid(s, inst)
            if r[f"s{i}"] != expected:
                mismatches.append(
                    {"value": r["j"], "schema": s,
                     "jsonschema": expected, "spark": r[f"s{i}"]}
                )
    assert not mismatches, f"{len(mismatches)} cells diverge: " + json.dumps(
        mismatches[:10], default=str
    )
