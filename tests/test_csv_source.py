"""CSV source: spec-driven all-string read + regex-guarded casting
(sources/csv.py). The q50 oracle pins the cast semantics engine-to-
engine; these tests pin the FILE path (header handling, missingValues
staging, undeclared-column passthrough) and the plan shape."""

from __future__ import annotations

import datetime

from check_datapackage_spark.sources.csv import (
    cast_error_counts,
    cast_table,
    read_csv_stream_typed,
    read_csv_typed,
)
from check_datapackage_spark.spec import TableSpec

SPEC = TableSpec.from_dict(
    {
        "name": "t",
        "schema": {
            "fields": [
                {"name": "id", "type": "integer"},
                {"name": "price", "type": "number"},
                {"name": "ok", "type": "boolean"},
                {"name": "day", "type": "date"},
                {"name": "at", "type": "datetime"},
            ],
            "missingValues": ["", "NA"],
        },
    }
)

CSV = """id,price,ok,day,at,extra
1,1.5,true,2024-01-02,2024-01-02T03:04:05,keep
NA,2e3,False,2024-13-01,1999-12-31 23:59:59,me
3,oops,YES,,not-a-time,too
"""


def test_read_csv_typed(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(CSV)
    df = read_csv_typed(spark, str(p), SPEC)
    rows = df.orderBy("price").collect()
    by_extra = {r["extra"]: r for r in rows}
    # typed values land typed
    r1 = by_extra["keep"]
    assert r1["id"] == 1 and abs(r1["price"] - 1.5) < 1e-12
    assert r1["ok"] is True
    assert r1["day"] == datetime.date(2024, 1, 2)
    assert r1["at"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    # missingValues staged to NULL; lexically-valid-but-bogus date NULLs
    r2 = by_extra["me"]
    assert r2["id"] is None and r2["day"] is None
    assert r2["ok"] is False and r2["price"] == 2000.0
    assert r2["at"] == datetime.datetime(1999, 12, 31, 23, 59, 59)
    # corrupt number / empty date / bad datetime → NULL; bool synonyms
    r3 = by_extra["too"]
    assert r3["price"] is None and r3["day"] is None and r3["at"] is None
    assert r3["ok"] is True and r3["id"] == 3
    # undeclared column passes through as string
    assert dict(df.dtypes)["extra"] == "string"
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["price"] == "double"
    assert types["day"] == "date" and types["at"] == "timestamp"


def test_cast_error_counts_single_pass(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(CSV)
    raw = read_csv_typed(spark, str(p), TableSpec.from_dict(
        {"name": "raw", "schema": {"fields": []}}
    ))
    diag = {r["field"]: r for r in cast_error_counts(raw, SPEC).collect()}
    assert diag["id"]["n_rows"] == 3
    assert diag["id"]["n_present"] == 2  # one NA staged out
    assert diag["id"]["n_cast_ok"] == 2 and diag["id"]["n_cast_err"] == 0
    assert diag["price"]["n_cast_err"] == 1  # 'oops'
    assert diag["day"]["n_present"] == 2  # '' staged out
    assert diag["day"]["n_cast_err"] == 1  # 2024-13-01: regex ok, cast NULL
    assert diag["at"]["n_cast_err"] == 1  # not-a-time
    assert diag["ok"]["n_cast_err"] == 0
    # ONE aggregation: no Exchange in the aggregate's plan
    plan = cast_error_counts(raw, SPEC)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # single-partition final agg only


def test_cast_table_passthrough_projection(spark):
    df = spark.createDataFrame([("1", "x")], "id string, other string")
    out = cast_table(df, SPEC)
    assert dict(out.dtypes) == {"id": "bigint", "other": "string"}
    # the cast is a pure projection over the source — no shuffle at all
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_read_csv_stream_typed(spark, tmp_path):
    """Streaming twin: typed rows land continuously; stateless append
    (no state store), headers skipped per-file."""
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.csv").write_text("id,price,ok,day,at\n1,1.5,true,2024-01-02,2024-01-02T03:04:05\n")
    (d / "b.csv").write_text("id,price,ok,day,at\nNA,oops,no,2024-13-01,\n")
    stream = read_csv_stream_typed(spark, str(d), SPEC)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("csv_typed")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["id"]: r for r in spark.sql("SELECT * FROM csv_typed").collect()}
    assert rows[1]["price"] == 1.5 and rows[1]["ok"] is True
    assert rows[None]["price"] is None  # 'oops' → NULL, NA id → NULL
    assert rows[None]["ok"] is False and rows[None]["day"] is None


def test_read_jsonl_typed(spark, tmp_path):
    from check_datapackage_spark.sources.csv import read_jsonl_typed
    from check_datapackage_spark.spec import TableSpec

    p = tmp_path / "d.jsonl"
    p.write_text(
        '{"id": 1, "price": 2.5, "ok": true, "day": "2024-01-02"}\n'
        '{"id": "x", "price": "", "ok": "no", "day": "bad"}\n'
        '{"id": 3, "price": 1e3, "ok": 0, "day": "2024-02-03"}\n'
    )
    spec = TableSpec.from_dict(
        {
            "name": "d",
            "schema": {
                "fields": [
                    {"name": "id", "type": "integer"},
                    {"name": "price", "type": "number"},
                    {"name": "ok", "type": "boolean"},
                    {"name": "day", "type": "date"},
                ]
            },
        }
    )
    rows = {
        r["id"]: r.asDict()
        for r in read_jsonl_typed(spark, str(p), spec).collect()
    }
    assert rows[1]["price"] == 2.5 and rows[1]["ok"] is True
    assert str(rows[1]["day"]) == "2024-01-02"
    # row 2: id/day lexically invalid, price missing-staged -> NULL;
    # "no" IS a Table Schema boolean false
    assert None in rows
    assert all(rows[None][c] is None for c in ("id", "price", "day"))
    assert rows[None]["ok"] is False
    assert rows[3]["price"] == 1000.0 and rows[3]["ok"] is False


def test_read_jsonl_stream_typed(spark, tmp_path):
    from check_datapackage_spark.sources.csv import read_jsonl_stream_typed
    from check_datapackage_spark.spec import TableSpec

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text('{"id": 1}\n{"id": "bad"}\n')
    spec = TableSpec.from_dict(
        {"name": "d", "schema": {"fields": [{"name": "id", "type": "integer"}]}}
    )
    out = read_jsonl_stream_typed(spark, str(src), spec)
    q = (
        out.writeStream.format("memory")
        .queryName("jsonl_typed")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        [r["id"] for r in spark.sql("SELECT * FROM jsonl_typed").collect()],
        key=lambda x: (x is None, x),
    )
    assert got == [1, None]
