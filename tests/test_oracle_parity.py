"""Local replica of the driver's DuckDB-oracle comparison: for every
queries()/oracle_sql() pair, row count + sorted column names + an
order-insensitive multiset of normalized row values must match at
sf0.01 (the driver's correctness scale)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(_norm(r[i])) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# The driver's value-hash is representation-sensitive: DuckDB sum(BIGINT)
# returns HUGEINT -> Arrow decimal128(38,0), which hash-mismatches Spark's
# int64 even when values are identical (round-1 lesson: 8 red rows). So we
# compare *type classes* per column, with decimal as its own class, to
# predict the driver before it runs.
_DUCK_INTS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_type_class(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT" or t == "UHUGEINT" or t.startswith("DECIMAL"):
        return "decimal"
    if t in _DUCK_INTS:
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "string"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BLOB":
        return "binary"
    return "nested"


def _spark_type_class(dt_obj) -> str:
    from pyspark.sql import types as T

    if isinstance(dt_obj, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt_obj, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt_obj, T.DecimalType):
        return "decimal"
    if isinstance(dt_obj, T.BooleanType):
        return "bool"
    if isinstance(dt_obj, T.StringType):
        return "string"
    if isinstance(dt_obj, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt_obj, T.DateType):
        return "date"
    if isinstance(dt_obj, T.BinaryType):
        return "binary"
    return "nested"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = list(qdf.columns)
    spark_rows = [tuple(r) for r in qdf.collect()]

    con = _duck()
    duck_types = {
        r[0]: r[1]
        for r in con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    }
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    spark_classes = {f.name: _spark_type_class(f.dataType) for f in qdf.schema.fields}
    for c in sorted(spark_cols):
        assert spark_classes[c] == _duck_type_class(duck_types[c]), (
            f"{name}.{c}: type class mismatch spark={spark_classes[c]} "
            f"duck={duck_types[c]} — the driver's value hash WILL differ; "
            f"CAST the oracle column (e.g. HUGEINT sums -> BIGINT)"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_s = _rows_to_multiset(spark_cols, spark_rows)
    ms_d = _rows_to_multiset(duck_cols, duck_rows)
    if ms_s != ms_d:
        diff = [
            (a, b) for a, b in zip(ms_s, ms_d) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    qdf = QUERIES[name](spark, SF_DIR)
    assert qdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "ts_epoch"]
