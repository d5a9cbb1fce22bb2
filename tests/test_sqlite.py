"""SQLite table function (chdb_spark/sources/sqlite.py): real e2e —
create a db file with stdlib sqlite3, read it through the Spark data
source, verify rows, partitioning, and the CH-dialect ``sqlite()`` path."""

from __future__ import annotations

import sqlite3

import pytest

from chdb_spark.sources.sqlite import infer_sqlite_schema, read_sqlite


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "test.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT, price REAL, blob BLOB)"
    )
    con.executemany(
        "INSERT INTO items (id, name, price, blob) VALUES (?, ?, ?, ?)",
        [(i, f"item_{i}", i * 1.5, bytes([i % 256])) for i in range(1, 101)],
    )
    con.execute("CREATE TABLE empty_t (x INTEGER)")
    con.commit()
    con.close()
    return path


def test_schema_inference(db):
    schema = infer_sqlite_schema(db, "items")
    assert [f.name for f in schema.fields] == ["id", "name", "price", "blob"]
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "bigint", "string", "double", "binary",
    ]


def test_read_table(spark, db):
    df = read_sqlite(spark, db, "items")
    rows = df.orderBy("id").collect()
    assert len(rows) == 100
    assert rows[0].id == 1 and rows[0].name == "item_1" and rows[0].price == 1.5
    assert rows[99].id == 100
    assert df.filter("price > 100").count() == 34  # 67*1.5=100.5 .. 100*1.5


def test_read_partitioned_covers_all_rows(spark, db):
    # rowid range slicing: every row exactly once, any partition count
    for n in (1, 3, 7, 200):
        df = read_sqlite(spark, db, "items", n_partitions=n)
        assert df.count() == 100, n
        assert df.select("id").distinct().count() == 100, n
    assert read_sqlite(spark, db, "empty_t").count() == 0


def test_read_query_single_stream(spark, db):
    df = read_sqlite(
        spark, db, "SELECT name, price * 2 AS p2 FROM items WHERE id <= 3"
    )
    got = {r.name: r.p2 for r in df.collect()}
    assert got == {"item_1": 3.0, "item_2": 6.0, "item_3": 9.0}


def test_sqlite_in_ch_dialect_sql(spark, db):
    import chdb_spark.session as chs

    out = chs.query(
        spark,
        f"SELECT count(*) AS n, round(sum(price), 2) AS total "
        f"FROM sqlite('{db}', 'items') WHERE id <= 10",
        "Pandas",
    )
    assert int(out["n"].iloc[0]) == 10
    assert float(out["total"].iloc[0]) == round(sum(i * 1.5 for i in range(1, 11)), 2)


def test_missing_table_raises(db):
    with pytest.raises(ValueError):
        infer_sqlite_schema(db, "nope")
