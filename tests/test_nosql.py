"""MongoDB / Redis table functions (chdb_spark.sources.nosql) — reference
mongodb()/redis() table functions (datastore/table_functions.py:668,722).

No servers in this container: the tests inject dict-backed fake clients
through the cloudpickled factory option, which exercises the FULL Spark
path — Python data source registration, partition planning, executor-side
reads, Arrow hand-off, type coercion. Only the wire protocol is faked.
"""

from __future__ import annotations

import pytest

from chdb_spark.sources.nosql import (
    mongodb,
    plan_mongo_ranges,
    redis_table,
    structure_to_ddl,
)


# ---------------------------------------------------------------------------
# pure helpers
# ---------------------------------------------------------------------------


def test_structure_to_ddl():
    assert (
        structure_to_ddl("key String, v1 Int64, score Float64")
        == "key string, v1 bigint, score double"
    )
    assert structure_to_ddl("d Date, t DateTime64(3)") == "d date, t timestamp"
    assert structure_to_ddl("x Nullable(Int32)") == "x int"
    with pytest.raises(ValueError):
        structure_to_ddl("x NoSuchType")
    with pytest.raises(ValueError):
        structure_to_ddl("")


class _PlanColl:
    def __init__(self, n):
        self.n = n

    def aggregate(self, pipeline):
        size = pipeline[0]["$sample"]["size"]
        return [{"_id": i} for i in range(min(size, self.n))]


def test_plan_mongo_ranges():
    assert plan_mongo_ranges(_PlanColl(1000), "_id", 1) == [(None, None)]
    ranges = plan_mongo_ranges(_PlanColl(1000), "_id", 4)
    assert len(ranges) == 4
    assert ranges[0][0] is None and ranges[-1][1] is None
    # ranges are contiguous half-open intervals
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi == lo
    # too small to sample → single range
    assert plan_mongo_ranges(_PlanColl(2), "_id", 4) == [(None, None)]


# ---------------------------------------------------------------------------
# end-to-end through the Spark data source (fake clients, real plumbing)
# ---------------------------------------------------------------------------


from chdb_spark.sources.nosql import (
    fake_mongo_client_factory as _fake_mongo_factory,
)


def test_mongodb_read_partitioned(spark):
    docs = [{"_id": i, "name": f"user{i}", "score": i * 1.5} for i in range(97)]
    df = mongodb(
        spark,
        host="fake:27017",
        database="appdb",
        collection="users",
        structure="_id Int64, name String, score Float64",
        n_partitions=4,
        client_factory=_fake_mongo_factory(docs),
    )
    assert df.schema.simpleString() == "struct<_id:bigint,name:string,score:double>"
    rows = sorted(df.collect(), key=lambda r: r._id)
    assert len(rows) == 97  # range partitions are disjoint AND complete
    assert rows[10]._id == 10 and rows[10].name == "user10"
    assert rows[10].score == pytest.approx(15.0)
    # the scan really was split: 4 input partitions planned
    assert df.rdd.getNumPartitions() == 4


from chdb_spark.sources.nosql import (
    fake_redis_client_factory as _fake_redis_factory,
)


def test_redis_read(spark):
    kv = {f"user:{i}": {"visits": i * 3, "country": "ES" if i % 2 else "DE"} for i in range(25)}
    df = redis_table(
        spark,
        host="fake:6379",
        key="k",
        structure="k String, visits Int64, country String",
        client_factory=_fake_redis_factory(kv),
    )
    rows = {r.k: r for r in df.collect()}
    assert len(rows) == 25
    assert rows["user:7"].visits == 21 and rows["user:7"].country == "ES"


def test_redis_read_sharded(spark):
    kv = {f"k{i}": {"v": i} for i in range(40)}
    df = redis_table(
        spark,
        host="fake:6379",
        key="k",
        structure="k String, v Int64",
        n_partitions=3,
        client_factory=_fake_redis_factory(kv),
    )
    got = sorted(int(r.k[1:]) for r in df.collect())
    assert got == list(range(40))  # hash-sharding loses/duplicates nothing


def test_uri_dispatch(spark):
    from chdb_spark.sources.uri import open_uri

    with pytest.raises(ValueError, match="collection"):
        open_uri(spark, "mongodb://h:27017/db")
    with pytest.raises(ValueError, match="key=.*structure"):
        open_uri(spark, "redis://h:6379/0")
    # full URI plumbs through to the data source (fake client via options)
    df = open_uri(
        spark,
        "mongodb://u:p@h:27017/db?collection=c&structure=_id Int64",
        client_factory=_fake_mongo_factory([{"_id": 1}, {"_id": 2}]),
    )
    assert [r._id for r in df.orderBy("_id").collect()] == [1, 2]


def test_url_table_function_loopback(spark, tmp_path):
    """Real e2e for the url() source against a loopback HTTP server — no
    external network needed, the full fetch→sniff→scan path executes."""
    import http.server
    import threading

    import pandas as pd

    root = tmp_path / "www"
    root.mkdir()
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(root / "d.parquet")
    (root / "d.csv").write_text("a,b\n5,p\n6,q\n")

    handler = lambda *args, **kw: http.server.SimpleHTTPRequestHandler(
        *args, directory=str(root), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from chdb_spark.sources.uri import open_uri

        df = open_uri(spark, f"http://127.0.0.1:{port}/d.parquet")
        assert sorted(r.a for r in df.collect()) == [1, 2, 3]

        df = open_uri(
            spark,
            f"http://127.0.0.1:{port}/d.csv",
            fmt="csv",
            header="true",
            inferSchema="true",
        )
        assert sorted(r.a for r in df.collect()) == [5, 6]

        # and through CH-dialect SQL text
        import chdb_spark.session as chs

        out = chs.query(
            spark,
            f"SELECT count(*) AS n FROM url('http://127.0.0.1:{port}/d.parquet', Parquet)",
            "Pandas",
        )
        assert int(out["n"].iloc[0]) == 3
    finally:
        srv.shutdown()
        srv.server_close()


# ---------------------------------------------------------------------------
# MySQL / PostgreSQL pure-Python path (sources/rdbms.py) — fake DB-API
# client end-to-end, same strategy as the Mongo/Redis fakes above
# ---------------------------------------------------------------------------


# (classes live inside the factory closure so cloudpickle ships them by
# value to executors — module-level classes would need this test module
# importable on workers)


def _fake_sql_factory():
    from chdb_spark.sources.rdbms import fake_sql_connection_factory

    return fake_sql_connection_factory(
        {
            "users": (
                ["id", "name", "score"],
                [(i, f"user_{i}", float(i) * 1.5) for i in range(1, 101)],
            )
        }
    )


def test_mysql_python_source_e2e(spark):
    from chdb_spark.sources.rdbms import mysql

    df = mysql(
        spark, "db.example:3306", "shop", "users",
        factory=_fake_sql_factory(), n_partitions=4,
    )
    assert df.rdd.getNumPartitions() >= 2  # integer pk → range partitions
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert len(rows) == 100 and rows[7] == ("user_7", 10.5)
    # schema inferred from the bounded probe
    assert dict(df.dtypes)["id"] == "bigint"
    assert dict(df.dtypes)["score"] == "double"
    # pushdown of aggregation happens Spark-side over the partitioned scan
    assert df.filter("id >= 50").count() == 51


def test_postgresql_python_source_with_structure(spark):
    from chdb_spark.sources.rdbms import postgresql

    df = postgresql(
        spark, "pg:5432", "shop", "users",
        structure="id Int64, name String, score Float64",
        factory=_fake_sql_factory(), n_partitions=1,
    )
    assert [c for c, _ in df.dtypes] == ["id", "name", "score"]
    assert df.count() == 100
