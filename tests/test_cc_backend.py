"""clickhouse-connect-style client (chdb_spark/cc_backend.py) — mirrors the
reference's tests/clickhouse_connect/test_cc_backend.py basic usage."""

from __future__ import annotations

import pytest

from chdb_spark.cc_backend import get_client


@pytest.fixture()
def client(spark):
    c = get_client("chdb://memory", spark=spark)
    yield c
    c.close()


def test_ping_and_uri(client):
    assert client.ping() is True
    assert client.uri.startswith("chdb://")
    assert client.server_version.split(".")[0].isdigit()
    assert client.chdb_connection is not None


def test_dsn_rejected():
    with pytest.raises(ValueError):
        get_client("http://localhost:8123")


def test_command_returns_scalar(client):
    assert client.command("SELECT 13") == 13
    assert client.command("SELECT 'user_1'") == "user_1"
    assert client.command("SELECT 79, 'user_2'") == ["79", "user_2"]


def test_query_primitives(client):
    r = client.query("SELECT toInt32(13) AS i, toString('user_1') AS s, toFloat64(3.14) AS f")
    assert r.column_names == ("i", "s", "f")
    assert r.result_rows == [(13, "user_1", 3.14)]
    assert r.first_item == 13
    assert list(r.named_results()) == [{"i": 13, "s": "user_1", "f": 3.14}]


def test_query_multi_row_numbers(client):
    r = client.query("SELECT number FROM numbers(5)")
    assert [row[0] for row in r.result_rows] == [0, 1, 2, 3, 4]
    assert r.row_count == 5


def test_query_empty(client):
    r = client.query("SELECT 1 AS one WHERE 0 = 1")
    assert r.result_rows == []


def test_query_df_and_arrow(client):
    df = client.query_df("SELECT number FROM numbers(3)")
    assert list(df["number"]) == [0, 1, 2]
    tbl = client.query_arrow("SELECT number FROM numbers(3)")
    assert tbl.num_rows == 3


def test_raw_query_pass_through(client):
    body = client.raw_query("SELECT 13 AS x", fmt="TabSeparated")
    assert body == b"13\n"


def test_create_table_ch_ddl_and_insert(client):
    # CH DDL with ENGINE = Memory + CH types goes through the dialect layer
    client.command("CREATE TABLE row_insert_test (id UInt32, name String) ENGINE = Memory")
    client.insert(
        "row_insert_test",
        [[13, "user_1"], [79, "user_2"]],
        column_names=["id", "name"],
    )
    r = client.query("SELECT id, name FROM row_insert_test ORDER BY id")
    assert r.result_rows == [(13, "user_1"), (79, "user_2")]


def test_insert_dataframe_reordered_columns(client):
    import pandas as pd

    client.command("CREATE TABLE df_reorder (id UInt32, v Float64) ENGINE = Memory")
    df = pd.DataFrame({"v": [9.5, 10.5], "id": [13, 79]})  # reversed order
    client.insert_df("df_reorder", df)
    r = client.query("SELECT id, v FROM df_reorder ORDER BY id")
    assert r.result_rows == [(13, 9.5), (79, 10.5)]


def test_query_with_parameters(client):
    r = client.query("SELECT {n:Int64} * 2 AS x", parameters={"n": 21})
    assert r.result_rows == [(42,)]


def test_chdb_extension_namespace(spark):
    import pandas as pd

    from chdb_spark.cc_backend import get_client

    c = get_client("chdb://memory", spark=spark)
    try:
        # Python() frames bind by kwarg name (reference cc_extension.py:59)
        my_df = pd.DataFrame({"a": [1, 2, 3]})
        out = c.chdb.query_python("SELECT sum(a) AS s FROM Python(my_df)", my_df=my_df)
        assert out.to_dict("records") == [{"s": 6}]

        # UDF registration through the namespace (reference :104-125)
        @c.chdb.register_function(return_type="UInt64")
        def cc_ext_plus_one(x):
            return int(x) + 1

        assert int(c.query("SELECT cc_ext_plus_one(41) AS v").result_rows[0][0]) == 42

        # DB-API cursor rides the same session; closing it leaves the client up
        cur = c.chdb.cursor()
        cur.execute("SELECT 9")
        assert cur.fetchall() == [(9,)]
        c.chdb.connection.close()
        assert c.query("SELECT 1").result_rows == [(1,)]
        assert isinstance(c.chdb.session_path, str)
    finally:
        c.close()


def test_block_stream_apis(spark):
    """VERDICT r4 item 4: the clickhouse-connect block-stream generators —
    rows / row-block / column-block / arrow — with-gated, chunked, and
    early-closeable."""
    from chdb_spark.cc_backend import get_client

    c = get_client("chdb://memory", spark=spark)
    try:
        q = "SELECT number AS n, toString(number) AS s FROM numbers(1000)"
        # rows stream: tuples, all 1000, ordered
        with c.query_rows_stream(q, max_block_size=128) as s:
            rows = list(s)
        assert len(rows) == 1000 and rows[0] == (0, "0") and rows[-1][0] == 999

        # row-block stream: blocks of <=128 rows
        with c.query_row_block_stream(q, max_block_size=128) as s:
            blocks = list(s)
        assert sum(len(b) for b in blocks) == 1000
        assert all(len(b) <= 128 for b in blocks)
        assert blocks[0][0] == (0, "0")

        # column-block stream: each block is [col1_values, col2_values]
        with c.query_column_block_stream(q, max_block_size=256) as s:
            cblocks = list(s)
        assert all(len(b) == 2 for b in cblocks)
        assert sum(len(b[0]) for b in cblocks) == 1000
        assert cblocks[0][0][:3] == [0, 1, 2]
        assert cblocks[0][1][:3] == ["0", "1", "2"]

        # arrow stream: RecordBatches
        import pyarrow as pa

        with c.query_arrow_stream(q, max_block_size=300) as s:
            batches = list(s)
        assert all(isinstance(b, pa.RecordBatch) for b in batches)
        assert sum(b.num_rows for b in batches) == 1000
        assert batches[0].schema.names == ["n", "s"]

        # iteration outside `with` is rejected (cc contract)
        ctx = c.query_rows_stream(q)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="within a context"):
            iter(ctx)

        # early close: take one block, exit — no error, stream cancelled
        with c.query_row_block_stream(q, max_block_size=10) as s:
            first = next(s)
        assert len(first) == 10

        # parameters thread through ({k:Type} binding)
        with c.query_rows_stream(
            "SELECT number AS n FROM numbers({top:UInt32})",
            parameters={"top": 5},
        ) as s:
            assert [r[0] for r in s] == [0, 1, 2, 3, 4]
    finally:
        c.close()
