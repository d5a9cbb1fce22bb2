"""The reference's own runnable examples (agent/skills/chdb-sql/examples/
examples.md) executed against this engine — the drop-in proof: each test
keeps the example's SQL text verbatim (only file paths point at generated
data; externals that need absent servers are covered by the dispatch tests
in test_dialect.py)."""

from __future__ import annotations

import pandas as pd
import pytest

import chdb_spark.session as chs


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("examples")
    pd.DataFrame(
        {"id": range(1, 21), "country": ["US", "DE", "FR", "US", "JP"] * 4}
    ).to_parquet(root / "users.parquet")
    pd.DataFrame(
        {"user_id": [1, 2, 3, 1, 2], "product": list("abcde"),
         "amount": [50.0, 150.0, 250.0, 300.0, 80.0]}
    ).to_parquet(root / "orders.parquet")
    pd.DataFrame(
        {"revenue": [5000, 20000, 15000], "region": ["n", "s", "e"]}
    ).to_csv(root / "sales.csv", index=False)
    (root / "events.jsonl").write_text(
        '{"event_type": "purchase", "v": 1}\n{"event_type": "view", "v": 2}\n'
    )
    pd.DataFrame(
        {"department": ["eng", "eng", "ops"], "name": ["a", "b", "c"],
         "salary": [100.0, 120.0, 90.0]}
    ).to_parquet(root / "employees.parquet")
    return str(root)


def test_example1_query_any_file(spark, data):
    out = chs.query(
        spark,
        f"""
        SELECT country, count() AS cnt
        FROM file('{data}/users.parquet', Parquet)
        GROUP BY country
        ORDER BY cnt DESC
        LIMIT 10
        """,
        "Pretty",
    )
    assert "US" in out and "cnt" in out

    df = chs.query(
        spark,
        f"""
        SELECT * FROM file('{data}/sales.csv', CSVWithNames)
        WHERE revenue > 10000
        ORDER BY revenue DESC
        """,
        "Pandas",
    )
    assert list(df["revenue"]) == [20000, 15000]

    df = chs.query(
        spark,
        f"""
        SELECT * FROM file('{data}/events.jsonl', JSONEachRow)
        WHERE event_type = 'purchase'
        """,
        "Pandas",
    )
    assert len(df) == 1


def test_example2_cross_source_join(spark, data):
    # the file+file variant of §2 (the mysql/s3 variants hit reader-gated
    # errors covered in test_dialect.py)
    df = chs.query(
        spark,
        f"""
        SELECT u.country, o.product, o.amount
        FROM file('{data}/users.parquet', Parquet) AS u
        JOIN file('{data}/orders.parquet', Parquet) AS o ON u.id = o.user_id
        WHERE o.amount > 100
        ORDER BY o.amount DESC
        LIMIT 20
        """,
        "Pandas",
    )
    assert list(df["amount"]) == [300.0, 250.0, 150.0]


def test_example3_session_builds_tables(spark, tmp_path, data):
    from chdb_spark.stateful import Session

    with Session(str(tmp_path / "analytics_db"), spark=spark) as sess:
        sess.query(
            f"""
            CREATE TABLE users ENGINE = MergeTree() ORDER BY id AS
            SELECT * FROM file('{data}/users.parquet', Parquet)
            """
        )
        out = sess.query("SELECT count() FROM users", fmt="CSV")
        assert out.strip() == "20"
        res = sess.query(
            """
            SELECT country, count() AS cnt, uniqExact(id) AS unique_users
            FROM users GROUP BY country ORDER BY cnt DESC, country LIMIT 20
            """,
            fmt="Pandas",
        )
        assert res["cnt"].sum() == 20


def test_example4_python_dict_as_table(spark):
    scores = {  # noqa: F841 — referenced from SQL text via Python()
        "student": ["Alice", "Bob", "Carol"],
        "math": [95, 87, 92],
        "science": [88, 91, 85],
    }
    df = chs.query(
        spark,
        "SELECT student, math + science AS total FROM Python(scores) "
        "ORDER BY total DESC",
        "Pandas",
    )
    # (the doc's expected-output comment lists Carol before Bob but also
    # shows Bob=178 > Carol=177 — the sort order here is the correct one)
    assert list(df["student"]) == ["Alice", "Bob", "Carol"]
    assert list(df["total"]) == [183, 178, 177]


def test_example5_parametrized_date_range(spark):
    out = chs.query(
        spark,
        """
        SELECT
            toDate({start:String}) + number AS date
        FROM numbers({days:UInt64})
        """,
        "Pandas",
        params={"start": "2025-01-01", "days": 30},
    )
    assert len(out) == 30
    assert str(out["date"].iloc[0]) == "2025-01-01"
    assert str(out["date"].iloc[-1]) == "2025-01-30"


def test_example6_window_functions(spark, data):
    df = chs.query(
        spark,
        f"""
        SELECT
            department,
            name,
            salary,
            rank() OVER (PARTITION BY department ORDER BY salary DESC) AS dept_rank,
            salary - avg(salary) OVER (PARTITION BY department) AS diff_from_avg
        FROM file('{data}/employees.parquet', Parquet)
        ORDER BY department, dept_rank
        """,
        "Pandas",
    )
    assert list(df["dept_rank"]) == [1, 2, 1]
    assert df["diff_from_avg"].iloc[0] == 10.0


def test_example8_streaming_large_results(spark):
    from chdb_spark.stateful import Session

    with Session(spark=spark) as sess:
        got = 0
        with sess.send_query("SELECT number FROM numbers(200000)") as stream:
            for chunk in stream:
                got += len(chunk)
        assert got == 200000


def test_example7_udf(spark, data):
    from chdb_spark.udf import chdb_udf, create_function, drop_function

    @chdb_udf(return_type="Float64")
    def fahrenheit_to_celsius(f):
        return (float(f) - 32) * 5.0 / 9.0

    @chdb_udf()
    def classify_age(age):
        if int(age) < 18:
            return "minor"
        elif int(age) < 65:
            return "adult"
        else:
            return "senior"

    create_function(spark, fahrenheit_to_celsius)
    create_function(spark, classify_age)
    try:
        out = chs.query(
            spark,
            "SELECT fahrenheit_to_celsius(212.0) AS c, classify_age(30) AS g",
            "Pandas",
        )
        assert abs(out["c"].iloc[0] - 100.0) < 1e-9
        assert out["g"].iloc[0] == "adult"
        # in a file() query like the doc's weather example
        out = chs.query(
            spark,
            f"SELECT classify_age(id + 10) AS grp, count() AS cnt "
            f"FROM file('{data}/users.parquet', Parquet) "
            f"GROUP BY grp ORDER BY cnt DESC",
            "Pandas",
        )
        assert set(out["grp"]) <= {"minor", "adult", "senior"}
        assert out["cnt"].sum() == 20
    finally:
        drop_function(spark, "fahrenheit_to_celsius")
        drop_function(spark, "classify_age")


def test_example8_streaming_format_bytes(spark):
    # the doc's exact shape: format="CSV", chunks are bytes, count newlines
    from chdb_spark.stateful import Session

    with Session(spark=spark) as sess:
        iterator = sess.send_query(
            "SELECT * FROM numbers(200000)", format="CSV", max_rows_per_chunk=50000
        )
        row_count = 0
        n_chunks = 0
        for chunk in iterator:
            assert isinstance(chunk, bytes)
            row_count += chunk.count(b"\n")
            n_chunks += 1
        assert row_count == 200000
        assert n_chunks >= 4


def test_quickstart_rst_first_query(spark):
    """docs/quickstart.rst:10-23 — first query + exact CSV output."""
    import chdb_spark as chdb

    result = chdb.query("SELECT 1 as id, 'Hello World' as message", "CSV")
    # the quickstart prose prints the strings unquoted; the engine (like
    # ClickHouse's actual CSV writer) quotes string cells
    assert str(result).strip() == '1,"Hello World"' 


def test_quickstart_rst_connection_api(spark):
    """docs/quickstart.rst:25-46 — connection-based API, cursor iteration."""
    import chdb_spark as chdb

    conn = chdb.connect(":memory:")
    cur = conn.cursor()
    cur.execute("SELECT number, toString(number) as str FROM system.numbers LIMIT 3")
    rows = [row for row in cur]
    assert rows == [(0, "0"), (1, "1"), (2, "2")]
    conn.close()


def test_quickstart_rst_output_formats(spark):
    """docs/quickstart.rst:48-86 — DataFrame / ArrowTable / Pretty."""
    import chdb_spark as chdb

    df = chdb.query("SELECT number, number*2 as doubled FROM numbers(5)", "DataFrame")
    # reference call-shape: "DataFrame" returns pandas (chdb query_df)
    assert type(df).__module__.startswith("pandas")
    assert list(df["doubled"]) == [0, 2, 4, 6, 8]
    table = chdb.query("SELECT number FROM numbers(1000)", "ArrowTable")
    assert type(table).__module__.startswith("pyarrow")
    assert len(table) == 1000
    assert len(df) == 5 and "number" in df.columns
    pretty = chdb.query(
        "SELECT 'Alice' as name, 25 as age UNION ALL SELECT 'Bob', 30", "Pretty"
    )
    assert "Alice" in str(pretty) and "Bob" in str(pretty)


def test_quickstart_rst_file_queries(spark, tmp_path):
    """docs/quickstart.rst:88-125 — file() over CSV/JSONEachRow/Parquet."""
    import pandas as real_pd

    import chdb_spark as chdb

    csv = tmp_path / "data.csv"
    real_pd.DataFrame({"column_name": [1.0, 2.0, 3.0]}).to_csv(csv, index=False)
    out = chdb.query(
        f"SELECT count(*) AS n, avg(column_name) AS a FROM file('{csv}', 'CSVWithNames')"
    )
    # ClickHouse prints integral Float64 without the trailing .0
    assert str(out).strip() == "3,2"

    pq = tmp_path / "employees.parquet"
    real_pd.DataFrame(
        {"department": ["x", "y", "x"], "salary": [10, 20, 30]}
    ).to_parquet(pq)
    out = chdb.query(
        f"""
        SELECT department, sum(salary) as total_salary
        FROM file('{pq}', 'Parquet')
        GROUP BY department
        ORDER BY total_salary DESC
        """
    )
    assert [l for l in str(out).splitlines() if l] == ['"x",40', '"y",20']


def test_quickstart_rst_python_df_and_persistence(spark, tmp_path):
    """docs/quickstart.rst:135-205 — Python(df), persistent DDL via cursor,
    error handling with chdb.ChdbError."""
    import pandas as real_pd

    import chdb_spark as chdb

    df = real_pd.DataFrame(
        {
            "product": ["A", "B", "C", "A", "B"],
            "sales": [100, 200, 150, 300, 250],
            "region": ["North", "South", "North", "South", "North"],
        }
    )
    result = chdb.query(
        """
        SELECT product, region, sum(sales) as total_sales, avg(sales) as avg_sales
        FROM Python(df)
        GROUP BY product, region
        ORDER BY total_sales DESC
        """,
        "Pandas",
    )
    assert list(result["total_sales"]) == [300, 250, 200, 150, 100]

    conn = chdb.connect(str(tmp_path / "my_database.chdb"))
    cur = conn.cursor()
    cur.execute(
        """
        CREATE TABLE IF NOT EXISTS users (
            id UInt32, name String, email String
        ) ENGINE = MergeTree() ORDER BY id
        """
    )
    cur.execute("INSERT INTO users VALUES (1, 'Alice', 'alice@example.com')")
    cur.execute("INSERT INTO users VALUES (2, 'Bob', 'bob@example.com')")
    cur.execute("SELECT * FROM users ORDER BY id")
    assert [row for row in cur] == [
        (1, "Alice", "alice@example.com"),
        (2, "Bob", "bob@example.com"),
    ]
    conn.close()

    import pytest as _pytest

    with _pytest.raises(chdb.ChdbError):
        chdb.query("SELECT invalid_column FROM non_existent_table")


def test_skill_verify_install_checks(spark, tmp_path):
    """The reference's own install-verification script
    (agent/skills/chdb-sql/scripts/verify_install.py + the DataStore one),
    adapted only in the import name."""
    import chdb_spark as chdb

    assert hasattr(chdb, "__version__")
    assert "2" in chdb.query("SELECT 1 + 1 AS answer").data()
    df = chdb.query("SELECT number FROM numbers(5)", "DataFrame")
    assert len(df) == 5 and "number" in df.columns
    from chdb_spark import session as chs

    sess = chs.Session(str(tmp_path / "verifydb"))
    sess.query("CREATE TABLE _verify_test (id UInt64) ENGINE = Memory")
    sess.query("INSERT INTO _verify_test VALUES (1), (2), (3)")
    assert "3" in str(sess.query("SELECT count() AS cnt FROM _verify_test", fmt="CSV"))
    sess.close()
    out = chdb.query(
        "SELECT {x:UInt64} + {y:UInt64} AS sum", params={"x": 10, "y": 20}
    )
    assert "30" in out.data()

    from chdb_spark.datastore import DataStore

    ds = DataStore({"name": ["Alice", "Bob", "Carol"], "age": [25, 30, 35]})
    assert ds[ds["age"] > 25].count() == 2
