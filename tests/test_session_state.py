"""Stateful Session tests (reference docs/session.rst:26-95) — DDL state,
restart persistence via the manifest, output formats, streaming results."""

from __future__ import annotations

import os

import pytest

from chdb_spark.stateful import Session, StreamingResult


def test_temporary_session_ddl_and_cleanup(spark):
    sess = Session(spark=spark)
    db = sess.db
    sess.query("CREATE TABLE log_t AS SELECT * FROM VALUES ('a',1),('b',3) AS t(x, y)")
    sess.query("CREATE VIEW v_t AS SELECT x FROM log_t WHERE y > 1")
    rows = sess.query("SELECT * FROM v_t").collect()
    assert [r.x for r in rows] == ["b"]
    sess.close()
    assert not spark.catalog.databaseExists(db)


def test_file_session_persists_across_reopen(spark, tmp_path):
    path = str(tmp_path / "mydb")
    with Session(path, spark=spark) as sess:
        sess.query(
            "CREATE TABLE users AS "
            "SELECT * FROM VALUES (1,'Alice'),(2,'Bob') AS t(id, name)"
        )
        db = sess.db
    # simulate restart: drop the catalog database entirely, then reopen
    spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")
    with Session(path, spark=spark) as sess2:
        rows = sess2.query("SELECT * FROM users ORDER BY id").collect()
        assert [(r.id, r.name) for r in rows] == [(1, "Alice"), (2, "Bob")]
    assert os.path.exists(os.path.join(path, "_chdb_spark_session.json"))


def test_session_view_restored(spark, tmp_path):
    path = str(tmp_path / "viewdb")
    with Session(path, spark=spark) as sess:
        sess.query("CREATE TABLE base AS SELECT * FROM VALUES (1),(2),(3) AS t(n)")
        sess.query("CREATE VIEW big AS SELECT n FROM base WHERE n >= 2")
        db = sess.db
    spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")
    with Session(path, spark=spark) as sess2:
        assert sess2.query("SELECT count(*) AS c FROM big").first().c == 2


def test_output_formats(spark):
    with Session(spark=spark) as sess:
        pdf = sess.query("SELECT 1 AS a, 'x' AS b", fmt="pandas")
        assert list(pdf.columns) == ["a", "b"]
        tbl = sess.query("SELECT 1 AS a", fmt="arrow")
        assert tbl.num_rows == 1
        # ClickHouse CSV semantics: no header row; CSVWithNames adds it
        csv = sess.query("SELECT 1 AS a, 2 AS b", fmt="CSV")
        assert csv == "1,2\n"
        csvn = sess.query("SELECT 1 AS a, 2 AS b", fmt="CSVWithNames")
        assert csvn.splitlines()[0] == '"a","b"'  # CH quotes CSV header names
        js = sess.query("SELECT 1 AS a", fmt="JSONEachRow")
        assert js == '{"a": 1}\n'
        with pytest.raises(ValueError):
            sess.query("SELECT 1", fmt="Pretty2")


def test_send_query_streaming(spark):
    with Session(spark=spark) as sess:
        sess.query("CREATE TABLE nums AS SELECT id FROM range(10000)")
        sr = sess.send_query("SELECT id FROM nums", max_rows_per_chunk=3000)
        assert isinstance(sr, StreamingResult)
        chunks = [len(c) for c in sr]
        assert sum(chunks) == 10000
        assert max(chunks) <= 3000
        # early close
        sr2 = sess.send_query("SELECT id FROM nums", max_rows_per_chunk=100)
        first = sr2.fetch()
        assert len(first) == 100
        sr2.close()
        assert sr2.fetch() is None


def test_connection_string_forms(spark, tmp_path):
    p = str(tmp_path / "opt.db")
    sess = Session(f"file:{p}?mode=ro&verbose", spark=spark)
    assert sess.options.get("mode") == "ro"
    assert "verbose" in sess.options
    assert sess.path == p
    sess.close()


def test_closed_session_raises(spark):
    sess = Session(spark=spark)
    sess.close()
    with pytest.raises(RuntimeError):
        sess.query("SELECT 1")


def test_session_level_set_settings(spark):
    """CH `SET key = value` persists for the session and applies to later
    queries' rendering; a query-level SETTINGS clause overrides it."""
    from chdb_spark.stateful import Session

    with Session(spark=spark) as sess:
        out = sess.query("SET output_format_json_quote_64bit_integers = 0", fmt="CSV")
        assert out == ""
        got = sess.query("SELECT CAST(7 AS BIGINT) AS v", fmt="JSONEachRow")
        import json as _json

        assert _json.loads(got) == {"v": 7}  # unquoted per session setting
        # query-level SETTINGS wins over the session value
        got = sess.query(
            "SELECT CAST(7 AS BIGINT) AS v "
            "SETTINGS output_format_json_quote_64bit_integers=1",
            fmt="JSONEachRow",
        )
        assert _json.loads(got) == {"v": "7"}


def test_mutations_alter_delete_update_truncate(spark):
    """CH mutation statements (ALTER TABLE … DELETE/UPDATE, TRUNCATE —
    public ClickHouse ALTER surface) execute as table rewrites:
    localCheckpoint snapshot → positional INSERT OVERWRITE."""
    from chdb_spark.stateful import Session

    s = Session()
    try:
        s.query("CREATE TABLE mut_t (id Int64, v String) ENGINE = MergeTree ORDER BY id")
        s.query("INSERT INTO mut_t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        s.query("ALTER TABLE mut_t DELETE WHERE id = 2")
        assert s.query("SELECT id FROM mut_t ORDER BY id", "CSV").strip() == "1\n3"
        # CH function names in the assignment go through the dialect
        s.query("ALTER TABLE mut_t UPDATE v = upper(v) WHERE id = 3")
        assert s.query("SELECT v FROM mut_t ORDER BY id", "CSV").strip() == '"a"\n"C"'
        # multi-assignment with an expression containing a comma in parens
        s.query("ALTER TABLE mut_t UPDATE v = concat(v, '!'), id = id + 10 WHERE id >= 3")
        assert s.query("SELECT id, v FROM mut_t ORDER BY id", "CSV").strip() == '1,"a"\n13,"C!"'
        s.query("TRUNCATE TABLE mut_t")
        assert s.query("SELECT count(*) FROM mut_t", "CSV").strip() == "0"
        # non-matching WHERE mutates nothing
        s.query("INSERT INTO mut_t VALUES (7, 'x')")
        s.query("ALTER TABLE mut_t DELETE WHERE id = 99")
        assert s.query("SELECT count(*) FROM mut_t", "CSV").strip() == "1"
    finally:
        s.close()


def test_schema_change_alters(spark):
    """ALTER TABLE ADD/DROP/RENAME COLUMN on external parquet session
    tables (Spark v1 rejects these natively — the session rewrites the
    files at the same location and re-registers). CH types map through
    the dialect (Float64 → DOUBLE, Array(String) → ARRAY<STRING>)."""
    from chdb_spark.stateful import Session

    s = Session()
    try:
        s.query("CREATE TABLE sc_t (id Int64, v String) ENGINE = MergeTree ORDER BY id")
        s.query("INSERT INTO sc_t VALUES (1, 'a'), (2, 'b')")
        s.query("ALTER TABLE sc_t ADD COLUMN w Float64 DEFAULT 1.5")
        assert s.query("SELECT sum(w) FROM sc_t", "CSV").strip() in ("3", "3.0")
        s.query("ALTER TABLE sc_t DROP COLUMN v")
        s.query("ALTER TABLE sc_t RENAME COLUMN w TO weight")
        out = s.query("SELECT * FROM sc_t ORDER BY id", "DataFrame")
        assert out.columns == ["id", "weight"]
        s.query("ALTER TABLE sc_t ADD COLUMN tags Array(String)")
        assert dict(s.query("SELECT * FROM sc_t", "DataFrame").dtypes)["tags"] == "array<string>"
        # idempotent IF NOT EXISTS / existing column
        s.query("ALTER TABLE sc_t ADD COLUMN IF NOT EXISTS tags Array(String)")
        assert s.query("SELECT count(*) FROM sc_t", "CSV").strip() == "2"
    finally:
        s.close()


def test_insert_from_infile(spark, tmp_path):
    """CH `INSERT INTO … FROM INFILE 'path' FORMAT Fmt` (the statement the
    reference's cc_backend insert path emits, chdb/cc_backend.py:840):
    distributed file read, positional column mapping, NULL-fill for
    unlisted columns."""
    from chdb_spark.stateful import Session

    s = Session()
    try:
        s.query("CREATE TABLE inf_t (id Int64, v String) ENGINE = MergeTree ORDER BY id")
        p = tmp_path / "x.csv"
        p.write_text("10,aa\n20,bb\n")
        s.query(f"INSERT INTO inf_t FROM INFILE '{p}' FORMAT CSV")
        assert s.query("SELECT id FROM inf_t ORDER BY id", "CSV").strip() == "10\n20"
        p2 = tmp_path / "y.csv"
        p2.write_text("id\n77\n")
        s.query(f"INSERT INTO inf_t (id) FROM INFILE '{p2}' FORMAT CSVWithNames")
        out = s.query("SELECT id, v FROM inf_t ORDER BY id", "DataFrame").collect()
        assert [(r.id, r.v) for r in out] == [(10, "aa"), (20, "bb"), (77, None)]
        pq = tmp_path / "z.parquet"
        import pandas as pd

        pd.DataFrame({"id": [99], "v": ["zz"]}).to_parquet(pq)
        s.query(f"INSERT INTO inf_t FROM INFILE '{pq}' FORMAT Parquet")
        assert s.query("SELECT count(*) FROM inf_t", "CSV").strip() == "4"
    finally:
        s.close()


def test_derived_shuffle_partitions_scale_adaptive():
    # guide §2.4: shuffle sizing follows the session's core count (2x,
    # AQE coalesces down) instead of a constant tuned to one machine;
    # cluster masters defer to spark-submit / Spark defaults.
    import os

    from chdb_spark.session import _derived_shuffle_partitions as d

    assert d("local[32]") == 64
    assert d("local[8]") == 16
    assert d("local[1]") == 8  # floored: never fewer than 8
    assert d("local[2,3]") == 8  # local[N,maxFailures] form
    assert d("local[*]") == max(2 * (os.cpu_count() or 8), 8)
    assert d(None) is None
    assert d("spark://host:7077") is None
