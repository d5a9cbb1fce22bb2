"""Durable Analytical Object tests (reference chdb/durable) — WAL replay,
checkpoint restore, lease fencing, namespace scan."""

from __future__ import annotations

import json
import os

import pytest

from chdb_spark.durable import (
    DurableError,
    LeaseError,
    LocalBackend,
    Namespace,
    validate_oid,
)


@pytest.fixture()
def ns(spark, tmp_path):
    return Namespace(str(tmp_path / "store"), owner="worker-1", spark=spark)


def test_backend_cas_fencing(tmp_path):
    be = LocalBackend(str(tmp_path / "be"))
    assert be.get_with_etag("head.json") == (None, None)
    e1 = be.replace_if_match("head.json", b"v1", None)
    assert e1 is not None
    # stale etag (None = "expect absent") must be fenced
    assert be.replace_if_match("head.json", b"v2", None) is None
    e2 = be.replace_if_match("head.json", b"v2", e1)
    assert e2 is not None and e2 != e1
    assert be.replace_if_match("head.json", b"v3", e1) is None


def test_validate_oid():
    assert validate_oid("user-123") == "user-123"
    assert validate_oid("tenant/user") == "tenant/user"
    for bad in ("", "a b", "../x", "x/../y"):
        with pytest.raises(DurableError):
            validate_oid(bad)


def test_wal_replay_roundtrip(ns):
    with ns.open("user-1") as obj:
        obj.execute("CREATE TABLE beliefs (k STRING, v INT)")
        obj.execute("INSERT INTO beliefs VALUES ('a', 1), ('b', 2)")
        obj.flush()
    # reopen: restore = WAL replay (no checkpoint yet)
    with ns.open("user-1") as obj2:
        rows = obj2.query("SELECT * FROM beliefs ORDER BY k").collect()
        assert [(r.k, r.v) for r in rows] == [("a", 1), ("b", 2)]


def test_checkpoint_folds_wal(ns):
    with ns.open("user-2") as obj:
        obj.execute("CREATE TABLE t AS SELECT id FROM range(100)")
        ck = obj.checkpoint()
        assert ck.startswith("checkpoints/")
        assert obj.wal == []
        obj.execute("INSERT INTO t SELECT id + 100 FROM range(10)")
        obj.flush()
    with ns.open("user-2") as obj2:
        assert obj2.base is not None
        assert len(obj2.wal) == 1  # only post-checkpoint writes replayed
        assert obj2.query("SELECT count(*) AS c FROM t").first().c == 110


def test_lease_fences_second_writer(ns):
    obj = ns.open("user-3", lease_ttl=60)
    try:
        with pytest.raises(LeaseError):
            ns.open("user-3")
        # read-only open is allowed while a writer holds the lease
        ro = ns.open("user-3", read_only=True)
        ro.close()
        # force steals the lease; the old writer is fenced on next commit
        thief = ns.open("user-3", force=True)
        obj._buf.append("SELECT 1")
        with pytest.raises(LeaseError):
            obj.flush()
        thief.close()
    finally:
        obj.session and obj.session.close()


def test_read_only_rejects_writes(ns):
    with ns.open("user-4") as obj:
        obj.execute("CREATE TABLE x AS SELECT 1 AS a")
    ro = ns.open("user-4", read_only=True)
    with pytest.raises(DurableError):
        ro.execute("INSERT INTO x VALUES (2)")
    ro.close()


def test_namespace_scan(ns):
    for oid, val in (("scan-a", 10), ("scan-b", 20)):
        with ns.open(oid) as obj:
            obj.execute(f"CREATE TABLE m AS SELECT {val} AS v")
    results = ns.scan("SELECT v FROM m", ids=["scan-a", "scan-b"])
    assert [(oid, int(pdf["v"][0])) for oid, pdf in results] == [
        ("scan-a", 10),
        ("scan-b", 20),
    ]


def test_destroy_respects_lease(ns):
    obj = ns.open("user-5")
    obj.execute("CREATE TABLE z AS SELECT 1 AS a")
    with pytest.raises(LeaseError):
        ns.destroy("user-5")
    ns.destroy("user-5", force=True)
    obj.session.close()
    with pytest.raises(DurableError):
        ns.open("user-5", read_only=True)


def test_head_structure(ns, tmp_path):
    with ns.open("user-6", lease_ttl=30) as obj:
        obj.execute("CREATE TABLE h AS SELECT 1 AS a")
        obj.flush()
    data, _ = ns.backend.get_with_etag("user-6/head.json")
    head = json.loads(data)
    assert head["lease"]["owner"] == "worker-1"
    assert head["manifest"]["seq"] == 1
    assert len(head["manifest"]["wal"]) == 1
    wal_key = head["manifest"]["wal"][0]
    wal, _ = ns.backend.get_with_etag(f"user-6/{wal_key}")
    stmts = [json.loads(l)["sql"] for l in wal.decode().splitlines()]
    assert any("CREATE TABLE h" in s for s in stmts)


def test_suspend_flushes_but_keeps_lease(tmp_path, spark):
    from chdb_spark import durable

    ns = durable.Namespace(f"file://{tmp_path}/store", owner="w1", spark=spark)
    obj = ns.open("doc1")
    try:
        obj.execute("CREATE TABLE s (a Int64) ENGINE = MergeTree ORDER BY a")
        obj.execute("INSERT INTO s VALUES (3)")
        obj.suspend()  # buffered writes persisted, lease retained
        assert obj.query("SELECT a FROM s", fmt="Pandas")["a"].tolist() == [3]
        obj.execute("INSERT INTO s VALUES (4)")  # still writable after suspend
    finally:
        obj.close()
