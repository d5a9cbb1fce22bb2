"""MongoDB / Redis table functions over the Spark Python Data Source API.

Reference surface: ``mongodb(host, database, collection, user, password
[, structure])`` and ``redis(host, key, structure[, password, db_index])``
table functions (reference datastore/table_functions.py:668,722;
core.py:2359,2598 — read-only Mongo, key-value Redis with a declared
structure). Here each becomes a Spark 4 Python data source: the client
connects INSIDE executor tasks (no driver-side materialization), rows
arrive Arrow-batched, and partition planning shards the scan.

Scale design:
* Mongo: the driver plans ``n_partitions`` range filters over a shard key
  (default ``_id``) using client-side quantile sampling — each executor
  task opens its own cursor over one range (the same split strategy as the
  official mongo-spark connector's sampling partitioner). A collection
  that cannot be sampled falls back to one partition, explicitly.
* Redis: one partition per SCAN stream. Redis's cursor-based SCAN cannot
  be sharded on a single node, so n_partitions defaults to 1 (the honest
  single-stream case); against Redis Cluster each partition scans one
  node's slot range.

The wire clients (pymongo / redis) are not installed in this container —
the client FACTORY travels cloudpickled in the source options, so tests
inject dict-backed fakes and exercise the full executor-side read path;
with real servers the default factories import the real clients and raise
a clear ImportError when absent.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# ---------------------------------------------------------------------------
# CH structure string → Spark DDL  ("key String, v Int64" → "key string, ...")
# ---------------------------------------------------------------------------

_CH2SPARK = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "float32": "float",
    "float64": "double",
    "string": "string",
    "fixedstring": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "date",
    "date32": "date",
    "datetime": "timestamp",
    "datetime64": "timestamp",
    "uuid": "string",
}


def structure_to_ddl(structure: str) -> str:
    """'key String, v1 Int64' (reference redis()/mongodb() structure param)
    → Spark DDL. Nullable(T) unwraps — Spark columns are nullable anyway."""
    cols = []
    for part in structure.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, ch_t = part.partition(" ")
        t = ch_t.strip()
        if t.lower().startswith("nullable(") and t.endswith(")"):
            t = t[9:-1]
        base = t.split("(")[0].strip().lower()
        spark_t = _CH2SPARK.get(base)
        if spark_t is None:
            raise ValueError(f"unsupported type in structure: {t!r} (column {name})")
        cols.append(f"{name} {spark_t}")
    if not cols:
        raise ValueError("empty structure string")
    return ", ".join(cols)


def _coerce(value, spark_type: str):
    """Bytes/str from the store → the declared column type."""
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        value = bytes(value).decode("utf-8", "replace")
    t = spark_type.split("(")[0]
    if t in ("tinyint", "smallint", "int", "bigint", "decimal"):
        return int(value)
    if t in ("float", "double"):
        return float(value)
    if t == "boolean":
        return value in (True, 1, "1", "true", "True")
    return str(value) if not isinstance(value, str) else value


def _encode_obj(obj) -> str:
    import base64

    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(obj)).decode("ascii")


def _decode_obj(blob: str):
    import base64

    from pyspark import cloudpickle

    return cloudpickle.loads(base64.b64decode(blob))


# ---------------------------------------------------------------------------
# MongoDB
# ---------------------------------------------------------------------------


def _default_mongo_factory(host: str, user: str, password: str):
    def connect():
        try:
            import pymongo
        except ImportError as e:  # pragma: no cover - client absent here
            raise ImportError(
                "mongodb() needs the pymongo client (pip install pymongo)"
            ) from e
        cred = f"{user}:{password}@" if user else ""
        return pymongo.MongoClient(f"mongodb://{cred}{host}/")

    return connect


def plan_mongo_ranges(collection, split_key: str, n_partitions: int) -> list[tuple]:
    """Driver-side partition planning: sample ``split_key`` quantiles to cut
    the keyspace into ``n_partitions`` half-open ranges [(lo, hi), ...] with
    None at the open ends. Falls back to a single full range when the
    collection is too small to sample. ``collection`` is any object with
    ``aggregate`` (pymongo or a test fake)."""
    if n_partitions <= 1:
        return [(None, None)]
    try:
        sampled = list(
            collection.aggregate(
                [
                    {"$sample": {"size": n_partitions * 20}},
                    {"$project": {split_key: 1}},
                    {"$sort": {split_key: 1}},
                ]
            )
        )
    except Exception:
        return [(None, None)]
    keys = [d.get(split_key) for d in sampled if d.get(split_key) is not None]
    if len(keys) < n_partitions:
        return [(None, None)]
    keys.sort()
    cuts = [keys[(i * len(keys)) // n_partitions] for i in range(1, n_partitions)]
    # dedupe (heavy skew can repeat a cut value; ranges must stay disjoint)
    uniq = sorted(set(cuts))
    bounds = [None] + uniq + [None]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


class _MongoPartition(InputPartition):
    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi


class _MongoSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chdb_mongodb"

    def schema(self):
        return self.options["ddl"]

    def reader(self, schema) -> DataSourceReader:
        return _MongoReader(self.options, schema)


class _MongoReader(DataSourceReader):
    def __init__(self, options, schema):
        self._o = dict(options)
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        factory = _decode_obj(self._o["factory_pickle"])
        client = factory()
        coll = client[self._o["database"]][self._o["collection"]]
        ranges = plan_mongo_ranges(
            coll, self._o.get("split_key", "_id"), int(self._o.get("partitions", "1"))
        )
        return [_MongoPartition(lo, hi) for lo, hi in ranges]

    def read(self, partition: _MongoPartition) -> Iterator[tuple]:
        factory = _decode_obj(self._o["factory_pickle"])
        client = factory()
        coll = client[self._o["database"]][self._o["collection"]]
        split_key = self._o.get("split_key", "_id")
        flt = {}
        if partition.lo is not None:
            flt.setdefault(split_key, {})["$gte"] = partition.lo
        if partition.hi is not None:
            flt.setdefault(split_key, {})["$lt"] = partition.hi
        fields = [f.name for f in self._schema.fields]
        types = [f.dataType.simpleString() for f in self._schema.fields]
        for doc in coll.find(flt):
            yield tuple(_coerce(doc.get(c), t) for c, t in zip(fields, types))


def mongodb(
    spark: SparkSession,
    host: str,
    database: str,
    collection: str,
    user: str = "",
    password: str = "",
    structure: str = "_id String",
    n_partitions: int = 1,
    split_key: str = "_id",
    client_factory=None,
) -> DataFrame:
    """Read a MongoDB collection (reference mongodb() table function,
    datastore/table_functions.py:668 — read-only). ``structure`` declares
    the projected columns CH-style; ``client_factory`` overrides the
    pymongo connection for tests/custom auth."""
    try:
        spark.dataSource.register(_MongoSource)
    except Exception:
        pass
    factory = client_factory or _default_mongo_factory(host, user, password)
    return (
        spark.read.format("chdb_mongodb")
        .option("database", database)
        .option("collection", collection)
        .option("ddl", structure_to_ddl(structure))
        .option("partitions", str(n_partitions))
        .option("split_key", split_key)
        .option("factory_pickle", _encode_obj(factory))
        .load()
    )


# ---------------------------------------------------------------------------
# Redis
# ---------------------------------------------------------------------------


def _default_redis_factory(host: str, password: str | None, db_index: int):
    def connect():
        try:
            import redis as redis_client
        except ImportError as e:  # pragma: no cover - client absent here
            raise ImportError(
                "redis() needs the redis client (pip install redis)"
            ) from e
        h, _, p = host.partition(":")
        return redis_client.Redis(
            host=h, port=int(p or 6379), password=password, db=db_index
        )

    return connect


class _RedisPartition(InputPartition):
    def __init__(self, index: int, total: int):
        self.index = index
        self.total = total


class _RedisSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chdb_redis"

    def schema(self):
        return self.options["ddl"]

    def reader(self, schema) -> DataSourceReader:
        return _RedisReader(self.options, schema)


class _RedisReader(DataSourceReader):
    def __init__(self, options, schema):
        self._o = dict(options)
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        n = int(self._o.get("partitions", "1"))
        return [_RedisPartition(i, n) for i in range(n)]

    def read(self, partition: _RedisPartition) -> Iterator[tuple]:
        import zlib

        factory = _decode_obj(self._o["factory_pickle"])
        client = factory()
        fields = [f.name for f in self._schema.fields]
        types = [f.dataType.simpleString() for f in self._schema.fields]
        key_col = self._o["key"]
        match = self._o.get("match", "*")
        for k in client.scan_iter(match=match):
            key_str = k.decode("utf-8", "replace") if isinstance(k, (bytes, bytearray)) else str(k)
            # shard by stable key hash so multi-partition reads split the
            # keyspace (each partition pays a full SCAN of keys but fetches
            # only its share of values — honest single-node tradeoff)
            if partition.total > 1 and zlib.crc32(key_str.encode()) % partition.total != partition.index:
                continue
            h = client.hgetall(k)
            hh = {
                (kk.decode("utf-8", "replace") if isinstance(kk, (bytes, bytearray)) else kk): vv
                for kk, vv in h.items()
            }
            yield tuple(
                _coerce(key_str if c == key_col else hh.get(c), t)
                for c, t in zip(fields, types)
            )


def redis_table(
    spark: SparkSession,
    host: str,
    key: str,
    structure: str,
    password: str | None = None,
    db_index: int = 0,
    n_partitions: int = 1,
    match: str = "*",
    client_factory=None,
) -> DataFrame:
    """Read Redis hashes as rows (reference redis() table function,
    datastore/table_functions.py:722): each Redis key is one row; ``key``
    names the primary-key column inside ``structure``; remaining columns
    come from the hash's fields."""
    try:
        spark.dataSource.register(_RedisSource)
    except Exception:
        pass
    factory = client_factory or _default_redis_factory(host, password, db_index)
    return (
        spark.read.format("chdb_redis")
        .option("key", key)
        .option("ddl", structure_to_ddl(structure))
        .option("partitions", str(n_partitions))
        .option("match", match)
        .option("factory_pickle", _encode_obj(factory))
        .load()
    )


def fake_mongo_client_factory(docs: list[dict]):
    """Minimal pymongo-shaped client over a doc list — the mongodb()
    analogue of ``fake_sql_connection_factory`` (no server in this
    container; only the wire hop is faked — sampling probe, _id-range
    find(), BSON-ish doc decode all run for real). Closure-defined so
    cloudpickle ships it by value to executors."""

    def connect():
        class Coll:
            def aggregate(self, pipeline):
                size = pipeline[0]["$sample"]["size"]
                return sorted(docs, key=lambda d: d["_id"])[:size]

            def find(self, flt):
                lo = flt.get("_id", {}).get("$gte")
                hi = flt.get("_id", {}).get("$lt")
                for d in sorted(docs, key=lambda d: d["_id"]):
                    if lo is not None and d["_id"] < lo:
                        continue
                    if hi is not None and d["_id"] >= hi:
                        continue
                    yield d

        class DB(dict):
            def __getitem__(self, name):
                return Coll()

        class Client(dict):
            def __getitem__(self, name):
                return DB()

        return Client()

    return connect


def fake_redis_client_factory(kv: dict[str, dict]):
    """Minimal redis-py-shaped client over a hash dict — scan_iter +
    hgetall, byte-encoded like the real client."""

    def connect():
        class Client:
            def scan_iter(self, match="*"):
                for k in sorted(kv):
                    yield k.encode()

            def hgetall(self, k):
                key = k.decode() if isinstance(k, bytes) else k
                return {f.encode(): str(v).encode() for f, v in kv[key].items()}

        return Client()

    return connect
