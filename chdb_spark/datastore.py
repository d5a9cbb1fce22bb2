"""DataStore — the lazy pandas-style fluent API over Spark DataFrames.

The reference's main user surface is ``DataStore`` (datastore/core.py, 9115
LoC): a lazy pandas-compatible frame that records ops and compiles them to
SQL segments at trigger time (AGENTS.md:14-38). On Spark the host engine is
already lazy and whole-plan-optimizing, so this layer is a THIN adapter:
every method maps 1:1 onto DataFrame/Column operations and Catalyst replaces
the reference's QueryPlanner/SQLBuilder machinery entirely (SURVEY.md §7.8).

API parity map (reference file:line → here):
  select/filter/where        core.py:6231,6293,6470
  assign / ds['c']=expr      core.py:7129,6827
  drop/rename/add_prefix/suffix  lazy_ops.py:522,543,593,614
  fillna/dropna/astype/replace   lazy_ops.py:635,663,720; pandas_compat.py:1239
  sort_values/orderby        core.py:7387,7475
  head/tail/limit/offset     core.py:3961,3992,7501,7510
  distinct/drop_duplicates   core.py:7518; sql_executor.py:900-911
  groupby → agg/size/nunique…    groupby.py:48-971
  join/merge                 core.py:6670; pandas_api.py:1099
  merge_asof                 pandas_api.py:1176 → operators.asof
  union/concat               core.py:6773; pandas_api.py:1036
  isin/between/query         pandas_compat.py:744,837
  when/case builder          core.py:6539; case_when.py:41
  explode/melt/value_counts  pandas_compat.py:1616,1553,1039
  sample                     core.py:4054
  describe                   pandas_compat (describe)
  sql passthrough            core.py:6622
  explain                    core.py:707

Row-order note: like SQL (and unlike pandas), ops do not promise a stable
row order until an explicit sort — the reference burns significant
machinery on order emulation (connection.py:461-860); we follow SURVEY §1.4
and keep the core order-agnostic.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class DataStore:
    """Lazy fluent frame. Immutable: every method returns a new DataStore."""

    def __init__(self, df: DataFrame | str = None, **target):
        if isinstance(df, str):
            # source/target-descriptor form (reference api-reference.md:264
            # and examples/example_table_functions.py): DataStore("file",
            # path=..., format=...) / DataStore("s3", url=...) / any
            # table-function kind. Dual-role like the reference: a lazy
            # READ source (materialized through table_functions.create_
            # table_function(...).read() on first data access) AND the
            # write TARGET for insert_into/select_from.
            from chdb_spark.table_functions import _ALIASES, TableFunction

            kind = df.lower()
            if _ALIASES.get(kind, kind) not in TableFunction._SHAPES:
                raise ValueError(f"source/target kind {df!r} not supported")
            self._df_store = None
            self._target = dict(target)
            self._target_kind = kind
            self._format_settings: dict = {}
            return
        self._target_kind = None
        self._format_settings = {}
        if isinstance(df, dict):
            # reference DataStore({"col": [...]}) literal-data constructor
            # (skills verify_install.py: DataStore({'name': [...], ...}))
            import pandas as _pd

            df = _pd.DataFrame(df)
        if df is not None and type(df).__module__.startswith("pandas"):
            # reference chdb/__init__.py:121 to_datastore(df): DataStore
            # wraps a pandas frame directly (Arrow-accelerated ingest)
            from chdb_spark.session import get_spark

            df = get_spark().createDataFrame(df)
        self._df = df
        self._target = None

    # -- lazy source materialization ----------------------------------------

    @property
    def _df(self) -> DataFrame:
        if getattr(self, "_df_store", None) is None and self._target is not None:
            from chdb_spark.table_functions import create_table_function

            params = dict(self._target)
            # the few CH format settings with a direct reader analogue
            delim = self._format_settings.get("format_csv_delimiter")
            fmt_l = (params.get("format") or "").lower()
            if delim and fmt_l.startswith(("csv", "tsv", "tabseparated")):
                from chdb_spark.sources import read_auto
                from chdb_spark.session import get_spark

                path = params.get("path") or params.get("url") or params.get("uri")
                out = read_auto(
                    get_spark(), path, fmt="csv", sep=delim,
                    header=str("withnames" in fmt_l).lower(),
                    inferSchema="true",
                )
            else:
                out = create_table_function(self._target_kind, **params).read()
            self._df_store = out
        return self._df_store

    @_df.setter
    def _df(self, value) -> None:
        self._df_store = value

    def connect(self, test_connection: bool = True) -> "DataStore":
        """reference core.py:2958 — establish the connection. The Spark
        session IS the connection here; with test_connection a source-form
        DataStore materializes its schema (probing the source)."""
        if test_connection and self._target is not None:
            _ = self._df.schema
        return self

    def with_format_settings(self, **settings) -> "DataStore":
        """reference core.py:2928 — format-specific read settings.
        ``format_csv_delimiter`` maps onto the reader; the remaining CH
        knobs configure engine behavior Spark's reader already owns and
        are accepted as recorded no-ops (same acceptance contract as
        SETTINGS in session.query)."""
        out = DataStore.__new__(DataStore)
        out.__dict__.update(self.__dict__)
        out._format_settings = {**self._format_settings, **settings}
        out._df_store = None if self._target is not None else self._df_store
        return out

    def execute(self):
        """reference core.py:3495 — run and return a result object with
        rows/column_names/row_count (QueryResult shape)."""
        from types import SimpleNamespace

        pdf = self.to_df()
        return SimpleNamespace(
            data=pdf,
            rows=[tuple(r) for r in pdf.itertuples(index=False)],
            column_names=list(pdf.columns),
            column_types=[str(t) for t in pdf.dtypes],
            row_count=len(pdf),
        )

    exec = execute

    # -- interop ------------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def dtypes(self) -> list[tuple[str, str]]:
        return self._df.dtypes

    def to_df(self):
        """Trigger: materialize to pandas (reference natural trigger to_df)."""
        return self._df.toPandas()

    to_pandas = to_df

    def collect(self):
        return self._df.collect()

    def count(self) -> int:
        return self._df.count()

    def __len__(self) -> int:
        return self._df.count()

    def __repr__(self) -> str:  # trigger: repr shows a sample like the reference
        rows = self._df.limit(10).collect()
        head = ", ".join(self.columns)
        body = "\n".join(str(tuple(r)) for r in rows)
        return f"DataStore[{head}]\n{body}"

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    # -- classmethod factories (reference api-reference.md connector forms) --

    @classmethod
    def from_file(cls, path: str, fmt: str | None = None, spark=None, **options):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import read_auto

        return cls(read_auto(spark or get_spark(), path, fmt=fmt, **options))

    @classmethod
    def from_mysql(cls, host: str, database: str, table: str,
                   user: str = "", password: str = "", spark=None, **options):
        """reference connectors.md ``DataStore.from_mysql(host=..., ...)`` —
        JDBC reader (driver jar required; its error says so)."""
        from chdb_spark.session import get_spark
        from chdb_spark.sources import read_jdbc

        return cls(read_jdbc(
            spark or get_spark(), f"jdbc:mysql://{host}/{database}", table,
            user=user, password=password, **options,
        ))

    @classmethod
    def from_postgresql(cls, host: str, database: str, table: str,
                        user: str = "", password: str = "", spark=None, **options):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import read_jdbc

        return cls(read_jdbc(
            spark or get_spark(), f"jdbc:postgresql://{host}/{database}", table,
            user=user, password=password, **options,
        ))

    @classmethod
    def from_df(cls, pdf, spark=None):
        from chdb_spark.session import get_spark

        return cls((spark or get_spark()).createDataFrame(pdf))

    @classmethod
    def from_s3(cls, url: str, access_key_id=None, secret_access_key=None,
                format=None, nosign=False, spark=None, **kwargs):
        """reference connectors.md:49 — credentials belong in Hadoop conf on
        a real cluster; per-call keys are set on this session when given."""
        from chdb_spark.session import get_spark
        from chdb_spark.sources import open_uri

        spark = spark or get_spark()
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        if access_key_id:
            hconf.set("fs.s3a.access.key", access_key_id)
            hconf.set("fs.s3a.secret.key", secret_access_key or "")
        if nosign:
            hconf.set(
                "fs.s3a.aws.credentials.provider",
                "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
            )
        return cls(open_uri(spark, url, fmt=format, **kwargs))

    @classmethod
    def from_gcs(cls, url: str, hmac_key=None, hmac_secret=None, format=None,
                 nosign=False, spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import open_uri

        return cls(open_uri(spark or get_spark(), url, fmt=format, **kwargs))

    @classmethod
    def from_hdfs(cls, uri: str, format=None, structure=None, spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import open_uri

        return cls(open_uri(spark or get_spark(), uri, fmt=format, **kwargs))

    @classmethod
    def from_azure(cls, connection_string: str, container: str, path: str = "",
                   format=None, spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import open_uri

        uri = f"abfss://{container}@{connection_string}/{path}".rstrip("/")
        return cls(open_uri(spark or get_spark(), uri, fmt=format, **kwargs))

    @classmethod
    def from_url(cls, url: str, format=None, structure=None, headers=None,
                 spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import open_uri

        return cls(open_uri(spark or get_spark(), url, fmt=format, **kwargs))

    @classmethod
    def from_clickhouse(cls, host: str, database=None, table=None,
                        user: str = "default", password: str = "",
                        secure: bool = False, port=None, spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import read_jdbc

        hp = host if ":" in host or port is None else f"{host}:{port}"
        proto = "https" if secure else "http"
        return cls(read_jdbc(
            spark or get_spark(),
            f"jdbc:clickhouse:{proto}://{hp}/{database or 'default'}",
            table or "", user=user, password=password, **kwargs,
        ))

    @classmethod
    def from_mongodb(cls, host: str, database: str, collection: str,
                     user: str = "", password: str = "", spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources.nosql import mongodb

        return cls(mongodb(spark or get_spark(), host=host, database=database,
                           collection=collection, user=user, password=password,
                           **kwargs))

    @classmethod
    def from_sqlite(cls, database_path: str, table: str, spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import read_sqlite

        return cls(read_sqlite(spark or get_spark(), database_path, table, **kwargs))

    @classmethod
    def from_redis(cls, host: str, key: str, structure: str, password=None,
                   db_index: int = 0, spark=None, **kwargs):
        from chdb_spark.session import get_spark
        from chdb_spark.sources.nosql import redis_table

        return cls(redis_table(spark or get_spark(), host, key, structure,
                               password=password, db_index=db_index, **kwargs))

    @classmethod
    def from_numbers(cls, n: int, start: int = 0, spark=None):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import numbers

        return cls(numbers(spark or get_spark(), n, start=start))

    @classmethod
    def from_random(cls, schema: dict, n: int, seed: int = 42, spark=None):
        from chdb_spark.session import get_spark
        from chdb_spark.sources import generate_random

        return cls(generate_random(spark or get_spark(), schema, n, seed=seed))

    @classmethod
    def from_iceberg(cls, url: str, spark=None, **kwargs):
        from chdb_spark.session import get_spark

        return cls((spark or get_spark()).read.format("iceberg").load(url))

    @classmethod
    def from_delta(cls, url: str, spark=None, **kwargs):
        from chdb_spark.session import get_spark

        return cls((spark or get_spark()).read.format("delta").load(url))

    @classmethod
    def from_hudi(cls, url: str, spark=None, **kwargs):
        from chdb_spark.session import get_spark

        return cls((spark or get_spark()).read.format("hudi").load(url))

    @classmethod
    def uri(cls, uri_string: str, spark=None, **kwargs):
        """reference connectors.md:224 — scheme-dispatched universal entry."""
        from chdb_spark.session import get_spark
        from chdb_spark.sources import open_uri

        return cls(open_uri(spark or get_spark(), uri_string, **kwargs))

    def insert_into(self, *cols: str) -> "_InsertBuilder":
        """Writing pattern (reference api-reference.md:260-268):
        ``target.insert_into(cols...).select_from(source_ds).execute()``.
        Valid on a target-descriptor DataStore (``DataStore("file", ...)``)."""
        if self._target is None:
            raise ValueError("insert_into: this DataStore is not a write target")
        return _InsertBuilder(
            self._target, list(cols), self._target_kind or "file"
        )

    def to_sql(self) -> str:
        """The generated-query view (reference ``DataStore.to_sql`` —
        api-reference.md "View the generated SQL"): this engine compiles to
        a Catalyst logical plan, not intermediate SQL text, so the
        debugging artifact is the analyzed plan — same role, no execution."""
        return self._df._jdf.queryExecution().analyzed().toString()

    def info(self) -> None:
        """Print column/dtype/row-count summary (pandas-style ``info()``,
        reference api-reference.md:236). Triggers one count."""
        n = self._df.count()
        lines = [f"<class 'chdb_spark.datastore.DataStore'>", f"rows: {n}"]
        lines.append(f"columns: {len(self.columns)}")
        for name, dtype in self.dtypes:
            lines.append(f"  {name}: {dtype}")
        print("\n".join(lines))

    def equals(self, other) -> bool:
        """Multiset row equality with matching schema (reference
        api-reference.md:240 ``.equals(other)``). Order-insensitive — the
        engine is SQL-order-agnostic (SURVEY §1.4), unlike pandas' order-
        sensitive equals; two exceptAll passes, no full collect."""
        odf = other._df if isinstance(other, DataStore) else other
        if [c for c, _ in self.dtypes] != [c for c, _ in odf.dtypes]:
            return False
        return (
            self._df.exceptAll(odf).limit(1).count() == 0
            and odf.exceptAll(self._df).limit(1).count() == 0
        )

    # -- column access ------------------------------------------------------

    def __getitem__(self, key):
        if isinstance(key, str):
            # ColumnExpr IS a Column, plus the reference's .str/.dt/.arr/
            # .json/.url/.ip/.geo accessor namespaces (SURVEY §2.8)
            from chdb_spark.accessors import ColumnExpr

            return ColumnExpr(F.col(key))
        if isinstance(key, list):
            return DataStore(self._df.select(*key))
        if isinstance(key, Column):  # boolean mask: ds[ds['a'] > 5]
            return DataStore(self._df.filter(key))
        if isinstance(key, slice):  # ds[10:50] → offset/limit
            start = key.start or 0
            stop = key.stop
            out = self._df.offset(start) if start else self._df
            if stop is not None:
                out = out.limit(stop - start)
            return DataStore(out)
        raise TypeError(f"unsupported key type: {type(key)}")

    def __getattr__(self, name: str):
        # ds.colname → Column (pandas-style attribute access)
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._df.columns:
            from chdb_spark.accessors import ColumnExpr

            return ColumnExpr(F.col(name))
        raise AttributeError(name)

    # -- projections / filters ----------------------------------------------

    def select(self, *cols) -> "DataStore":
        return DataStore(self._df.select(*cols))

    def filter(self, cond) -> "DataStore":
        if isinstance(cond, str):
            return DataStore(self._df.filter(cond))
        return DataStore(self._df.filter(cond))

    where = filter

    def query(self, expr: str) -> "DataStore":
        """pandas query-string filter (reference pandas_compat.py:837) —
        translated token-wise: and/or/not → AND/OR/NOT, == stays."""
        sql_expr = (
            expr.replace(" and ", " AND ").replace(" or ", " OR ").replace("not ", "NOT ")
        )
        return DataStore(self._df.filter(sql_expr))

    def assign(self, **kwargs) -> "DataStore":
        out = self._df
        for name, val in kwargs.items():
            col = val(out) if callable(val) else (val if isinstance(val, Column) else F.lit(val))
            out = out.withColumn(name, col)
        return DataStore(out)

    def with_column(self, name: str, col) -> "DataStore":
        return DataStore(self._df.withColumn(name, col if isinstance(col, Column) else F.lit(col)))

    def drop(self, *cols) -> "DataStore":
        return DataStore(self._df.drop(*cols))

    def rename(
        self, mapping: dict[str, str] | None = None, columns: dict[str, str] | None = None
    ) -> "DataStore":
        """Both call shapes: ``rename({...})`` and the pandas-idiomatic
        ``rename(columns={...})`` (reference pandas_api rename)."""
        m = mapping if mapping is not None else columns
        if m is None:
            raise ValueError("rename: provide a mapping or columns=")
        return DataStore(self._df.withColumnsRenamed(m))

    def add_prefix(self, prefix: str) -> "DataStore":
        return DataStore(self._df.toDF(*[f"{prefix}{c}" for c in self._df.columns]))

    def add_suffix(self, suffix: str) -> "DataStore":
        return DataStore(self._df.toDF(*[f"{c}{suffix}" for c in self._df.columns]))

    # -- null handling / casting --------------------------------------------

    def fillna(self, value, subset=None) -> "DataStore":
        return DataStore(self._df.na.fill(value, subset=subset))

    def dropna(self, subset=None, how: str = "any") -> "DataStore":
        return DataStore(self._df.na.drop(how=how, subset=subset))

    def replace(self, to_replace, value, subset=None) -> "DataStore":
        return DataStore(self._df.na.replace(to_replace, value, subset=subset))

    def astype(self, mapping: dict[str, str]) -> "DataStore":
        out = self._df
        for c, t in mapping.items():
            out = out.withColumn(c, F.col(c).cast(t))
        return DataStore(out)

    def mask(self, cond, other=None) -> "DataStore":
        """pandas mask: replace values WHERE cond (reference lazy_ops.py:2197)."""
        out = self._df
        for c in out.columns:
            out = out.withColumn(c, F.when(cond, F.lit(other)).otherwise(F.col(c)))
        return DataStore(out)

    def where_values(self, cond, other=None) -> "DataStore":
        """pandas where: keep values where cond, else other (lazy_ops.py:1884)."""
        out = self._df
        for c in out.columns:
            out = out.withColumn(c, F.when(cond, F.col(c)).otherwise(F.lit(other)))
        return DataStore(out)

    # -- ordering / limits ---------------------------------------------------

    def sort_values(self, by, ascending=True) -> "DataStore":
        cols = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(cols) if isinstance(ascending, bool) else list(ascending)
        order = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(cols, asc)]
        return DataStore(self._df.orderBy(*order))

    orderby = sort_values
    sort = sort_values

    def head(self, n: int = 5) -> "DataStore":
        return DataStore(self._df.limit(n))

    def limit(self, n: int) -> "DataStore":
        return DataStore(self._df.limit(n))

    def offset(self, n: int) -> "DataStore":
        return DataStore(self._df.offset(n))

    def tail(self, n: int = 5):
        return self._df.tail(n)  # action, like the reference's count-then-offset

    def nlargest(self, n: int, col: str) -> "DataStore":
        return DataStore(self._df.orderBy(F.desc(col)).limit(n))

    def nsmallest(self, n: int, col: str) -> "DataStore":
        return DataStore(self._df.orderBy(F.asc(col)).limit(n))

    # -- dedup / sampling ----------------------------------------------------

    def distinct(self) -> "DataStore":
        return DataStore(self._df.distinct())

    def drop_duplicates(self, subset=None, keep: str = "first", order_by=None) -> "DataStore":
        """subset+keep via row_number window (the reference compiles this to
        ClickHouse LIMIT 1 BY, sql_executor.py:900-911)."""
        if subset is None:
            return DataStore(self._df.distinct())
        from pyspark.sql.window import Window

        order_cols = order_by or [c for c in self._df.columns if c not in subset]
        order = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_cols]
        w = Window.partitionBy(*subset).orderBy(*order) if order else Window.partitionBy(*subset)
        return DataStore(
            self._df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def sample(self, frac: float, seed: int | None = None) -> "DataStore":
        return DataStore(self._df.sample(fraction=frac, seed=seed))

    # -- reshaping -----------------------------------------------------------

    def explode(self, column: str) -> "DataStore":
        others = [c for c in self._df.columns if c != column]
        return DataStore(self._df.select(*others, F.explode(column).alias(column)))

    def melt(self, id_vars, value_vars, var_name="variable", value_name="value") -> "DataStore":
        return DataStore(
            self._df.melt(
                ids=id_vars, values=value_vars, variableColumnName=var_name, valueColumnName=value_name
            )
        )

    def pivot_table(self, index, columns: str, values: str, aggfunc: str = "sum") -> "DataStore":
        idx = [index] if isinstance(index, str) else list(index)
        agg = getattr(F, aggfunc)
        return DataStore(self._df.groupBy(*idx).pivot(columns).agg(agg(values)))

    def value_counts(self, col: str) -> "DataStore":
        return DataStore(
            self._df.groupBy(col).agg(F.count("*").alias("count")).orderBy(F.desc("count"), col)
        )

    # -- elementwise math / summary (reference pandas_compat tier) ----------

    _NUMERIC_T = ("int", "bigint", "smallint", "tinyint", "double", "float")

    def _numeric_cols(self) -> list[str]:
        return [
            c
            for c, t in self._df.dtypes
            if t in self._NUMERIC_T or t.startswith("decimal")
        ]

    def abs(self) -> "DataStore":
        """Elementwise absolute value on numeric columns (reference
        pandas_compat abs — Column math, codegen)."""
        num = set(self._numeric_cols())
        return DataStore(
            self._df.select(
                *[
                    F.abs(c).alias(c) if c in num else F.col(c)
                    for c in self._df.columns
                ]
            )
        )

    def round(self, decimals: int = 0) -> "DataStore":
        num = set(self._numeric_cols())
        return DataStore(
            self._df.select(
                *[
                    F.round(c, decimals).alias(c) if c in num else F.col(c)
                    for c in self._df.columns
                ]
            )
        )

    def clip(self, lower=None, upper=None) -> "DataStore":
        num = set(self._numeric_cols())

        def _clip(c):
            col = F.col(c)
            if lower is not None:
                col = F.greatest(col, F.lit(lower))
            if upper is not None:
                col = F.least(col, F.lit(upper))
            return col.alias(c)

        return DataStore(
            self._df.select(
                *[_clip(c) if c in num else F.col(c) for c in self._df.columns]
            )
        )

    def nunique(self):
        """Per-column distinct counts → pandas Series (one agg pass;
        driver sees one row — reference returns a Series too)."""
        row = self._df.agg(
            *[F.countDistinct(c).alias(c) for c in self._df.columns]
        ).first()
        import pandas as pd

        return pd.Series(row.asDict())

    def quantile(self, q: float = 0.5):
        """Exact per-column quantile → pandas Series (single agg;
        `percentile` is the distributed exact path)."""
        cols = self._numeric_cols()
        row = self._df.agg(
            *[F.expr(f"percentile(`{c}`, {q})").alias(c) for c in cols]
        ).first()
        import pandas as pd

        return pd.Series(row.asDict())

    def mode(self):
        """Per-column most frequent value (ties → smallest, the pandas
        order). One count-agg per column; each is a tiny result."""
        import pandas as pd

        out = {}
        for c in self._df.columns:
            r = (
                self._df.groupBy(c)
                .agg(F.count("*").alias("_n"))
                .orderBy(F.desc("_n"), F.asc(c))
                .first()
            )
            out[c] = None if r is None else r[0]
        return pd.DataFrame([out])

    def corr(self, method: str = "pearson"):
        """Pairwise Pearson correlation matrix of numeric columns —
        ALL pairs in ONE distributed agg pass; the k×k matrix lands on
        the driver (reference returns a pandas frame too)."""
        if method != "pearson":
            raise ValueError("only pearson correlation is supported")
        return self._pairwise(F.corr)

    def cov(self):
        """Pairwise sample covariance matrix (one agg pass)."""
        return self._pairwise(F.covar_samp)

    def _pairwise(self, fn):
        import pandas as pd

        cols = self._numeric_cols()
        aggs = [
            fn(a, b).alias(f"{i}_{j}")
            for i, a in enumerate(cols)
            for j, b in enumerate(cols)
            if j >= i
        ]
        row = self._df.agg(*aggs).first()
        m = [[None] * len(cols) for _ in cols]
        for i in range(len(cols)):
            for j in range(len(cols)):
                v = row[f"{min(i,j)}_{max(i,j)}"]
                m[i][j] = v
        return pd.DataFrame(m, index=cols, columns=cols)

    def eval(self, expr: str) -> "DataStore":
        """pandas ``eval``: ``"c = a + b"`` assigns a column; a bare
        expression returns its values as a one-column DataStore. The
        expression runs as a Spark SQL expression (codegen), not Python."""
        import re as _re

        m = _re.match(r"^\s*([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$", expr, _re.S)
        if m:
            return DataStore(self._df.withColumn(m.group(1), F.expr(m.group(2))))
        return DataStore(self._df.select(F.expr(expr).alias(expr.strip())))

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    def apply(self, func, axis: int = 0):
        """pandas-tier apply (the reference executes apply pandas-side as
        well — pandas_compat 'pandas-executed'). Materializes to the
        driver: use Column expressions / ``assign`` for corpus-scale work."""
        return self.to_df().apply(func, axis=axis)

    def set_index(self, col: str) -> "DataStore":
        """Record the index column (the engine has no row-index; the
        column stays in the frame, reference §1.4 index emulation)."""
        if col not in self._df.columns:
            raise KeyError(col)
        out = DataStore(self._df)
        out._index_col = col
        return out

    def reset_index(self, drop: bool = False) -> "DataStore":
        """With an index set: forget it (the column is already present).
        Without one and ``drop=False``: add a deterministic 0-based
        ``index`` column (row_number over the current order).

        Scale note: materializing a global row index is inherently a
        total-order operation (one sort-reducer pass) — pandas index
        semantics, meaningful for report-sized frames. Corpus-scale keys
        come from data columns or monotonically_increasing_id, not here."""
        if getattr(self, "_index_col", None) is not None or drop:
            return DataStore(self._df)
        idx = F.row_number().over(
            Window.orderBy(F.monotonically_increasing_id())
        ) - 1
        return DataStore(
            self._df.select(idx.alias("index"), *self._df.columns)
        )

    def describe(self, *cols) -> "DataStore":
        return DataStore(self._df.describe(*cols))

    desc = describe  # reference example_pandas_methods.py short form

    def factorize(self, col: str) -> "DataStore":
        """Dense integer codes for a column's distinct values (reference
        pandas_api.py:1712 — pandas-executed there). Distributed form: the
        code table is dense_rank over DISTINCT values (|distinct| rows, not
        |rows|), broadcast-joined back when small, shuffle-joined otherwise
        (AQE decides). Codes are 0-based in first-seen-sorted order."""
        codes = (
            self._df.select(col).distinct()
            .withColumn(
                f"{col}_code",
                F.dense_rank().over(Window.orderBy(col)) - 1,
            )
        )
        return DataStore(self._df.join(codes, col, "left"))

    def unstack(self, index: str, columns: str, values: str, aggfunc: str = "first") -> "DataStore":
        """Long → wide (reference pandas_compat.py:1603): groupBy(index)
        .pivot(columns) — the same engine path as pivot_table. Column
        cardinality of ``columns`` becomes the output width; Spark caps
        pivot width via spark.sql.pivotMaxValues (defaults 10k)."""
        return DataStore(
            self._df.groupBy(index).pivot(columns).agg(_agg_expr(aggfunc, values))
        )

    def transpose(self):
        """Rows ↔ columns (reference pandas_compat.py:1620 — pandas-executed
        there too). Materializes to the driver by design: a transposed
        relational table has one column per input ROW, which is only
        meaningful for small summary frames. Returns a pandas DataFrame."""
        return self._df.toPandas().T

    # -- joins / set ops -----------------------------------------------------

    def join(self, other: "DataStore", on=None, how: str = "inner") -> "DataStore":
        return DataStore(self._df.join(other._df, on=on, how=how))

    def merge(
        self,
        right: "DataStore",
        on=None,
        left_on=None,
        right_on=None,
        how: str = "inner",
        suffixes: tuple[str, str] = ("_x", "_y"),
    ) -> "DataStore":
        """pandas merge incl. suffix semantics (reference pandas_api.py:1099)."""
        l, r = self._df, right._df
        if on is not None:
            keys = [on] if isinstance(on, str) else list(on)
            overlap = (set(l.columns) & set(r.columns)) - set(keys)
            for c in overlap:
                l = l.withColumnRenamed(c, c + suffixes[0])
                r = r.withColumnRenamed(c, c + suffixes[1])
            return DataStore(l.join(r, on=keys, how=how))
        lk = [left_on] if isinstance(left_on, str) else list(left_on)
        rk = [right_on] if isinstance(right_on, str) else list(right_on)
        overlap = (set(l.columns) & set(r.columns)) - (set(lk) & set(rk))
        for c in overlap:
            l = l.withColumnRenamed(c, c + suffixes[0])
            r = r.withColumnRenamed(c, c + suffixes[1])
        lk2 = [k + suffixes[0] if k in overlap else k for k in lk]
        rk2 = [k + suffixes[1] if k in overlap else k for k in rk]
        cond = None
        for a, b in zip(lk2, rk2):
            c = l[a] == r[b]
            cond = c if cond is None else (cond & c)
        return DataStore(l.join(r, on=cond, how=how))

    def merge_asof(self, right: "DataStore", on: str, by, tolerance: str | None = None,
                   right_values: list[str] | None = None) -> "DataStore":
        from chdb_spark.operators.asof import merge_asof_backward

        by_cols = [by] if isinstance(by, str) else list(by)
        rvals = right_values or [
            c for c in right._df.columns if c not in by_cols and c != on
        ]
        return DataStore(
            merge_asof_backward(self._df, right._df, on=on, by=by_cols, right_values=rvals)
        )

    def merge_ordered(self, right: "DataStore", on, fill_method: str | None = None,
                      partition_by: list[str] | None = None) -> "DataStore":
        """Ordered full-outer merge with optional forward-fill — the
        analogue of ``pd.merge_ordered`` (reference pandas_api.py:1245-1290,
        executed pandas-side there; one Spark plan here).

        Join keys align by equality; with ``fill_method='ffill'`` every
        non-key column carries the last non-null value forward in key
        order. The ffill window is per ``partition_by`` group (global when
        omitted — appropriate only for key-grain data whose cardinality is
        bounded, e.g. daily rollups; per-entity fills must pass
        ``partition_by`` so the window parallelizes).
        """
        keys = [on] if isinstance(on, str) else list(on)
        joined = self._df.join(right._df, on=keys, how="outer")
        if fill_method == "ffill":
            w = (
                Window.partitionBy(*(partition_by or []))
                .orderBy(*keys)
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            fills = [c for c in joined.columns if c not in keys and c not in (partition_by or [])]
            joined = joined.withColumns(
                {c: F.last(c, ignorenulls=True).over(w) for c in fills}
            )
        return DataStore(joined)

    def union(self, other: "DataStore", all: bool = True) -> "DataStore":
        out = self._df.unionByName(other._df)
        return DataStore(out if all else out.distinct())

    def concat(self, other: "DataStore") -> "DataStore":
        return DataStore(self._df.unionByName(other._df, allowMissingColumns=True))

    def intersect(self, other: "DataStore") -> "DataStore":
        return DataStore(self._df.intersect(other._df))

    def except_(self, other: "DataStore") -> "DataStore":
        return DataStore(self._df.exceptAll(other._df))

    # -- ordered / time-series ops (reference pandas_compat.py:1782-1848) ----
    #
    # Spark has no implicit row order (SURVEY.md §1.4): every ordered op here
    # takes an explicit ``order_by`` column — the honest Spark contract. The
    # pandas-index emulation (hidden __row_id__) stays out of the core.

    def shift(self, col: str, periods: int = 1, order_by: str | None = None,
              partition_by: list[str] | None = None) -> "DataStore":
        w = self._ordered_window(order_by, partition_by)
        expr = F.lag(col, periods).over(w) if periods >= 0 else F.lead(col, -periods).over(w)
        return DataStore(self._df.withColumn(f"{col}_shift", expr))

    def diff(self, col: str, order_by: str | None = None,
             partition_by: list[str] | None = None) -> "DataStore":
        w = self._ordered_window(order_by, partition_by)
        return DataStore(self._df.withColumn(f"{col}_diff", F.col(col) - F.lag(col, 1).over(w)))

    def pct_change(self, col: str, order_by: str | None = None,
                   partition_by: list[str] | None = None) -> "DataStore":
        w = self._ordered_window(order_by, partition_by)
        prev = F.lag(col, 1).over(w)
        return DataStore(self._df.withColumn(f"{col}_pct_change", (F.col(col) - prev) / prev))

    def cumsum(self, col: str, order_by: str | None = None,
               partition_by: list[str] | None = None) -> "DataStore":
        w = self._cum_window(order_by, partition_by)
        return DataStore(self._df.withColumn(f"{col}_cumsum", F.sum(col).over(w)))

    def cummax(self, col: str, order_by: str | None = None,
               partition_by: list[str] | None = None) -> "DataStore":
        w = self._cum_window(order_by, partition_by)
        return DataStore(self._df.withColumn(f"{col}_cummax", F.max(col).over(w)))

    def cummin(self, col: str, order_by: str | None = None,
               partition_by: list[str] | None = None) -> "DataStore":
        w = self._cum_window(order_by, partition_by)
        return DataStore(self._df.withColumn(f"{col}_cummin", F.min(col).over(w)))

    def cumprod(self, col: str, order_by: str | None = None,
                partition_by: list[str] | None = None) -> "DataStore":
        """Cumulative product (pandas cumprod): sign-aware exp/sum-of-logs
        window — no product window aggregate exists; zeros propagate, the
        sign is the running parity of negatives. Same frame convention as
        cumsum."""
        w = self._cum_window(order_by, partition_by)
        logs = F.sum(F.log(F.abs(F.nullif(F.col(col), F.lit(0))))).over(w)
        n_neg = F.sum(F.when(F.col(col) < 0, 1).otherwise(0)).over(w)
        n_zero = F.sum(F.when(F.col(col) == 0, 1).otherwise(0)).over(w)
        sign = F.when(n_neg % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        val = F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * F.exp(logs))
        return DataStore(self._df.withColumn(f"{col}_cumprod", val))

    # -- frame-level reductions (→ pandas Series, one agg pass) -------------

    def _reduce(self, fn, cols=None):
        import pandas as pd

        cols = list(cols) if cols else self._numeric_cols()
        row = self._df.agg(*[fn(c).alias(c) for c in cols]).first()
        return pd.Series(row.asDict())

    def sum(self):
        return self._reduce(F.sum)

    def mean(self):
        return self._reduce(F.avg)

    def min(self):
        return self._reduce(F.min, self._df.columns)

    def max(self):
        return self._reduce(F.max, self._df.columns)

    def std(self):
        return self._reduce(F.stddev_samp)

    def var(self):
        return self._reduce(F.var_samp)

    def median(self):
        return self._reduce(lambda c: F.expr(f"percentile(`{c}`, 0.5)"))

    def skew(self):
        # pandas reports the sample (bias-corrected G1) skewness; Spark's
        # `skewness` is the population g1 — correct with n
        import pandas as pd

        cols = self._numeric_cols()
        row = self._df.agg(
            F.count("*").alias("_n"),
            *[F.skewness(c).alias(c) for c in cols],
        ).first()
        n = row["_n"]
        k = (n * (n - 1)) ** 0.5 / (n - 2) if n > 2 else float("nan")
        return pd.Series({c: (row[c] * k if row[c] is not None else None) for c in cols})

    def kurt(self):
        # pandas G2 (sample-excess) from Spark's population g2
        import pandas as pd

        cols = self._numeric_cols()
        row = self._df.agg(
            F.count("*").alias("_n"),
            *[F.kurtosis(c).alias(c) for c in cols],
        ).first()
        n = row["_n"]

        def fix(g2):
            if g2 is None or n < 4:
                return None
            return ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)

        return pd.Series({c: fix(row[c]) for c in cols})

    def prod(self):
        return self._reduce(F.product)

    def all(self):
        bools = [c for c, t in self._df.dtypes if t == "boolean"]
        return self._reduce(F.bool_and, bools)

    def any(self):
        bools = [c for c, t in self._df.dtypes if t == "boolean"]
        return self._reduce(F.bool_or, bools)

    def isna(self) -> "DataStore":
        return DataStore(
            self._df.select(*[F.isnull(c).alias(c) for c in self._df.columns])
        )

    def notna(self) -> "DataStore":
        return DataStore(
            self._df.select(*[(~F.isnull(c)).alias(c) for c in self._df.columns])
        )

    def sort_index(self, ascending: bool = True) -> "DataStore":
        """Sort by the set_index() column when one exists; otherwise the
        frame has no index order to restore (returns self)."""
        idx = getattr(self, "_index_col", None)
        if idx is None:
            return self
        order = F.col(idx).asc() if ascending else F.col(idx).desc()
        out = DataStore(self._df.orderBy(order))
        out._index_col = idx
        return out

    def squeeze(self):
        """1-column frame → pandas Series (driver-side, pandas contract)."""
        if len(self._df.columns) == 1:
            return self.to_df()[self._df.columns[0]]
        return self

    # -- driver-side exports / iteration (pandas compat tier) ---------------

    def to_dict(self, orient: str = "dict"):
        return self.to_df().to_dict(orient)

    def to_numpy(self):
        return self.to_df().to_numpy()

    def to_records(self, index: bool = False):
        return self.to_df().to_records(index=index)

    def to_csv(self, path=None, index: bool = False, **kw):
        """pandas contract: no path → CSV string; path → single CSV file
        (driver-side). For a distributed multi-part write at corpus scale
        use ``sinks.write_auto(ds.df, dir, fmt='csv')``."""
        return self.to_df().to_csv(path, index=index, **kw)

    def to_json(self, path=None, **kw):
        return self.to_df().to_json(path, **kw)

    def to_parquet(self, path, **kw):
        """Distributed parquet write (the scale path — partitioned parts)."""
        self._df.write.mode("overwrite").parquet(path)

    def to_orc(self, path, **kw):
        """Distributed ORC write (reference pandas_compat.py to_orc) —
        Spark-native, partitioned parts like to_parquet."""
        self._df.write.mode("overwrite").orc(path)

    def to_iceberg(self, table: str, mode: str = "append", **kw):
        """Iceberg table write (reference table_functions.py Iceberg leg).
        Filesystem paths go through the jar-free pure-Python v2 writer
        (sources/iceberg_py.py write_iceberg_py — unpartitioned,
        primitive types, fail-loud outside that scope); catalog table
        identifiers pass through to the Spark Iceberg connector, which
        requires the iceberg runtime jar + catalog conf (jar-gated,
        tests/test_lakehouse_gated.py)."""
        import os as _os

        # explicit path-likes only (contain a separator): a bare catalog
        # identifier must NOT be hijacked by a same-named directory in
        # the driver's cwd (write './dir' to target a relative path)
        if _os.sep in table or "/" in table:
            from chdb_spark.sources.iceberg_py import write_iceberg_py

            return write_iceberg_py(self._df, table, mode=mode)
        self._df.writeTo(table).append() if mode == "append" else (
            self._df.writeTo(table).createOrReplace()
        )

    def to_feather(self, path, **kw):
        """Driver-side feather file via Arrow (reference
        pandas_compat.py:2164). Report-sized results only — the
        distributed sibling is ``to_parquet``."""
        return self.to_df().to_feather(path, **kw)

    def to_html(self, buf=None, **kw):
        """HTML table string / file (reference pandas_compat.py:2099).
        Driver-side render — meant for report-sized results."""
        return self.to_df().to_html(buf, **kw)

    def to_markdown(self, buf=None, **kw):
        """Markdown table (reference pandas_compat.py:2173). Needs the
        ``tabulate`` package (pandas' own requirement) — ImportError
        surfaces unchanged when absent."""
        return self.to_df().to_markdown(buf, **kw)

    def to_excel(self, excel_writer, sheet_name: str = "Sheet1", **kw):
        """Excel sheet (reference pandas_compat.py:2019). Needs an Excel
        engine (openpyxl/xlsxwriter — pandas' own requirement); the
        ImportError surfaces unchanged when absent."""
        return self.to_df().to_excel(excel_writer, sheet_name=sheet_name, **kw)

    def to_clickhouse(self, name: str, host: str, user: str = "default",
                      password: str = "", secure: bool = False,
                      if_exists: str = "fail", engine: str = "MergeTree",
                      order_by: str = "tuple()", database: str = "default",
                      **kw) -> int:
        """Write to a remote ClickHouse table over the public HTTP
        interface — the executable counterpart of the reference's
        DataFrame-upload leg (core.py:5523-5562), no driver jar. Each
        executor POSTs its partition as ``INSERT ... FORMAT ArrowStream``;
        row data never passes through the Spark driver. Returns rows
        written."""
        from chdb_spark.sources.remote_ch import to_clickhouse

        return to_clickhouse(
            self._df, host, database, name, user=user, password=password,
            secure=secure, if_exists=if_exists, engine=engine,
            order_by=order_by, **kw,
        )

    def iterrows(self):
        """(i, Series) per row from ``toLocalIterator`` — constant driver
        memory at any result size (the reference iterates pandas-side)."""
        import pandas as pd

        for i, r in enumerate(self._df.toLocalIterator()):
            yield i, pd.Series(r.asDict())

    def itertuples(self, index: bool = True, name: str = "Row"):
        from collections import namedtuple

        nt = namedtuple(name, (["Index"] if index else []) + self._df.columns)
        for i, r in enumerate(self._df.toLocalIterator()):
            vals = ([i] if index else []) + list(r)
            yield nt(*vals)

    def items(self):
        pdf = self.to_df()
        for c in pdf.columns:
            yield c, pdf[c]

    def rank(self, col: str, pct: bool = False, partition_by: list[str] | None = None) -> "DataStore":
        base = Window.partitionBy(*(partition_by or [])).orderBy(col)
        expr = F.percent_rank().over(base) if pct else F.rank().over(base)
        return DataStore(self._df.withColumn(f"{col}_rank", expr))

    def duplicated(self, subset: list[str] | None = None, keep: str = "first",
                   order_by: str | None = None) -> "DataStore":
        """Boolean column marking duplicate rows (reference pandas_compat.py:1182).
        keep='first' marks all but the first occurrence per key; 'last'
        mirrors; False marks every member of a >1 group."""
        keys = subset or self._df.columns
        order = F.col(order_by) if order_by else F.monotonically_increasing_id()
        if keep == "last":
            order = order.desc()
        w = Window.partitionBy(*keys).orderBy(order)
        rn = F.row_number().over(w)
        if keep is False:
            cnt = F.count("*").over(Window.partitionBy(*keys))
            return DataStore(self._df.withColumn("duplicated", cnt > 1))
        return DataStore(self._df.withColumn("duplicated", rn > 1))

    def rolling(self, window: int, col: str, fn: str = "mean",
                order_by: str | None = None,
                partition_by: list[str] | None = None,
                min_periods: int | None = None) -> "DataStore":
        """Trailing row-count window (reference pandas_compat.py:1813:
        rolling → ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW)."""
        w = self._ordered_window(order_by, partition_by).rowsBetween(-(window - 1), 0)
        agg = _agg_expr(fn, col).over(w)
        need = min_periods if min_periods is not None else window
        n_in_frame = F.count(col).over(w)
        out = F.when(n_in_frame >= need, agg)
        return DataStore(self._df.withColumn(f"{col}_rolling_{fn}", out))

    def expanding(self, col: str, fn: str = "sum", order_by: str | None = None,
                  partition_by: list[str] | None = None) -> "DataStore":
        w = self._cum_window(order_by, partition_by)
        return DataStore(self._df.withColumn(f"{col}_expanding_{fn}", _agg_expr(fn, col).over(w)))

    def ewm(self, col: str, alpha: float, order_by: str,
            partition_by: list[str] | None = None) -> "DataStore":
        """Exponentially weighted mean (adjust=True pandas semantics):
        ewm_i = Σ_j (1-α)^(i-j)·x_j / Σ_j (1-α)^(i-j).

        Closed form over two cumulative sums of scaled series — stays
        JVM-side (no UDF): with s_i = x_i/(1-α)^i, ewm_i = cumsum(s)_i /
        cumsum(1/(1-α)^i). The scaling is re-centered per row index to
        avoid overflow only for |window| ≲ 700 rows of drift; beyond that,
        use groupby().apply_in_pandas with pandas' ewm (the documented
        fallback, reference pandas_compat.py:1848)."""
        w = self._cum_window(order_by, partition_by)
        base = Window.partitionBy(*(partition_by or [])).orderBy(order_by)
        i = F.row_number().over(base).cast("double")
        decay = float(1.0 - alpha)
        num = F.sum(F.col(col) * F.pow(F.lit(decay), -i)).over(w)
        den = F.sum(F.pow(F.lit(decay), -i)).over(w)
        return DataStore(self._df.withColumn(f"{col}_ewm", num / den))

    def resample(self, ts_col: str, freq: str, agg: dict[str, str]) -> "DataStore":
        """Time-bucket aggregation (reference pandas_compat.py:1782):
        resample('1 hour').agg({'v': 'sum'}) → groupBy(window(ts, freq))."""
        exprs = [_agg_expr(fn_name, c).alias(f"{c}_{fn_name}") for c, fn_name in agg.items()]
        out = self._df.groupBy(F.window(ts_col, freq)).agg(*exprs)
        return DataStore(
            out.select(F.col("window.start").alias(ts_col), *[c for c in out.columns if c != "window"])
        )

    def interpolate(self, col: str, order_by: str, method: str = "linear",
                    partition_by: list[str] | None = None) -> "DataStore":
        """Null interpolation (reference pandas_compat.py:1239). 'ffill'
        carries the last non-null forward; 'linear' places nulls on the
        line between the surrounding non-nulls, weighted by row distance."""
        parts = partition_by or []
        back = Window.partitionBy(*parts).orderBy(order_by).rowsBetween(Window.unboundedPreceding, 0)
        fwd = Window.partitionBy(*parts).orderBy(order_by).rowsBetween(0, Window.unboundedFollowing)
        prev_v = F.last(col, ignorenulls=True).over(back)
        if method == "ffill":
            return DataStore(self._df.withColumn(col, prev_v))
        next_v = F.first(col, ignorenulls=True).over(fwd)
        base = Window.partitionBy(*parts).orderBy(order_by)
        rn = F.row_number().over(base)
        prev_rn = F.last(F.when(F.col(col).isNotNull(), rn), ignorenulls=True).over(back)
        next_rn = F.first(F.when(F.col(col).isNotNull(), rn), ignorenulls=True).over(fwd)
        frac = (rn - prev_rn) / (next_rn - prev_rn)
        filled = (
            F.when(F.col(col).isNotNull(), F.col(col))
            .when(prev_v.isNull(), next_v)
            .when(next_v.isNull(), prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        return DataStore(self._df.withColumn(col, filled))

    def _ordered_window(self, order_by: str | None, partition_by: list[str] | None):
        order = F.col(order_by) if order_by else F.monotonically_increasing_id()
        return Window.partitionBy(*(partition_by or [])).orderBy(order)

    def _cum_window(self, order_by: str | None, partition_by: list[str] | None):
        return self._ordered_window(order_by, partition_by).rowsBetween(
            Window.unboundedPreceding, 0
        )

    # -- grouping ------------------------------------------------------------

    def groupby(self, *cols) -> "GroupBy":
        flat = []
        for c in cols:
            flat.extend(c) if isinstance(c, list) else flat.append(c)
        return GroupBy(self._df, flat)

    # -- case builder (reference core.py:6539) -------------------------------

    def when(self, cond, value) -> "CaseWhen":
        return CaseWhen(self).when(cond, value)

    # -- SQL passthrough ------------------------------------------------------

    def sql(self, query: str, view_name: str = "__ds__") -> "DataStore":
        """Raw SQL over this frame (reference core.py:6622): the frame is
        registered as ``__df__`` (and ``view_name``). Supports the
        reference's SHORT FORM — a bare condition/clause fragment like
        ``"value > 100 LIMIT 10"`` or ``"ORDER BY name"`` auto-expands to
        ``SELECT * FROM __df__ …``. CH dialect accepted like every other
        SQL entry point."""
        import re as _re

        from chdb_spark.dialect import rewrite

        self._df.createOrReplaceTempView(view_name)
        self._df.createOrReplaceTempView("__df__")
        q = query.strip()
        if not _re.match(r"(?is)^\s*(SELECT|WITH|EXPLAIN|DESCRIBE|SHOW)\b", q):
            if _re.match(r"(?is)^\s*(ORDER|LIMIT|GROUP|WHERE|HAVING)\b", q):
                q = f"SELECT * FROM __df__ {q}"
            else:
                q = f"SELECT * FROM __df__ WHERE {q}"
        return DataStore(self._df.sparkSession.sql(rewrite(q)))

    run_sql = sql


class GroupBy:
    """LazyGroupBy facade (reference datastore/groupby.py:48-971)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def _g(self):
        return self._df.groupBy(*self._keys)

    def agg(self, spec=None, **named) -> DataStore:
        """dict spec {'col': 'sum'|['sum','max']} or named kwargs
        new_name=('col','fn') — mirroring pandas named aggregation."""
        exprs: list[Column] = []
        if isinstance(spec, dict):
            for col, fns in spec.items():
                for fn in [fns] if isinstance(fns, str) else fns:
                    exprs.append(_agg_expr(fn, col).alias(f"{col}_{fn}"))
        elif isinstance(spec, (list, tuple)):
            for fn in spec:
                for col in self._df.columns:
                    if col not in self._keys:
                        exprs.append(_agg_expr(fn, col).alias(f"{col}_{fn}"))
        for name, (col, fn) in named.items():
            exprs.append(_agg_expr(fn, col).alias(name))
        return DataStore(self._g().agg(*exprs))

    def _simple(self, fn: str) -> DataStore:
        numeric = [
            c
            for c, t in self._df.dtypes
            if c not in self._keys
            and t in ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")
        ]
        cols = numeric or [c for c in self._df.columns if c not in self._keys]
        return DataStore(self._g().agg(*[_agg_expr(fn, c).alias(c) for c in cols]))

    def sum(self):
        return self._simple("sum")

    def mean(self):
        return self._simple("mean")

    def min(self):
        return self._simple("min")

    def max(self):
        return self._simple("max")

    def count(self):
        return DataStore(self._g().agg(F.count("*").alias("count")))

    def size(self):
        return DataStore(self._g().agg(F.count("*").alias("size")))

    def std(self):
        return self._simple("std")

    def var(self):
        return self._simple("var")

    def first(self):
        return self._simple("first")

    def last(self):
        return self._simple("last")

    def nunique(self):
        cols = [c for c in self._df.columns if c not in self._keys]
        return DataStore(self._g().agg(*[F.count_distinct(c).alias(c) for c in cols]))

    def having(self, cond) -> DataStore:
        raise NotImplementedError("call .agg(...) first, then .filter(cond) — Catalyst emits HAVING")

    def filter(self, fn: str, col: str, cond: Callable[[Column], Column]) -> DataStore:
        """pandas groupby.filter (reference groupby.py:849): keep the FULL
        rows of groups whose aggregate satisfies cond — a window aggregate
        plus a row filter, no join, no second shuffle past the window."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(*self._keys)
        marker = _agg_expr(fn, col).over(w)
        return DataStore(
            self._df.withColumn("__g_agg__", marker)
            .filter(cond(F.col("__g_agg__")))
            .drop("__g_agg__")
        )

    def transform(self, fn: str, col: str) -> DataStore:
        """group-wise transform via window (reference groupby.py:804):
        result has the same row count, with the group aggregate attached."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(*self._keys)
        return DataStore(self._df.withColumn(f"{col}_{fn}", _agg_expr(fn, col).over(w)))

    def apply_in_pandas(self, fn: Callable, schema) -> DataStore:
        """Arbitrary group-wise apply → applyInPandas (reference
        groupby.py:900 LazyApply; Arrow-batched, distributed per group)."""
        return DataStore(self._g().applyInPandas(fn, schema))


_AGG_FNS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "nunique": F.count_distinct,
    "median": F.median,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}


def _agg_expr(fn: str, col: str) -> Column:
    if fn not in _AGG_FNS:
        raise ValueError(f"unknown agg fn: {fn} (have {sorted(_AGG_FNS)})")
    return _AGG_FNS[fn](col)


class CaseWhen:
    """Chained case builder (reference case_when.py:41,325)."""

    def __init__(self, ds: DataStore):
        self._ds = ds
        self._expr: Column | None = None

    def when(self, cond, value) -> "CaseWhen":
        v = value if isinstance(value, Column) else F.lit(value)
        self._expr = F.when(cond, v) if self._expr is None else self._expr.when(cond, v)
        return self

    def else_(self, value) -> Column:
        v = value if isinstance(value, Column) else F.lit(value)
        return self._expr.otherwise(v)


class _InsertBuilder:
    """``insert_into(...).select_from(ds).execute()`` — defers until
    execute(), then writes via the auto-dispatch sink (one distributed
    write job, no driver materialization)."""

    def __init__(self, target: dict, cols: list[str], kind: str = "file"):
        self._target = target
        self._cols = cols
        self._kind = kind
        self._source: DataStore | None = None

    def select_from(self, source: "DataStore") -> "_InsertBuilder":
        self._source = source
        return self

    def execute(self) -> None:
        if self._source is None:
            raise ValueError("select_from(...) must be called before execute()")
        df = self._source._df
        if self._cols:
            df = df.select(*self._cols)
        kind = (self._kind or "file").lower()
        path = self._target.get("path") or self._target.get("url")
        if kind in ("deltalake", "delta"):
            from chdb_spark.sources.delta_py import write_delta_py

            write_delta_py(df, path, mode="append")
            return
        if kind == "iceberg":
            from chdb_spark.sources.iceberg_py import write_iceberg_py

            write_iceberg_py(df, path, mode="append")
            return
        if kind == "url":
            # Parity with the SQL lane's INSERT INTO FUNCTION url(...)
            # (ADVICE r9: the two INSERT surfaces disagreed on what is
            # writable) — per-partition HTTP POSTs, no driver funnel.
            from chdb_spark.sources.uri import write_url

            write_url(df, path, self._target.get("format") or "CSVWithNames")
            return
        if kind in ("s3", "gcs", "hdfs", "azureblobstorage"):
            # same jar probe as the SQL lane (r10): dispatch through the
            # Hadoop FS layer when the scheme's classes exist
            from chdb_spark.dialect import _hadoop_fs_available
            from chdb_spark.sinks import write_auto

            if not _hadoop_fs_available(df.sparkSession, path):
                raise NotImplementedError(
                    f"insert_into target kind {kind!r}: object stores "
                    "need their runtime jars (hadoop-aws / gcs-connector "
                    "/ hadoop-azure) on the classpath"
                )
            from chdb_spark.dialect import resolve_write_format

            fmt, wopts = resolve_write_format(
                self._target.get("format"), path
            )
            write_auto(df, path, fmt=fmt, mode="append", **wopts)
            return
        if kind != "file":
            raise NotImplementedError(
                f"insert_into target kind {kind!r}: writable targets are "
                "file/deltaLake/iceberg (object stores and Hudi need "
                "their runtime jars)"
            )
        from chdb_spark.dialect import resolve_write_format
        from chdb_spark.sinks import write_auto

        # CH format names resolve through the same _TF_FORMATS mapping
        # as the SQL lane (ADVICE r10) — both lanes write identical
        # bytes for 'CSVWithNames', headerless 'CSV', 'TSV', …
        fmt, wopts = resolve_write_format(self._target.get("format"), path)
        # INSERT semantics append for every target kind (matching the
        # SQL lane's `INSERT INTO TABLE FUNCTION file(...)` and CH
        # itself) — an overwrite here would silently destroy prior
        # batches on file targets while lakehouse targets accumulate
        write_auto(df, path, fmt=fmt, mode="append", **wopts)


# -- factories (reference entry points) --------------------------------------


def from_file(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataStore:
    """reference core.py:2101 from_file — URI-dispatched."""
    from chdb_spark.sources import read_auto

    return DataStore(read_auto(spark, path, fmt=fmt, **options))


def from_df(spark: SparkSession, pdf) -> DataStore:
    """reference core.py:2702 from_df (Python() table function analogue)."""
    return DataStore(spark.createDataFrame(pdf))


def from_spark(df: DataFrame) -> DataStore:
    return DataStore(df)


def __getattr__(name: str):
    """Module-level pandas API (``from chdb import datastore as pd`` —
    reference datastore/__init__.py re-exports pandas_api + config here).
    Lazy so importing DataStore never drags pandas in."""
    from chdb_spark import accessors as _acc
    from chdb_spark import config as _config
    from chdb_spark import exceptions as _exc
    from chdb_spark import pandas_api as _papi
    from chdb_spark import table_functions as _tf
    from chdb_spark.functions import registry as _freg

    for mod in (_papi, _config, _exc, _acc, _tf, _freg):
        if hasattr(mod, name):
            return getattr(mod, name)
    raise AttributeError(f"module 'chdb_spark.datastore' has no attribute {name!r}")


# pyspark's DataFrame name must not shadow the module-level pandas-API
# DataFrame (→ __getattr__ → pandas_api.DataFrame); annotations above are
# strings (future import), so the class object itself is no longer needed.
del DataFrame

# pandas-compat tail (arith/compare operators, alignment, indexers,
# exports): driver-side delegation, the reference's own strategy —
# see chdb_spark/pandas_compat_ext.py for the contract and ledger.
from chdb_spark.pandas_compat_ext import install as _install_pandas_compat  # noqa: E402

_install_pandas_compat(DataStore)
