"""Pandas-compatible module-level functions — the reference's
``from chdb import datastore as pd`` surface (reference
datastore/pandas_api.py:46-1958; ~40 documented examples alias the module
as ``pd`` and call ``pd.read_csv / pd.concat / pd.merge / pd.cut`` …).

Dispatch rule, same as the reference's: inputs that are already
DataStores stay distributed (delegating to the DataStore method, one Spark
plan); plain Python / pandas inputs (lists, Series, scalars) are
driver-side helper calls and delegate to real pandas — exactly the
reference's "pandas-executed" tier, which is the right engine for
driver-sized data. No data moves between the tiers implicitly.
"""

from __future__ import annotations

from typing import Any

from chdb_spark.datastore import DataStore

__all__ = [
    "DataFrame",
    "Series",
    "make_datastore",
    "read_csv",
    "read_parquet",
    "read_json",
    "read_orc",
    "read_table",
    "read_feather",
    "read_sql",
    "read_sql_query",
    "concat",
    "merge",
    "merge_asof",
    "merge_ordered",
    "isna",
    "isnull",
    "notna",
    "notnull",
    "to_datetime",
    "to_numeric",
    "to_timedelta",
    "date_range",
    "bdate_range",
    "timedelta_range",
    "period_range",
    "cut",
    "qcut",
    "get_dummies",
    "factorize",
    "unique",
    "value_counts",
    "melt",
    "pivot_table",
    "json_normalize",
    "crosstab",
]


def _pd():
    import pandas

    return pandas


def _is_ds(x: Any) -> bool:
    return isinstance(x, DataStore)


# -- creation ---------------------------------------------------------------


def DataFrame(data=None, columns=None, **kw) -> DataStore:  # noqa: N802
    """``pd.DataFrame({...})`` → a DataStore (reference pandas_api.py:1873
    DataFrame == DataStore)."""
    pdf = _pd().DataFrame(data, columns=columns, **kw)
    return DataStore(pdf)


def Series(data=None, **kw):  # noqa: N802
    """Driver-side Series (the reference re-exports pandas' for
    monkey-patch compatibility)."""
    return _pd().Series(data, **kw)


def make_datastore(data=None, **kw) -> DataStore:
    return DataFrame(data, **kw)


# -- readers ----------------------------------------------------------------


def read_csv(path, sep=",", **kw) -> DataStore:
    return DataStore.from_file(path, fmt="csv", sep=sep, header="true",
                               inferSchema="true", **kw)


def read_parquet(path, columns=None, **kw) -> DataStore:
    ds = DataStore.from_file(path, fmt="parquet", **kw)
    return ds.select(*columns) if columns else ds


def read_json(path, lines=True, **kw) -> DataStore:
    return DataStore.from_file(path, fmt="json", **kw)


def read_orc(path, columns=None, **kw) -> DataStore:
    ds = DataStore.from_file(path, fmt="orc", **kw)
    return ds.select(*columns) if columns else ds


def read_table(path, sep="\t", **kw) -> DataStore:
    return read_csv(path, sep=sep, **kw)


def read_feather(path, columns=None, **kw) -> DataStore:
    ds = DataStore.from_file(path, fmt="arrow", **kw)
    return ds.select(*columns) if columns else ds


def read_sql(sql: str, con=None, **kw) -> DataStore:
    """``con`` may be a SparkSession (or None → shared session); the
    reference's connection-string forms route through its engine the same
    way (pandas_api.py:556)."""
    from chdb_spark.session import get_spark, query

    spark = con if con is not None and hasattr(con, "sql") else get_spark()
    return DataStore(query(spark, sql, "DataFrame"))


read_sql_query = read_sql


# -- combination ------------------------------------------------------------


def concat(objs, axis=0, ignore_index=False, **kw):
    objs = list(objs)
    if not objs:
        raise ValueError("No objects to concatenate")
    if any(_is_ds(o) for o in objs):
        if axis != 0:
            raise NotImplementedError(
                "concat(axis=1) on DataStores: use merge/join on a key "
                "(positional column concat has no distributed meaning)"
            )
        out = objs[0] if _is_ds(objs[0]) else DataStore(_pd().DataFrame(objs[0]))
        for o in objs[1:]:
            out = out.concat(o if _is_ds(o) else DataStore(_pd().DataFrame(o)))
        return out
    return _pd().concat(objs, axis=axis, ignore_index=ignore_index, **kw)


def merge(left, right, **kw):
    if _is_ds(left):
        return left.merge(right, **kw)
    return _pd().merge(left, right, **kw)


def merge_asof(left, right, **kw):
    if _is_ds(left):
        return left.merge_asof(right, **kw)
    return _pd().merge_asof(left, right, **kw)


def merge_ordered(left, right, **kw):
    if _is_ds(left):
        return left.merge_ordered(right, **kw)
    return _pd().merge_ordered(left, right, **kw)


# -- null predicates ---------------------------------------------------------


def isna(obj):
    """Scalar/array → pandas; DataStore → per-cell null flags as a
    DataStore (one select, no shuffle)."""
    if _is_ds(obj):
        from pyspark.sql import functions as F

        return DataStore(
            obj.df.select(*[F.isnull(c).alias(c) for c in obj.columns])
        )
    return _pd().isna(obj)


isnull = isna


def notna(obj):
    if _is_ds(obj):
        from pyspark.sql import functions as F

        return DataStore(
            obj.df.select(*[(~F.isnull(c)).alias(c) for c in obj.columns])
        )
    return _pd().notna(obj)


notnull = notna


# -- conversion / ranges (driver-side helpers, pandas tier by design) -------


def to_datetime(arg, **kw):
    return _pd().to_datetime(arg, **kw)


def to_numeric(arg, **kw):
    return _pd().to_numeric(arg, **kw)


def to_timedelta(arg, **kw):
    return _pd().to_timedelta(arg, **kw)


def date_range(*a, **kw):
    return _pd().date_range(*a, **kw)


def bdate_range(*a, **kw):
    return _pd().bdate_range(*a, **kw)


def timedelta_range(*a, **kw):
    return _pd().timedelta_range(*a, **kw)


def period_range(*a, **kw):
    return _pd().period_range(*a, **kw)


# -- binning / encoding ------------------------------------------------------


def cut(x, bins, labels=None, **kw):
    return _pd().cut(x, bins, labels=labels, **kw)


def qcut(x, q, labels=None, **kw):
    return _pd().qcut(x, q, labels=labels, **kw)


def get_dummies(data, prefix=None, columns=None, **kw):
    """DataStore → distributed one-hot via pivot-style flags (same shape
    as the r3 oracle query); pandas input → pandas."""
    if _is_ds(data):
        from pyspark.sql import functions as F

        cols = columns or [c for c, t in data.dtypes if t == "string"]
        df = data.df
        out_cols = [c for c in data.columns if c not in cols]
        exprs = [df[c] for c in out_cols]
        for c in cols:
            vals = [r[0] for r in df.select(c).distinct().orderBy(c).collect()]
            pfx = prefix if isinstance(prefix, str) else c
            exprs += [
                (df[c] == v).cast("int").alias(f"{pfx}_{v}") for v in vals
            ]
        return DataStore(df.select(*exprs))
    return _pd().get_dummies(data, prefix=prefix, columns=columns, **kw)


def factorize(values, **kw):
    return _pd().factorize(values, **kw)


def unique(values):
    if _is_ds(values):
        return values.df.distinct()
    return _pd().unique(values)


def value_counts(values, **kw):
    if _is_ds(values):
        col = values.columns[0]
        return values.value_counts(col)
    return _pd().Series(values).value_counts(**kw)


# -- reshaping ---------------------------------------------------------------


def melt(frame, id_vars=None, value_vars=None, var_name="variable",
         value_name="value", **kw):
    if _is_ds(frame):
        return frame.melt(id_vars, value_vars, var_name, value_name)
    return _pd().melt(frame, id_vars=id_vars, value_vars=value_vars,
                      var_name=var_name, value_name=value_name, **kw)


def pivot_table(data, values=None, index=None, columns=None, aggfunc="mean",
                **kw):
    if _is_ds(data):
        return data.pivot_table(index, columns, values, aggfunc=aggfunc)
    return _pd().pivot_table(data, values=values, index=index,
                             columns=columns, aggfunc=aggfunc, **kw)


def json_normalize(data, sep: str = "."):
    """Nested dicts → flat DataStore columns (pandas.json_normalize shape,
    built on chdb_spark.utils.flatten_dict — the same flattener the
    reference documents in utils.rst)."""
    from chdb_spark.utils import convert_to_columnar

    if isinstance(data, dict):
        data = [data]
    cols = convert_to_columnar(list(data), sep=sep)
    return DataFrame(cols)


def crosstab(index, columns, values=None, aggfunc=None, **kw):
    """pandas.crosstab for driver-side arrays; DataStore callers use
    ``DataStore.pivot_table``/the r2 crosstab shape for distributed data."""
    return _pd().crosstab(index, columns, values=values, aggfunc=aggfunc, **kw)


# ---------------------------------------------------------------------------
# module-level tail (reference datastore/pandas_api.py:532-2290): driver-side
# pandas readers/reshapers/config — the reference delegates every one of
# these straight to pandas and wraps frames; identical contract here.
# Optional engines (openpyxl, lxml, pyreadstat, tables…) raise their own
# ImportError unchanged, exactly as the reference's do.
# ---------------------------------------------------------------------------


def _wrap_pd_reader(name):
    def reader(*a, **kw):
        res = getattr(_pd(), name)(*a, **kw)
        import pandas as pd

        if isinstance(res, pd.DataFrame):
            return make_datastore(res)
        if isinstance(res, list):  # read_html returns [DataFrame, ...]
            return [make_datastore(x) if isinstance(x, pd.DataFrame) else x
                    for x in res]
        return res

    reader.__name__ = name
    reader.__doc__ = (
        f"pandas ``{name}`` → DataStore (reference pandas_api.py delegation;"
        " driver-side, report-sized inputs — columnar formats use the"
        " distributed read_parquet/read_orc path)."
    )
    return reader


read_excel = _wrap_pd_reader("read_excel")
read_fwf = _wrap_pd_reader("read_fwf")
read_hdf = _wrap_pd_reader("read_hdf")
read_html = _wrap_pd_reader("read_html")
read_pickle = _wrap_pd_reader("read_pickle")
read_sas = _wrap_pd_reader("read_sas")
read_spss = _wrap_pd_reader("read_spss")
read_stata = _wrap_pd_reader("read_stata")
read_xml = _wrap_pd_reader("read_xml")


def read_sql_table(table_name, con, schema=None, **kw):
    """pandas read_sql_table → DataStore (reference pandas_api.py:986).
    For the distributed path use sources.rdbms (range-partitioned)."""
    return make_datastore(_pd().read_sql_table(table_name, con, schema=schema, **kw))


def read_iceberg(table: str, spark=None, **kw):
    """Iceberg table scan → DataStore (reference read_iceberg) — Spark-native
    DISTRIBUTED read via the iceberg connector; jar-gated like the write
    path (tests/test_lakehouse_gated.py)."""
    from chdb_spark.session import get_spark

    return DataStore((spark or get_spark()).read.format("iceberg").load(table))


def pivot(data, *, columns, index=None, values=None):
    """module-level pivot (reference pandas_api.py:1933) — DataStore goes
    through the materialize-and-delegate compat tail, raw frames straight
    to pandas."""
    if _is_ds(data):
        return data.pivot(columns=columns, index=index, values=values)
    return make_datastore(_pd().pivot(data, columns=columns, index=index, values=values))


def wide_to_long(df, stubnames, i, j, sep="", suffix=r"\d+"):
    """pandas wide_to_long → DataStore (reference pandas_api.py:2078)."""
    pdf = df.to_df() if _is_ds(df) else df
    res = _pd().wide_to_long(pdf, stubnames, i, j, sep=sep, suffix=suffix)
    return make_datastore(res.reset_index())


def interval_range(*a, **kw):
    return _pd().interval_range(*a, **kw)


def infer_freq(index):
    return _pd().infer_freq(index)


def array(data, dtype=None, copy=True):
    return _pd().array(data, dtype=dtype, copy=copy)


def set_option(pat, value):
    """pandas display/config option passthrough (reference
    pandas_api.py:2175)."""
    _pd().set_option(pat, value)


def get_option(pat):
    return _pd().get_option(pat)


def reset_option(pat):
    _pd().reset_option(pat)


def describe_option(pat="", _print_desc=True):
    return _pd().describe_option(pat)


def option_context(*args):
    return _pd().option_context(*args)


def show_versions(as_json=False):
    """Version report: pandas' own, plus the Spark runtime this engine
    executes on (reference pandas_api.py:2258 prints its engine block)."""
    import pyspark

    print(f"chdb_spark engine: pyspark {pyspark.__version__}")
    return _pd().show_versions(as_json=as_json)
