"""Driver-side pandas-compat tail of the DataStore API.

The reference implements this whole method family by materializing the
frame to pandas and delegating — every body in its pandas_compat.py is
``self._wrap_result(self._get_df().<name>(...))`` (e.g. ``add`` at
datastore/pandas_compat.py:2513, ``ffill`` at :2782, ``iloc``/``at``/
``iat`` properties at :588-600, ``_wrap_result`` Series-pass-through
contract at :345). This module mirrors that contract: materialize →
pandas → re-wrap DataFrame results, pass Series/scalars through.

Scale posture (SCALE.md): these are *report-shaped* conveniences and run
on the driver BY DESIGN, exactly like the reference's. The distributed
siblings — select/filter/groupBy/join/window and the write_auto sinks —
are the 100 TB path; every generated docstring says so. One divergence:
re-wrapping converts pandas → Spark, so a non-trivial result index is
preserved by resetting it into ordinary columns (the reference keeps the
pandas index object; Spark has no row index — SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import Iterable

#: plain methods: materialize, unwrap DataStore args, delegate, re-wrap.
_DELEGATED: tuple[str, ...] = (
    # arithmetic (+ reversed variants) and comparison operators
    "add", "sub", "subtract", "mul", "multiply", "div", "divide", "truediv",
    "floordiv", "mod", "pow", "radd", "rsub", "rmul", "rdiv", "rtruediv",
    "rfloordiv", "rmod", "rpow", "dot",
    "eq", "ne", "lt", "le", "gt", "ge",
    # alignment / combination
    "align", "combine", "combine_first", "compare", "reindex",
    "reindex_like", "equals",
    # missing-data & elementwise
    "ffill", "bfill", "pad", "backfill", "isnull", "notnull", "map",
    "where",
    # reductions / stats not already distributed
    "idxmax", "idxmin", "sem", "kurtosis", "product", "memory_usage",
    "agg", "aggregate", "corrwith", "transform", "first", "last",
    "tz_convert", "tz_localize",
    # index & label gymnastics
    "asof", "at_time", "between_time", "first_valid_index",
    "last_valid_index", "droplevel", "swaplevel", "reorder_levels",
    "rename_axis", "set_axis", "swapaxes", "take", "xs", "truncate",
    "get", "keys", "isin", "select_dtypes",
    "infer_objects", "convert_dtypes", "copy", "set_flags", "bool",
    "asfreq", "to_period", "to_timestamp", "stack", "pivot",
    # renders / exports (driver-side files or strings; optional deps
    # raise their own ImportError, same as the reference)
    "to_string", "to_latex", "to_xml", "to_pickle", "to_stata", "to_hdf",
    "to_clipboard", "to_gbq", "to_xarray",
    # plotting (needs matplotlib, reference delegates identically)
    "hist", "boxplot",
)

#: read-only properties delegating to the materialized frame.
_PROPERTIES: tuple[str, ...] = (
    "empty", "ndim", "axes", "values", "index", "attrs", "flags",
    "at", "iat", "loc", "iloc", "style", "plot", "sparse", "size",
)


def _unwrap(v, cls):
    return v.to_df() if isinstance(v, cls) else v


def _rewrap(res, cls):
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        # Spark has no row index: fold a meaningful index back into
        # columns before the round-trip (divergence ledger, SURVEY §1.4)
        idx = res.index
        trivial = isinstance(idx, pd.RangeIndex) and idx.name is None
        return cls(res if trivial else res.reset_index())
    return res


def _make_method(name: str, cls):
    def method(self, *args, **kwargs):
        pdf = self.to_df()
        args = [_unwrap(a, cls) for a in args]
        kwargs = {k: _unwrap(v, cls) for k, v in kwargs.items()}
        return _rewrap(getattr(pdf, name)(*args, **kwargs), cls)

    method.__name__ = name
    method.__doc__ = (
        f"pandas-compat ``{name}`` — driver-side materialize-and-delegate, "
        "the reference's own strategy (datastore/pandas_compat.py); "
        "report-sized results only, the distributed path is the native "
        "DataFrame API."
    )
    return method


def _make_property(name: str, cls):
    def getter(self):
        return getattr(self.to_df(), name)

    getter.__name__ = name
    getter.__doc__ = (
        f"pandas-compat ``{name}`` of the materialized frame (driver-side, "
        "read-only — writes to the returned object do not propagate)."
    )
    return property(getter)


def install(cls) -> None:
    """Attach the delegated surface to ``DataStore`` (never overrides an
    existing native/distributed implementation)."""
    # native distributed agg exists — aggregate must alias it, not the
    # pandas delegation (reference: aggregate is an alias of agg)
    if hasattr(cls, "agg") and not hasattr(cls, "aggregate"):
        cls.aggregate = cls.agg
    for name in _DELEGATED:
        if not hasattr(cls, name):
            setattr(cls, name, _make_method(name, cls))
    for name in _PROPERTIES:
        if not hasattr(cls, name):
            setattr(cls, name, _make_property(name, cls))

    # --- in-place pandas members: DataStore is immutable (the reference's
    # own inplace= paths raise ImmutableError), so a blind delegation
    # would mutate a throwaway materialized copy and silently lose the
    # change. `update` returns the merged frame instead; pop/isetitem
    # point at the immutable alternative. ---------------------------------
    if not hasattr(cls, "update"):
        def update(self, other, **kw):
            """pandas ``update`` semantics, immutably: returns a NEW frame
            with non-NA values of ``other`` merged in (pandas mutates in
            place; this engine's frames are immutable — divergence
            ledgered in COVERAGE.md)."""
            pdf = self.to_df()
            pdf.update(_unwrap(other, cls), **kw)
            return _rewrap(pdf, cls)

        cls.update = update

    def _immutable(name: str, alternative: str):
        def method(self, *a, **kw):
            raise TypeError(
                f"DataStore.{name} mutates in place; DataStore is "
                f"immutable — use {alternative} instead"
            )

        method.__name__ = name
        return method

    if not hasattr(cls, "pop"):
        cls.pop = _immutable("pop", "ds[col] to read it and ds.drop(col)")
    if not hasattr(cls, "isetitem"):
        cls.isetitem = _immutable("isetitem", "with_column/assign")

    # --- methods pandas 2.x itself dropped (reference keeps them) --------
    if not hasattr(cls, "append"):
        def append(self, other, ignore_index: bool = False, **kw):
            """pandas<2 ``append`` (reference pandas_compat.py keeps it):
            row-wise concat, driver-side."""
            import pandas as pd

            return _rewrap(
                pd.concat([self.to_df(), _unwrap(other, cls)],
                          ignore_index=ignore_index), cls
            )

        cls.append = append

    if not hasattr(cls, "mad"):
        def mad(self, axis: int = 0, skipna: bool = True):
            """Mean absolute deviation (removed from pandas 2; reference
            still exposes it) — numeric columns, driver-side."""
            pdf = self.to_df().select_dtypes("number")
            return (pdf - pdf.mean(axis=axis, skipna=skipna)).abs().mean(
                axis=axis, skipna=skipna
            )

        cls.mad = mad

    if not hasattr(cls, "iteritems"):
        def iteritems(self):
            """pandas<2 alias of ``items`` (reference keeps it)."""
            return self.to_df().items()

        cls.iteritems = iteritems

    if not hasattr(cls, "applymap"):
        def applymap(self, func, **kw):
            """Elementwise map (pandas 2 deprecates in favor of
            ``DataFrame.map``) — driver-side."""
            pdf = self.to_df()
            fn = getattr(pdf, "map", None) or pdf.applymap
            return _rewrap(fn(func, **kw), cls)

        cls.applymap = applymap

    # --- classmethod constructors (reference pandas_compat.py) -----------
    if not hasattr(cls, "from_dict"):
        def from_dict(data, orient: str = "columns", **kw):
            import pandas as pd

            return cls(pd.DataFrame.from_dict(data, orient=orient, **kw))

        cls.from_dict = staticmethod(from_dict)

    if not hasattr(cls, "from_records"):
        def from_records(data: Iterable, **kw):
            import pandas as pd

            return cls(pd.DataFrame.from_records(data, **kw))

        cls.from_records = staticmethod(from_records)
