"""Batch-3 registry widening tests (scalar_ext2 / collection_ext /
aggregate_ext): every new function family is exercised against a live
session and a curated subset asserts exact values — same discipline as
test_functions_registry.py (mirrors the reference's rule that every
registered function must be reachable and well-typed)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from chdb_spark.functions import all_functions, fn, has


def _row(spark, cols: dict):
    df = spark.range(1).select(*[v.alias(k) for k, v in cols.items()])
    return df.collect()[0].asDict()


def test_registry_reaches_reference_parity():
    # reference registers 746 unique names; after batch 3 we exceed that
    assert len(all_functions()) >= 746


def test_string_batch3_values(spark):
    out = _row(
        spark,
        {
            "swap": fn("swapcase")(F.lit("Hello")),
            "low": fn("islower")(F.lit("abc")),
            "up": fn("isupper")(F.lit("ABC")),
            "mixed_not_low": fn("islower")(F.lit("aBc")),
            "mmi": fn("multiMatchAnyIndex")(F.lit("Hello World"), ["zzz", "World"]),
            "msfp": fn("multiSearchFirstPosition")(F.lit("Hello World"), ["World", "He"]),
            "ngd_same": fn("ngramDistance")(F.lit("hello"), F.lit("hello")),
            "ngs": fn("ngramSearch")(F.lit("hello world"), F.lit("hello")),
            "html": fn("extractTextFromHTML")(F.lit("<p>Hi <b>there</b></p>")),
            "frs": fn("formatReadableSize")(F.lit(1536)),
            "frq": fn("formatReadableQuantity")(F.lit(1_500_000)),
            "frt": fn("formatReadableTimeDelta")(F.lit(90061)),
            "nq": fn("normalizeQuery")(F.lit("SELECT 42 WHERE s='x'")),
            "groups": fn("extractAllGroups")(F.lit("a=1,b=2"), r"(\w)=\d"),
        },
    )
    assert out["swap"] == "hELLO"
    assert out["low"] is True and out["up"] is True and out["mixed_not_low"] is False
    assert out["mmi"] == 2
    assert out["msfp"] == 1  # "He" at 1 beats "World" at 7
    assert out["ngd_same"] == 0.0
    assert out["ngs"] == 1.0
    assert out["html"] == "Hi there"
    assert out["frs"] == "1.50 KiB"
    assert out["frq"] == "1.50 million"
    assert out["frt"] == "1 days, 1 hours, 1 minutes, 1 seconds"
    assert out["nq"] == "SELECT ? WHERE s=?"
    assert out["groups"] == ["a", "b"]


def test_fuzzy_string_udfs(spark):
    out = _row(
        spark,
        {
            "jaro": fn("jaroSimilarity")(F.lit("MARTHA"), F.lit("MARHTA")),
            "jw": fn("jaroWinklerSimilarity")(F.lit("MARTHA"), F.lit("MARHTA")),
            "dl": fn("damerauLevenshteinDistance")(F.lit("abcd"), F.lit("abdc")),
        },
    )
    assert abs(out["jaro"] - 0.944444) < 1e-4
    assert abs(out["jw"] - 0.961111) < 1e-4
    assert out["dl"] == 1  # one transposition (plain levenshtein would say 2)


def test_jaro_batch_kernel_matches_per_row_reference():
    """The vectorized batch-vs-target jaro/winkler kernels (fz1's UDF
    lane) must reproduce the per-row reference exactly — including the
    greedy window matching, transposition order, empty/equal shortcuts,
    window = -1 degenerate, and the ≤4-char Winkler prefix boost."""
    import random

    import pandas as pd

    from chdb_spark.functions.scalar_ext2 import (
        _jaro_batch_vs_target,
        _jaro_py,
        _jw_batch_vs_target,
    )

    def jw_py(x: str, y: str) -> float:
        j = _jaro_py(x, y)
        if j <= 0.7:
            return j
        p = 0
        for cx, cy in zip(x[:4], y[:4]):
            if cx != cy:
                break
            p += 1
        return j + p * 0.1 * (1 - j)

    random.seed(42)
    pool = [
        "".join(
            random.choice("abcdef" if random.random() < 0.8 else "αβγ €漢")
            for _ in range(random.randint(0, 12))
        )
        for _ in range(3000)
    ]
    pool += ["", "a", "aa", "MARTHA", "MARHTA", "Customer#000000042"]
    xs = pd.Series(pool)
    for y in ["", "a", "ab", "MARHTA", "Customer#000000042", "ααββ"]:
        got_j = _jaro_batch_vs_target(xs, y)
        got_w = _jw_batch_vs_target(xs, y)
        for i, x in enumerate(pool):
            assert abs(got_j[i] - _jaro_py(x, y)) < 1e-12, (x, y)
            assert abs(got_w[i] - jw_py(x, y)) < 1e-12, (x, y)


def test_fuzzy_metric_unblocked_guard(spark):
    """The per-pair Python kernels warn (once per function) when built
    outside allow_unblocked(); inside the scope they are silent — so no
    silent O(n²) path is reachable through the registry (VERDICT r6 #5)."""
    import warnings

    from chdb_spark.functions import scalar_ext2

    scalar_ext2._PAIRWISE_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fn("jaroWinklerSimilarity")(F.lit("a"), F.lit("b"))
        assert any("O(n²)" in str(x.message) for x in w), "bare use must warn"
    scalar_ext2._PAIRWISE_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with scalar_ext2.allow_unblocked():
            fn("jaroWinklerSimilarity")(F.lit("a"), F.lit("b"))
            fn("damerauLevenshteinDistance")(F.lit("a"), F.lit("b"))
        assert not w, "acknowledged use must be silent"
    # one-time: a second bare use of an already-warned function is silent
    scalar_ext2._PAIRWISE_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fn("jaroSimilarity")(F.lit("a"), F.lit("b"))
        fn("jaroSimilarity")(F.lit("a"), F.lit("b"))
        assert len(w) == 1


def test_datetime_batch3_values(spark):
    ts = F.lit("2024-03-31 12:34:56").cast("timestamp")
    out = _row(
        spark,
        {
            "me": fn("is_month_end")(ts),
            "qe": fn("is_quarter_end")(ts),
            "ms_start": fn("is_month_start")(F.lit("2024-03-01").cast("date")),
            "ms": fn("toMillisecond")(F.lit("2024-01-01 00:00:01.123456").cast("timestamp")),
            "us": fn("toMicrosecond")(F.lit("2024-01-01 00:00:01.123456").cast("timestamp")),
            "pd": fn("parseDateTime")(F.lit("2024-01-02 03:04:05")).cast("string"),
            "pdn": fn("parseDateTimeOrNull")(F.lit("junk")),
            "snow": fn("snowflakeToDateTime")(F.lit(1545802964546835456)).cast("date").cast("string"),
            "days0": fn("toDaysSinceYearZero")(F.lit("1970-01-01").cast("date")),
            "days0_inv": fn("fromDaysSinceYearZero")(F.lit(719528)).cast("string"),
            "ceil_h": fn("dateCeil")(ts, "hour").cast("string"),
            "ceil_noop": fn("dateCeil")(F.lit("2024-01-01 05:00:00").cast("timestamp"), "hour").cast("string"),
        },
    )
    assert out["me"] is True and out["qe"] is True and out["ms_start"] is True
    assert out["ms"] == 123 and out["us"] == 123456
    assert out["pd"] == "2024-01-02 03:04:05"
    assert out["pdn"] is None
    assert out["snow"] == "2022-07-09"
    assert out["days0"] == 719528
    assert out["days0_inv"] == "1970-01-01"
    assert out["ceil_h"] == "2024-03-31 13:00:00"
    assert out["ceil_noop"] == "2024-01-01 05:00:00"


def test_snowflake_roundtrip(spark):
    ts = F.lit("2024-03-31 12:34:56").cast("timestamp")
    out = _row(
        spark,
        {"rt": fn("snowflakeToDateTime")(fn("dateTimeToSnowflake")(ts)).cast("string")},
    )
    assert out["rt"] == "2024-03-31 12:34:56"


def test_math_batch3_values(spark):
    out = _row(
        spark,
        {
            "lcm": fn("lcm")(F.lit(4), F.lit(6)),
            "gcd": fn("gcd")(F.lit(12), F.lit(18)),
            "lg": fn("lgamma")(F.lit(5.0)),
            "tg": fn("tgamma")(F.lit(5.0)),
            "erfc": fn("erfc")(F.lit(0.0)),
            "trunc": fn("trunc_func")(F.lit(-3.7)),
            "ra": fn("roundAge")(F.lit(40)),
            "rd": fn("roundDuration")(F.lit(95)),
            "rdown": fn("roundDown")(F.lit(7), [1, 5, 10]),
            "ninv": fn("normInv")(F.lit(0.975)),
            "brl": fn("bitRotateLeft")(F.lit(1), 2),
        },
    )
    assert out["lcm"] == 12 and out["gcd"] == 6
    assert abs(out["lg"] - math.lgamma(5.0)) < 1e-8
    assert abs(out["tg"] - 24.0) < 1e-6
    assert abs(out["erfc"] - 1.0) < 1e-6
    assert out["trunc"] == -3.0
    assert out["ra"] == 35 and out["rd"] == 60 and out["rdown"] == 5
    assert abs(out["ninv"] - 1.959964) < 1e-5
    assert out["brl"] == 4


def test_type_conversion_batch3(spark):
    out = _row(
        spark,
        {
            "acn": fn("accurateCastOrNull")(F.lit("abc"), "Int32"),
            "acn_ok": fn("accurateCastOrNull")(F.lit("41"), "Int32"),
            "acd": fn("accurateCastOrDefault")(F.lit("abc"), "Int32", 7),
            "cut0": fn("toStringCutToZero")(F.lit("ab\x00cd")),
            "row_csv": fn("formatRow")("CSV", F.lit(1), F.lit("a")),
            "row_json": fn("formatRow")("JSONEachRow", F.lit(1).alias("x")),
            "i128": fn("toInt128")(F.lit("170141183460469231731687303715884105")),
        },
    )
    assert out["acn"] is None and out["acn_ok"] == 41
    assert out["acd"] == 7
    assert out["cut0"] == "ab"
    assert out["row_csv"] == "1,a"
    assert out["row_json"].startswith("{")
    assert out["i128"] is not None  # Decimal(38,0) holds 36-digit values


def test_encoding_hash_batch3(spark):
    out = _row(
        spark,
        {
            "unbin": fn("unbin")(F.lit("0100100001101001")),
            "bta": fn("bitmaskToArray")(F.lit(50)),
            "btl": fn("bitmaskToList")(F.lit(50)),
            "jh": fn("javaHash")(F.lit("hello")),
            "jh_neg": fn("javaHash")(F.lit("Hello World")),
            "hmd5": fn("halfMD5")(F.lit("abc")),
        },
    )
    assert out["unbin"] == "Hi"
    assert out["bta"] == [2, 16, 32]
    assert out["btl"] == "2,16,32"
    assert out["jh"] == 99162322  # exact java.lang.String.hashCode
    assert out["jh_neg"] == -862545276
    # first 8 bytes of md5("abc") = 900150983cd24fb0 big-endian
    assert int(out["hmd5"]) == 0x900150983CD24FB0


def test_url_uuid_ip_batch3(spark):
    out = _row(
        spark,
        {
            "cut": fn("cutURLParameter")(F.lit("http://a.com/p?x=1&y=2"), "x"),
            "dww": fn("domainWithoutWWW")(F.lit("http://www.a.com/p")),
            "names": fn("extractURLParameterNames")(F.lit("http://a.com/p?x=1&y=2")),
            "params": fn("extractURLParameters")(F.lit("http://a.com/p?x=1&y=2")),
            "u7": fn("generateUUIDv7")(),
            "u0": fn("toUUIDOrZero")(F.lit("junk")),
            "v4to6": fn("IPv4ToIPv6")(F.lit("1.2.3.4")),
        },
    )
    assert out["cut"] == "http://a.com/p?y=2"
    assert out["dww"] == "a.com"
    assert out["names"] == ["x", "y"]
    assert out["params"] == ["x=1", "y=2"]
    assert out["u7"][14] == "7"  # version nibble
    assert out["u0"] == "00000000-0000-0000-0000-000000000000"
    assert out["v4to6"] == "::ffff:1.2.3.4"


def test_uuid_v7_time_ordering(spark):
    rows = spark.range(100).select(fn("generateUUIDv7")().alias("u")).collect()
    prefixes = {r["u"][:8] for r in rows}
    assert len(prefixes) <= 2  # same ~ms timestamp prefix within one batch


def test_array_batch3_values(spark):
    arr = F.array(*[F.lit(float(v)) for v in [3, 1, -4, 1, 5]])
    iarr = F.array(*[F.lit(v) for v in [3, 1, 2, 2, 5]])
    out = _row(
        spark,
        {
            "el": fn("arrayElement")(iarr, 2),
            "first": fn("arrayFirst")(lambda x: x > 2, iarr),
            "last": fn("arrayLast")(lambda x: x > 2, iarr),
            "fidx": fn("arrayFirstIndex")(lambda x: x > 2, iarr),
            "lidx": fn("arrayLastIndex")(lambda x: x > 2, iarr),
            "fidx_none": fn("arrayFirstIndex")(lambda x: x > 99, iarr),
            "fill": fn("arrayFill")(lambda x: x > 0, arr),
            "split": fn("arraySplit")(lambda x: x == 1, iarr),
            "reduce_sum": fn("arrayReduce")("sum", arr),
            "reduce_uniq": fn("arrayReduce")("uniq", iarr),
            "cumnn": fn("arrayCumSumNonNegative")(arr),
            "rotl": fn("arrayRotateLeft")(iarr, 2),
        },
    )
    assert out["el"] == 1
    assert out["first"] == 3 and out["last"] == 5
    assert out["fidx"] == 1 and out["lidx"] == 5 and out["fidx_none"] == 0
    assert out["fill"] == [3.0, 1.0, 1.0, 1.0, 5.0]
    assert out["split"] == [[3], [1, 2, 2, 5]]
    assert out["reduce_sum"] == 6.0 and out["reduce_uniq"] == 4
    assert out["cumnn"] == [3.0, 4.0, 0.0, 1.0, 6.0]
    assert out["rotl"] == [2, 2, 5, 3, 1]


def test_bitmap_algebra(spark):
    a = F.array(*[F.lit(v) for v in [3, 1, 2, 2, 5]])
    b = F.array(F.lit(2), F.lit(5), F.lit(9))
    out = _row(
        spark,
        {
            "build": fn("bitmapBuild")(a),
            "card": fn("bitmapCardinality")(fn("bitmapBuild")(a)),
            "and": fn("bitmapAnd")(fn("bitmapBuild")(a), b),
            "or_card": fn("bitmapOrCardinality")(fn("bitmapBuild")(a), b),
            "xor": fn("bitmapXor")(fn("bitmapBuild")(a), b),
            "has_all": fn("bitmapHasAll")(fn("bitmapBuild")(a), F.array(F.lit(1), F.lit(5))),
            "subset": fn("bitmapSubsetInRange")(fn("bitmapBuild")(a), F.lit(2), F.lit(5)),
        },
    )
    assert out["build"] == [1, 2, 3, 5]
    assert out["card"] == 4
    assert out["and"] == [2, 5]
    assert out["or_card"] == 5
    assert out["xor"] == [1, 3, 9]
    assert out["has_all"] is True
    assert out["subset"] == [2, 3]


def test_map_tuple_batch3(spark):
    m1 = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    m2 = F.create_map(F.lit("b"), F.lit(10), F.lit("c"), F.lit(3))
    out = _row(
        spark,
        {
            "madd": fn("mapAdd")(m1, m2),
            "msub": fn("mapSubtract")(m1, m2),
            "mupd": fn("mapUpdate")(m1, m2),
            "mser": fn("mapPopulateSeries")(F.create_map(F.lit(1), F.lit(10), F.lit(4), F.lit(40))),
            "tplus": fn("tuplePlus")(F.array(F.lit(1), F.lit(2)), F.array(F.lit(10), F.lit(20))),
            "tmul": fn("tupleMultiplyByNumber")(F.array(F.lit(1.0), F.lit(2.0)), 3),
        },
    )
    assert out["madd"] == {"a": 1, "b": 12, "c": 3}
    assert out["msub"] == {"a": 1, "b": -8, "c": -3}
    assert out["mupd"] == {"a": 1, "b": 10, "c": 3}
    assert out["mser"] == {1: 10, 2: 0, 3: 0, 4: 40}
    assert out["tplus"] == [11, 22]
    assert out["tmul"] == [3.0, 6.0]


def test_json_batch3(spark):
    js = F.lit('{"A":1,"b":{"c":"x"}}')
    out = _row(
        spark,
        {
            "ext": fn("JSONExtract")(js, "A", "Int64"),
            "vals": fn("JSONExtractValues")(F.lit('{"a":"1","b":"2"}')),
            "merge": fn("JSONMergePatch")(F.lit('{"a":1,"b":2}'), F.lit('{"b":null,"c":3}')),
            "paths": fn("JSONAllPaths")(js),
            "ci": fn("JSONExtractStringCaseInsensitive")(F.lit('{"Name":"x"}'), "name"),
            "ci_int": fn("JSONExtractIntCaseInsensitive")(js, "a"),
        },
    )
    assert out["ext"] == 1
    assert out["vals"] == ["1", "2"]
    assert out["merge"] == '{"a":1,"c":3}'
    assert out["paths"] == ["A", "b", "b.c"]
    assert out["ci"] == "x" and out["ci_int"] == 1


@pytest.fixture(scope="module")
def events_df(spark):
    return (
        spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 10.0, True),
                (1, "2024-01-01 00:10:00", 12.0, False),
                (1, "2024-01-01 00:20:00", 11.0, True),
                (2, "2024-01-01 01:00:00", 5.0, False),
                (2, "2024-01-01 01:30:00", 8.0, True),
            ],
            ["uid", "ts", "v", "flag"],
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_sequence_aggregates(spark, events_df):
    row = (
        events_df.groupBy("uid")
        .agg(
            fn("sequenceMatch")(F.col("ts"), F.col("flag"), ~F.col("flag")).alias("m"),
            fn("sequenceCount")(F.col("ts"), F.col("flag"), ~F.col("flag")).alias("c"),
            fn("windowFunnel")(3600, F.col("ts"), F.col("flag"), ~F.col("flag")).alias("f"),
            fn("retention")(F.col("flag"), F.col("v") > 10).alias("r"),
            fn("deltaSumTimestamp")(F.col("v"), F.col("ts")).alias("d"),
        )
        .orderBy("uid")
        .collect()
    )
    u1, u2 = row[0], row[1]
    assert u1["m"] is True and u1["c"] == 1 and u1["f"] == 2
    assert u1["r"] == [1, 1]
    assert u1["d"] == 2.0  # 10→12 (+2), 12→11 (0)
    assert u2["m"] is False and u2["c"] == 0
    assert u2["r"] == [1, 0]  # flag seen, but no flag∧v>10 row


def test_weighted_quantile_and_moving(spark, events_df):
    row = (
        events_df.filter("uid = 1")
        .groupBy("uid")
        .agg(
            fn("quantileExactWeighted")(F.col("v"), F.lit(1.0), 0.5).alias("q"),
            fn("groupArrayMovingSum")(F.col("v"), F.col("ts"), 2).alias("ms"),
            fn("groupArrayMovingAvg")(F.col("v"), F.col("ts"), 2).alias("ma"),
        )
        .collect()[0]
    )
    assert row["q"] == 11.0
    assert row["ms"] == [10.0, 22.0, 23.0]
    assert row["ma"] == [10.0, 11.0, 11.5]


def test_ttest_closed_forms(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.normal(10, 2, 200).tolist()
    b = rng.normal(11, 3, 150).tolist()
    df = spark.createDataFrame(
        [(float(v), True) for v in a] + [(float(v), False) for v in b], ["v", "g"]
    )
    row = df.agg(
        fn("studentTTest")(F.col("v"), F.col("g")).alias("s"),
        fn("welchTTest")(F.col("v"), F.col("g")).alias("w"),
    ).collect()[0]
    # scipy-free cross-check: statistics computed in numpy
    na, nb = len(a), len(b)
    ma, mb = np.mean(a), np.mean(b)
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    t_student = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    t_welch = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert abs(row["s"]["t_statistic"] - t_student) < 1e-8
    assert abs(row["w"]["t_statistic"] - t_welch) < 1e-8


def test_rank_corr_exact_against_bruteforce(spark):
    """rankCorr equals the brute-force Pearson-of-min-ranks computed in
    pandas, ties included, for same-dtype and mixed-dtype column pairs
    (and with the stats-hinted no-checkpoint cumulative lane)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 12, 80).astype(float)   # heavy ties
    ys = (xs * 0.5 + rng.normal(0, 3, 80)).round(1)

    def spearman_minrank(x, y):
        rx = pd.Series(x).rank(method="min")
        ry = pd.Series(y).rank(method="min")
        return float(np.corrcoef(rx, ry)[0, 1])

    expected = spearman_minrank(xs, ys)

    same = spark.createDataFrame(
        pd.DataFrame({"x": xs, "y": ys}), "x double, y double"
    )
    got = fn("rankCorr")(same, "x", "y").collect()[0]["rank_corr"]
    assert abs(got - expected) < 1e-9
    hinted = fn("rankCorr")(same, "x", "y", input_rows=80).collect()[0][
        "rank_corr"
    ]
    assert abs(hinted - expected) < 1e-9

    mixed = spark.createDataFrame(
        pd.DataFrame({"x": xs.astype(np.int64), "y": ys}), "x long, y double"
    )
    got_mixed = fn("rankCorr")(mixed, "x", "y").collect()[0]["rank_corr"]
    assert abs(got_mixed - spearman_minrank(xs.astype(np.int64), ys)) < 1e-9


def test_rank_stats_helpers(spark, events_df):
    rc = fn("rankCorr")(events_df, "v", "uid").collect()[0]["rank_corr"]
    assert -1.0 <= rc <= 1.0
    mwu = fn("mannWhitneyUTest")(events_df, "v", "flag").collect()[0]
    assert mwu["u_statistic"] is not None
    ks = fn("kolmogorovSmirnovTest")(events_df, "v", "flag").collect()[0]
    assert 0.0 <= ks["d_statistic"] <= 1.0
    top = fn("topKWeighted")(events_df, "uid", "v", 1).collect()
    assert top[0]["uid"] == 1  # uid 1 carries weight 33 vs 13


def test_ols_closed_form(spark):
    df = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(20)], ["x", "y"]
    )
    row = fn("stochasticLinearRegression")(df, "y", "x").collect()[0]
    assert abs(row["intercept"] - 1.0) < 1e-9
    assert abs(row["w_x"] - 2.0) < 1e-9


def test_lttb_downsampling(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from chdb_spark.functions import registry
    from chdb_spark.session import read_table

    ev = read_table(spark, "/root/testdata/sf0.001/events.parquet").withColumn(
        "xs", F.unix_timestamp("ts").cast("double")
    )
    out = registry.get("largestTriangleThreeBuckets")(
        ev, "xs", "value", 25, by=["event_type"]
    ).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append((r.xs, r.value))
    full = {
        r.event_type: (r.mn, r.mx)
        for r in ev.groupBy("event_type").agg(
            F.min("xs").alias("mn"), F.max("xs").alias("mx")
        ).collect()
    }
    for t, pts in by_type.items():
        xs = [p[0] for p in pts]
        assert len(pts) == 25
        # endpoints preserved, output ordered in x
        assert min(xs) == full[t][0] and max(xs) == full[t][1]
        assert xs == sorted(xs)
