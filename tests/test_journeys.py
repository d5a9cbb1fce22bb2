"""User-journey chains over the reference's real dataset fixtures
(reference datastore/tests/journeys/*: ≥6-step notebook-style chains where
each step consumes the previous step's output, run against pandas on the
same data — any divergence is a real bug). The fixture CSVs
(Titanic-Dataset.csv, orders.csv, users.csv) are read straight from the
reference checkout; chains are written fresh against this engine's
DataStore API."""

from __future__ import annotations

import os

import pandas as pd
import pytest

DATASET = "/root/reference/datastore/tests/dataset"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATASET), reason="reference dataset fixtures not present"
)


@pytest.fixture(scope="module")
def titanic_pd():
    return pd.read_csv(os.path.join(DATASET, "Titanic-Dataset.csv"))


@pytest.fixture(scope="module")
def titanic_ds(spark):
    from chdb_spark.datastore import from_file

    return from_file(
        spark,
        os.path.join(DATASET, "Titanic-Dataset.csv"),
        fmt="csv",
        header="true",
        inferSchema="true",
    )


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9
    )


def test_journey_titanic_survival_analysis(titanic_ds, titanic_pd):
    """8-step chain: filter → assign → groupby/agg → rename → filter →
    sort → head (the canonical Kaggle survival-rate-by-class cell)."""
    ds = (
        titanic_ds.filter(titanic_ds["Age"].isNotNull())
        .assign(is_child=(titanic_ds["Age"] < 16).cast("int"))
        .groupby("Pclass", "Sex")
        .agg({"Survived": "mean", "Fare": "mean", "is_child": "sum"})
        .rename(
            columns={
                "Survived_mean": "survival_rate",
                "Fare_mean": "avg_fare",
                "is_child_sum": "n_children",
            }
        )
        .sort_values(["survival_rate"], ascending=False)
        .head(6)
    )
    got = ds.to_df()
    got["survival_rate"] = got["survival_rate"].round(6)
    got["avg_fare"] = got["avg_fare"].round(6)

    p = titanic_pd[titanic_pd["Age"].notna()].copy()
    p["is_child"] = (p["Age"] < 16).astype(int)
    want = (
        p.groupby(["Pclass", "Sex"], as_index=False)
        .agg(
            survival_rate=("Survived", "mean"),
            avg_fare=("Fare", "mean"),
            n_children=("is_child", "sum"),
        )
        .sort_values("survival_rate", ascending=False, kind="mergesort")
        .head(6)
    )
    want["survival_rate"] = want["survival_rate"].round(6)
    want["avg_fare"] = want["avg_fare"].round(6)
    got_s = got.sort_values(list(got.columns)).reset_index(drop=True)
    want_s = want.sort_values(list(want.columns)).reset_index(drop=True)
    _cmp(got_s, want_s[got.columns])


def test_journey_titanic_fare_buckets(titanic_ds, titanic_pd):
    """7 steps with a derived bucket key and a post-agg filter (HAVING)."""
    ds = titanic_ds
    got = (
        ds.filter(ds["Fare"] > 0)
        .assign(fare_bucket=(ds["Fare"] / 25).cast("int"))
        .groupby("fare_bucket")
        .agg({"PassengerId": "count", "Survived": "sum"})
        .rename(columns={"PassengerId_count": "n", "Survived_sum": "n_survived"})
        .filter("n >= 10")
        .sort_values("fare_bucket")
        .to_df()
    )
    p = titanic_pd[titanic_pd["Fare"] > 0].copy()
    p["fare_bucket"] = (p["Fare"] / 25).astype(int)
    want = (
        p.groupby("fare_bucket", as_index=False)
        .agg(n=("PassengerId", "count"), n_survived=("Survived", "sum"))
    )
    want = want[want["n"] >= 10].sort_values("fare_bucket")
    _cmp(got, want)


def test_journey_orders_users_join(spark):
    """join-centric journey over orders/users fixtures: read two CSVs, join,
    derive, aggregate, sort — the cross-source notebook cell."""
    from chdb_spark.datastore import from_file

    orders = from_file(
        spark, os.path.join(DATASET, "orders.csv"),
        fmt="csv", header="true", inferSchema="true",
    )
    users = from_file(
        spark, os.path.join(DATASET, "users.csv"),
        fmt="csv", header="true", inferSchema="true",
    )
    got = (
        orders.merge(users, on="user_id")
        .assign(unit_price=orders["amount"] / orders["quantity"])
        .groupby("user_id")
        .agg({"amount": "sum", "order_id": "count"})
        .rename(columns={"amount_sum": "total", "order_id_count": "n_orders"})
        .sort_values("total", ascending=False)
        .to_df()
    )
    po = pd.read_csv(os.path.join(DATASET, "orders.csv"))
    pu = pd.read_csv(os.path.join(DATASET, "users.csv"))
    want = (
        po.merge(pu, on="user_id")
        .assign(unit_price=lambda d: d["amount"] / d["quantity"])
        .groupby("user_id", as_index=False)
        .agg(total=("amount", "sum"), n_orders=("order_id", "count"))
        .sort_values("total", ascending=False, kind="mergesort")
    )
    got["total"] = got["total"].round(6)
    want["total"] = want["total"].round(6)
    _cmp(got, want[got.columns.tolist()])


def test_strict_order_funnel_breaks_on_intervening_event(spark):
    """strict_order: any event between steps breaks the chain; the default
    EXISTS-mode funnel tolerates it — both checked on the same stream."""
    from pyspark.sql import functions as F

    from chdb_spark.operators.events import funnel_levels, funnel_levels_strict_order

    rows = [
        # u1: view,click,purchase consecutive → strict level 3
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:10:00"),
        (3, 1, "purchase", "2024-01-01 10:20:00"),
        # u2: view, OTHER, click, purchase → strict breaks at OTHER (level 1),
        # default EXISTS-mode still reaches 3
        (4, 2, "view", "2024-01-01 10:00:00"),
        (5, 2, "scroll", "2024-01-01 10:05:00"),
        (6, 2, "click", "2024-01-01 10:10:00"),
        (7, 2, "purchase", "2024-01-01 10:20:00"),
        # u3: consecutive but span outside the window → strict level 2
        (8, 3, "view", "2024-01-01 10:00:00"),
        (9, 3, "click", "2024-01-01 10:10:00"),
        (10, 3, "purchase", "2024-01-02 10:00:01"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    strict = {
        r.user_id: r.funnel_level
        for r in funnel_levels_strict_order(
            df, ["view", "click", "purchase"], "INTERVAL 12 HOURS"
        ).collect()
    }
    assert strict == {1: 3, 2: 1, 3: 2}

    default = {
        r.user_id: r.funnel_level
        for r in funnel_levels(
            df, ["view", "click", "purchase"], "INTERVAL 12 HOURS"
        ).collect()
    }
    assert default == {1: 3, 2: 3, 3: 2}
