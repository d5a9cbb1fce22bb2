"""Event analytics — windowFunnel, retention, sessionization, sequenceMatch.

Reference surface: function_definitions.py:9721-9778 (retention,
sequenceMatch, sequenceCount, windowFunnel) — ClickHouse's event-analytics
aggregate family. Re-expressed as distributed join/window pipelines:

* funnel levels via EXISTS-chains (stacked semi-join conditions keyed by
  user) — never collects per-user arrays to the driver, shuffles once on
  user_id; at 100 TB the per-user event streams stay distributed.
* retention/sessionization via windows partitioned by user — the natural
  Spark shape for per-entity ordered logic.

Semantics note (documented divergence, like the reference's xfail ledger):
``funnel_levels`` uses EXISTS semantics — level k is reached if SOME chain
e1<e2<...<ek fits inside [e1.ts, e1.ts + window] — which matches
ClickHouse windowFunnel's 'strict_increase'-free default for the common
monotone cases and is exactly SQL-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chdb_spark.queries import defquery, table


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window_expr: str = "INTERVAL 12 HOURS",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user max funnel level for an ordered step list within a time window.

    Returns (user_id, funnel_level) for every user with a step-1 event.

    Single-sort algorithm (the ClickHouse windowFunnel scan re-expressed as
    window passes — one shuffle+sort on (user, ts) total, vs the naive
    per-step self-join that blows up as views x clicks per user):

      anchor_1(e) = e.ts on step-1 rows.
      anchor_k(e) = (on step-k rows) max anchor_{k-1} among STRICTLY EARLIER
                    rows of this user, kept only if e.ts <= that + window.

    Greedy-latest-anchor is exact for EXISTS semantics: every anchor carries
    the chain's step-1 timestamp, whose +window deadline is what any later
    step must beat — so the maximal anchor dominates all others. Level k is
    reached iff any step-k row holds a valid anchor_k. Ties in ts are
    ordered by an arbitrary-but-deterministic tiebreak (strictly-earlier is
    row-based); with sub-second event timestamps this matches the strict
    ``<`` chain semantics of the SQL oracle.
    """
    w = F.expr(window_expr)
    wprev = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events.select(user_col, type_col, ts_col)
    anchor = F.when(F.col(type_col) == steps[0], F.col(ts_col))
    level_flags = [F.max(F.when(F.col(type_col) == steps[0], 1))]
    for k, step in enumerate(steps[1:], start=2):
        df = df.withColumn(f"_a{k}", F.max(anchor).over(wprev))
        anchor = F.when(
            (F.col(type_col) == step) & (F.col(ts_col) <= F.col(f"_a{k}") + w),
            F.col(f"_a{k}"),
        )
        df = df.withColumn(f"_v{k}", anchor)
        anchor = F.col(f"_v{k}")
        level_flags.append(F.max(F.when(anchor.isNotNull(), k)))
    return (
        df.groupBy(user_col)
        .agg(F.greatest(*level_flags).alias("funnel_level"))
        .filter(F.col("funnel_level").isNotNull())
    )


def retention_cohorts(
    events: DataFrame, offsets: list[int], user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Classic day-N retention: cohort day = first activity day per user;
    counts users active exactly ``offset`` days after their cohort day."""
    days = events.select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("day")).distinct()
    cohort = days.groupBy("u").agg(F.min("day").alias("cohort_day"))
    joined = days.join(cohort, "u").select(
        "u", F.datediff(F.col("day"), F.col("cohort_day")).alias("offset")
    )
    offs = F.array(*[F.lit(o) for o in offsets])
    return (
        joined.filter(F.array_contains(offs, F.col("offset")))
        .groupBy("offset")
        .agg(F.count_distinct("u").alias("n_users"))
        .orderBy("offset")
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the pause since
    the previous event exceeds ``gap``. Adds ``session_id`` (per-user ordinal).
    Single shuffle on user_id; cumulative-sum window assigns ids."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = F.expr(f"INTERVAL {gap}")
    is_new = (
        F.when(F.col(ts_col) > F.lag(ts_col).over(w) + gap_s, 1)
        .when(F.lag(ts_col).over(w).isNull(), 1)
        .otherwise(0)
    )
    cum = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(cum)
    ).drop("_new")


# ---------------------------------------------------------------------------
# headline queries
# ---------------------------------------------------------------------------


@defquery(
    "e1_window_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    l2 AS (
      SELECT DISTINCT v.user_id
      FROM events v JOIN events c
        ON v.user_id = c.user_id AND v.event_type = 'view' AND c.event_type = 'click'
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
    ),
    l3 AS (
      SELECT DISTINCT v.user_id
      FROM events v
      JOIN events c ON v.user_id = c.user_id AND v.event_type = 'view' AND c.event_type = 'click'
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
      JOIN events p ON v.user_id = p.user_id AND p.event_type = 'purchase'
       AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 12 HOUR
    )
    SELECT funnel_level, count(*) AS n_users FROM (
      SELECT u.user_id,
             CASE WHEN l3.user_id IS NOT NULL THEN 3
                  WHEN l2.user_id IS NOT NULL THEN 2 ELSE 1 END AS funnel_level
      FROM u LEFT JOIN l2 ON u.user_id = l2.user_id
             LEFT JOIN l3 ON u.user_id = l3.user_id
    ) GROUP BY funnel_level ORDER BY funnel_level
    """,
    doc="windowFunnel(view→click→purchase, 12h) level distribution (CH :9778 analogue).",
)
def e1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    lv = funnel_levels(ev, ["view", "click", "purchase"], "INTERVAL 12 HOURS")
    return lv.groupBy("funnel_level").agg(F.count("*").alias("n_users")).orderBy("funnel_level")


@defquery(
    "e2_retention",
    """
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
    SELECT date_diff('day', c.cohort_day, d.day) AS "offset",
           count(DISTINCT d.user_id) AS n_users
    FROM days d JOIN cohort c ON d.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, d.day) IN (0, 1, 7, 14)
    GROUP BY 1 ORDER BY 1
    """,
    doc="day-N retention counts (CH retention :9721 analogue) for N ∈ {0,1,7,14}.",
)
def e2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return retention_cohorts(ev, [0, 1, 7, 14]).withColumnRenamed("offset", "offset")


@defquery(
    "e3_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           max(session_id)::BIGINT AS n_sessions,
           count(*) AS n_events,
           round(count(*)::DOUBLE / max(session_id), 4) AS events_per_session
    FROM sess WHERE user_id <= 30
    GROUP BY user_id ORDER BY user_id
    """,
    doc="30-minute-gap sessionization via lag + running-sum windows.",
)
def e3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = sessionize(ev, "30 minutes")
    return (
        s.filter(F.col("user_id") <= 30)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
            F.round(F.count("*").cast("double") / F.max("session_id"), 4).alias(
                "events_per_session"
            ),
        )
        .orderBy("user_id")
    )


@defquery(
    "e4_sequence_match",
    """
    WITH m1 AS (
      SELECT DISTINCT a.user_id FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_type = 'signup' AND b.event_type = 'purchase'
       AND b.ts > a.ts
    ),
    m2 AS (
      SELECT DISTINCT a.user_id FROM events a
      JOIN events b ON a.user_id = b.user_id AND a.event_type = 'error' AND b.event_type = 'purchase'
       AND b.ts > a.ts
    )
    SELECT 'signup_then_purchase' AS pattern, count(*) AS n_users FROM m1
    UNION ALL
    SELECT 'error_then_purchase' AS pattern, count(*) AS n_users FROM m2
    ORDER BY pattern
    """,
    doc="sequenceMatch('(?1).*(?2)') analogue — ordered-pair EXISTS per user (CH :9745).",
)
def e4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def matched(first: str, then: str) -> DataFrame:
        a = ev.filter(F.col("event_type") == first).select(
            F.col("user_id").alias("u"), F.col("ts").alias("ts_a")
        )
        b = ev.filter(F.col("event_type") == then).select(
            F.col("user_id").alias("u2"), F.col("ts").alias("ts_b")
        )
        return (
            a.join(b, (F.col("u") == F.col("u2")) & (F.col("ts_b") > F.col("ts_a")), "left_semi")
            .select("u")
            .distinct()
        )

    r1 = matched("signup", "purchase").agg(F.count("*").alias("n_users")).select(
        F.lit("signup_then_purchase").alias("pattern"), "n_users"
    )
    r2 = matched("error", "purchase").agg(F.count("*").alias("n_users")).select(
        F.lit("error_then_purchase").alias("pattern"), "n_users"
    )
    return r1.unionByName(r2).orderBy("pattern")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix — the product-analytics staple the
    reference's retention() aggregate feeds (function family
    function_definitions.py windowFunnel/retention): users grouped by
    first-seen week (cohort), then per (cohort, week-offset) distinct
    actives and the retention fraction of the cohort size.

    Scale shape (100 TB): per-user first-seen is one hash agg keyed by
    user; it joins back on the SAME key (no extra exchange of the event
    stream beyond the user-keyed one AQE plans); the matrix agg collapses
    to |cohorts| x |offsets| rows map-side. Cohort sizes re-join broadcast
    (|cohorts| rows). No window over the raw stream anywhere.
    """
    week = F.date_trunc("week", F.col(ts_col).cast("timestamp")).cast("date")
    ev = events.select(F.col(user_col).alias("u"), week.alias("wk"))
    # `first` feeds BOTH the per-offset join and the cohort-size agg;
    # without a plan boundary the events scan + user agg subtree runs
    # twice. The checkpoint is user-cardinality-sized (u, cohort_week).
    first = (
        ev.groupBy("u")
        .agg(F.min("wk").alias("cohort_week"))
        .localCheckpoint(eager=False)
    )
    joined = ev.join(first, "u")
    cells = (
        joined.select(
            "u",
            "cohort_week",
            F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("u").alias("n_users"))
    )
    sizes = first.groupBy("cohort_week").agg(F.countDistinct("u").alias("_cohort_n"))
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            F.round(F.col("n_users") / F.col("_cohort_n"), 4).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@defquery(
    "e5_cohort_matrix",
    """
    WITH ev AS (
      SELECT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
    ),
    first AS (SELECT u, min(wk) AS cohort_week FROM ev GROUP BY u),
    cells AS (
      SELECT cohort_week,
             CAST(floor(date_diff('day', cohort_week, wk) / 7) AS INTEGER) AS week_offset,
             CAST(count(DISTINCT e.u) AS BIGINT) AS n_users
      FROM ev e JOIN first f ON e.u = f.u
      GROUP BY cohort_week, week_offset
    ),
    sizes AS (SELECT cohort_week, count(DISTINCT u) AS n FROM first GROUP BY cohort_week)
    SELECT c.cohort_week, c.week_offset, c.n_users,
           round(c.n_users::DOUBLE / s.n, 4) AS retention_pct
    FROM cells c JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
    doc="weekly cohort retention matrix: first-seen cohorts, per-offset "
        "distinct actives, retention fraction — two user-keyed hash aggs, "
        "matrix collapses map-side, cohort sizes broadcast back.",
)
def e5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(table(spark, sf_dir, "events"))


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order journey transition counts + conditional probabilities.

    Scale shape: one window pass (lag over the per-user event order — one
    shuffle keyed by user) then a hash agg on the (from, to) pair — the
    |types|² matrix is tiny at any corpus size. The Markov-chain view of
    user journeys (what follows what) that funnels (e1) and sessionization
    (e3) don't cover.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    pairs = (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("p"),
    ).orderBy("from_type", "to_type")


@defquery(
    "e6_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM pairs ORDER BY from_type, to_type
    """,
    doc="first-order user-journey Markov transition matrix: per-user lag "
        "window (one user-keyed shuffle) → (from, to) hash agg → row-"
        "normalized probabilities over the tiny |types|² matrix. The "
        "probability is an exact-count ratio — identical integer inputs, "
        "one identical IEEE division per cell on both sides.",
)
def e6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transition_matrix(table(spark, sf_dir, "events"))


def funnel_levels_strict_order(
    events: DataFrame,
    steps: list[str],
    window_expr: str = "INTERVAL 12 HOURS",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """windowFunnel 'strict_order' mode (CH function_definitions.py:9778):
    ANY intervening event breaks the chain, so a level-k match is k
    CONSECUTIVE rows of the user's stream typed steps[0..k-1] with the
    span inside the window.

    One (user, ts) window sort total: row r reaches level k iff
    lag(type, k-1..1) == steps[0..k-2], type(r) == steps[k-1], and
    ts(r) - ts(lag(k-1)) <= window — len(steps) lag columns, no joins.
    Exactly mirrored by the SQL oracle's lag() chain, so unlike the
    EXISTS-mode funnel this variant carries no documented divergence.
    """
    w = F.expr(window_expr)
    win = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    df = events.select(user_col, type_col, ts_col, tiebreak)
    flags = [F.max(F.when(F.col(type_col) == steps[0], 1))]
    for k in range(2, len(steps) + 1):
        cond = F.col(type_col) == steps[k - 1]
        for j in range(1, k):
            cond = cond & (F.lag(type_col, j).over(win) == steps[k - 1 - j])
        cond = cond & (F.col(ts_col) <= F.lag(ts_col, k - 1).over(win) + w)
        df = df.withColumn(f"_s{k}", F.when(cond, k))
        flags.append(F.max(F.col(f"_s{k}")))
    return (
        df.groupBy(user_col)
        .agg(F.greatest(*flags).alias("funnel_level"))
        .filter(F.col("funnel_level").isNotNull())
    )


@defquery(
    "e7_strict_order_funnel",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type, 1) OVER w AS t1,
             lag(event_type, 2) OVER w AS t2,
             lag(ts, 1) OVER w AS ts1,
             lag(ts, 2) OVER w AS ts2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    lv AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND t1 = 'click'
                       AND t2 = 'view' AND ts <= ts2 + INTERVAL 12 HOUR THEN 3
                      WHEN event_type = 'click' AND t1 = 'view'
                       AND ts <= ts1 + INTERVAL 12 HOUR THEN 2
                      WHEN event_type = 'view' THEN 1 END) AS funnel_level
      FROM seq GROUP BY user_id
    )
    SELECT funnel_level, count(*) AS n_users
    FROM lv WHERE funnel_level IS NOT NULL
    GROUP BY funnel_level ORDER BY funnel_level
    """,
    doc="windowFunnel 'strict_order' mode: consecutive-row chains only "
        "(any intervening event breaks the funnel) — len(steps) lag "
        "columns over ONE (user, ts) window sort, no self-joins; the "
        "oracle replays the identical lag chain, zero semantic gap.",
)
def e7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    lv = funnel_levels_strict_order(ev, ["view", "click", "purchase"], "INTERVAL 12 HOURS")
    return lv.groupBy("funnel_level").agg(F.count("*").alias("n_users")).orderBy("funnel_level")
