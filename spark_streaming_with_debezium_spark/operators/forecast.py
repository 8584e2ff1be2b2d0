"""Time-series forecasting over aggregated event streams.

The reference delegates analytics to its SQL layer (`README.md:34-40`);
forecasting is the north-star step past `events_daily_filled` /
`events_hourly_seasonality`: given the per-day series a pipeline
already maintains, predict tomorrow's volume and score yesterday's
prediction — the signal feeding capacity planning and anomaly pages.

Determinism discipline: a textbook simple-exponential-smoothing
recursion (``l_t = α·y_t + (1-α)·l_{t-1}``) is a sequential fold —
expressible only as a deep CTE chain or pow() weights, and ``pow`` is
NOT IEEE-exact (JVM `Math.pow` and libm may differ in the last ulp).
Instead the forecast is a FIXED-HORIZON exponentially-weighted moving
average: weights ``0.7^j`` for lags 1..7 are precomputed once in
Python and embedded as identical double literals in both the Spark
plan and the DuckDB oracle, so both engines evaluate the same
left-associated multiply-add tree over the same doubles —
bit-identical, no pow() at query time. (Fixed-window EWMA ≡ SES
truncated after 7 terms; at α=0.3 the dropped tail weighs
0.7⁷ ≈ 8 % — standard practice for windowed smoothing.)

Scale design (100 TB): the window functions run over the per-(type,
day) AGGREGATE, never raw events — one data-sized shuffle builds the
daily counts, after which each window partition holds at most
days-in-range rows (30 here; bounded by calendar, not data volume).
This is the same shape every operator in this family uses
(`events_daily_filled`, `revenue_growth_mom_yoy`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_with_debezium_spark.registry import query
from spark_streaming_with_debezium_spark.sources.tables import load_table

#: Smoothing factor α = 0.3 → lag weight (1-α)^(j-1); 7-day horizon.
_ALPHA = 0.3
_H = 7
#: Exact double literals, computed ONCE here and shared verbatim by
#: both engines (repr round-trips doubles exactly in Python 3).
_WEIGHTS = tuple((1.0 - _ALPHA) ** j for j in range(_H))
_WSUM = sum(_WEIGHTS)


def _oracle() -> str:
    terms = " + ".join(
        f"(LAG(n_events, {j + 1}) OVER w * CAST({w!r} AS DOUBLE))"
        for j, w in enumerate(_WEIGHTS)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS n_events
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, day, n_events,
             CASE WHEN LAG(n_events, {_H}) OVER w IS NOT NULL THEN
               ({terms}) / CAST({_WSUM!r} AS DOUBLE)
             END AS forecast
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
           round(forecast, 6) AS forecast,
           round(abs(n_events - forecast), 6) AS abs_error
    FROM scored WHERE forecast IS NOT NULL
    """


def ewma_backtest(
    daily: DataFrame,
    partition_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "n_events",
) -> DataFrame:
    """One-step-ahead EWMA backtest over any (partition, day, value)
    series: rows with a full ``_H``-lag history get a forecast =
    weighted average of the previous ``_H`` observed values (row-based
    lags — gaps use the previous OBSERVED point, same as the SQL dual)
    and an absolute error. Property-swept against a Python reference
    in tests/test_graph_ops.py's sibling forecast sweep."""
    w = Window.partitionBy(partition_col).orderBy(day_col)
    lags = [F.lag(value_col, j + 1).over(w) for j in range(_H)]
    num = lags[0] * F.lit(_WEIGHTS[0])
    for j in range(1, _H):
        num = num + lags[j] * F.lit(_WEIGHTS[j])
    forecast = F.when(lags[-1].isNotNull(), num / F.lit(_WSUM))
    return (
        daily.withColumn("forecast", forecast)
        .filter(F.col("forecast").isNotNull())
        .select(
            partition_col,
            day_col,
            F.col(value_col).cast("bigint").alias(value_col),
            F.round("forecast", 6).alias("forecast"),
            F.round(F.abs(F.col(value_col) - F.col("forecast")), 6).alias(
                "abs_error"
            ),
        )
    )


@query("events_forecast_ewma", oracle=_oracle())
def events_forecast_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead volume forecast per event type: for each day with
    a full 7-day history, predict the day's event count as the
    exponentially-weighted average of the previous 7 daily counts
    (α=0.3 decay), and score it against the actual — the
    backtest-as-you-go framing (every row is a real out-of-sample
    prediction, so |error| aggregates directly into forecast-quality
    dashboards).

    Weights are Python-precomputed double literals shared with the
    DuckDB dual; the lag window runs over the tiny per-(type, day)
    aggregate (module docstring has the determinism + scale
    rationale)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_events"))
    )
    # Left-associated multiply-add over identical literals — the same
    # expression tree the oracle's SQL builds; no pow() at query time.
    return ewma_backtest(daily)


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(SUM(y) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ), walk AS (
      SELECT d.event_type, d.day, t.total, t.n_days,
             CAST(SUM(d.y) OVER w AS BIGINT) AS prefix,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS i
      FROM daily d JOIN tot t USING (event_type)
      WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
    ), scored AS (
      SELECT event_type, day, n_days, total,
             n_days * prefix - i * total AS num,
             abs(n_days * prefix - i * total) AS abs_num
      FROM walk
    )
    SELECT event_type, day AS changepoint_day, n_days,
           round(CAST(num AS DOUBLE) / n_days, 6) AS cusum_at_peak,
           round(CAST(total AS DOUBLE) / n_days, 6) AS mean_daily
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY abs_num DESC, day) = 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative sum of deviations from the type's mean daily volume
    peaks in magnitude — the classic single-changepoint estimator (a
    level shift makes |CUSUM| grow to a maximum AT the shift; a
    stationary series random-walks near zero). One row per type:
    the change-point day, the peak CUSUM, and the mean it deviates
    from.

    Integer-exact determinism: S_i = Σ_{j≤i}(y_j − μ) re-arranged as
    (n·prefix_i − i·total)/n keeps EVERY intermediate a long
    (windowed prefix sums of counts, one multiply-subtract) until a
    single double division — no windowed double accumulation, whose
    summation ORDER differs between engines (DuckDB cumulative
    windows may sum pairwise; Spark folds left). The argmax ties
    break on earliest day in both plans. Windows run over the
    per-(type, day) aggregate — bounded by calendar days, the same
    scale shape as the EWMA backtest above."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("y").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    walk = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn(
            "prefix",
            F.sum("y").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "num", F.col("n_days") * F.col("prefix") - F.col("i") * F.col("total")
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("num")).desc(), "day"
    )
    return (
        walk.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            "n_days",
            F.round(F.col("num").cast("double") / F.col("n_days"), 6).alias(
                "cusum_at_peak"
            ),
            F.round(
                F.col("total").cast("double") / F.col("n_days"), 6
            ).alias("mean_daily"),
        )
    )


#: ACF horizon: lags 1..7 (a week of daily structure).
_ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    arms = " UNION ALL ".join(
        f"SELECT event_type, {k} AS lag, y, LAG(y, {k}) OVER "
        "(PARTITION BY event_type ORDER BY day) AS x FROM daily"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), lagged AS ({arms}
    ), sums AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sx2,
             CAST(SUM(y * y) AS BIGINT) AS sy2
      FROM lagged WHERE x IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, m AS n_pairs,
           round((m * sxy - sx * sy)
                 / (sqrt(CAST(m * sx2 - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * sy2 - sy * sy AS DOUBLE))), 6) AS acf
    FROM sums
    WHERE m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0
    """


@query("events_autocorrelation", oracle=_acf_oracle())
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event volume, lags 1..7 per
    event type — the diagnostic read BEFORE choosing a forecaster
    (high lag-1 ⇒ smoothing works, a lag-7 spike ⇒ weekly
    seasonality, all-near-zero ⇒ white noise and `events_forecast_
    ewma` can't beat the mean) and the companion to
    `events_changepoint_cusum` (a level shift inflates ALL lags).

    Exactness: lag-k Pearson over the day-ordered count series from
    integer sufficient statistics — every sum a long (counts ≤ 2³¹,
    ≤ calendar-days terms: no overflow), one double expression at the
    end (the `agg_corr_exact` discipline). Zero-variance arms are
    excluded by exact integer comparison in both engines. Lags fan
    out as seven window columns unpivoted in-plan (Spark `stack` ≡
    the SQL dual's UNION arms); all windows run over the calendar-
    bounded per-(type, day) aggregate."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    # window expressions can't sit inside the stack() generator —
    # materialize the lag columns first, then unpivot them
    with_lags = daily.select(
        "event_type",
        "y",
        *[
            F.lag("y", k).over(w).alias(f"_x{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    lag_cols = [
        c
        for k in range(1, _ACF_MAX_LAG + 1)
        for c in (F.lit(k), F.col(f"_x{k}"))
    ]
    lagged = with_lags.select(
        "event_type",
        "y",
        F.stack(F.lit(_ACF_MAX_LAG), *lag_cols).alias("lag", "x"),
    ).filter(F.col("x").isNotNull())
    s = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    vx = F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.filter((vx > 0) & (vy > 0)).select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        F.col("m").alias("n_pairs"),
        F.round(
            num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 6
        ).alias("acf"),
    )


@query(
    "events_entropy_profile",
    oracle="""
    WITH per AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT day, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM per GROUP BY 1
    ), terms AS (
      SELECT p.day, t.n, t.n_types,
             CAST((CAST(p.c AS DOUBLE) / t.n)
                  * log2(CAST(p.c AS DOUBLE) / t.n)
                  AS DECIMAL(38,18)) AS term
      FROM per p JOIN tot t USING (day)
    )
    SELECT day, n AS n_events, n_types,
           round(CAST(-SUM(term) AS DOUBLE), 6) AS entropy_bits,
           CASE WHEN n_types > 1 THEN
             round(CAST(-SUM(term) AS DOUBLE)
                   / log2(CAST(n_types AS DOUBLE)), 6)
           END AS evenness
    FROM terms GROUP BY day, n, n_types
    """,
)
def events_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily traffic-mix entropy: the Shannon entropy (bits) of each
    day's event-type distribution plus Pielou evenness
    (H / log₂(types)) — the distribution-drift monitor that catches
    what volume counts can't: a day where one event type silently
    swallows the mix (evenness → 0) or the mix flattens (→ 1) pages
    before any per-type threshold fires.

    Determinism: shares the idf/zipf precedent (log over doubles +
    round 6); each −p·log₂p term computes from one exact integer
    division pair, and the per-day SUM runs over DECIMAL(38,18)
    interiors so partial-aggregation order can't perturb the total
    (the repo-wide decimal-sum convention). Two calendar-bounded
    aggregates + one broadcast-sized join — nothing data-sized moves
    twice."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = per.groupBy("day").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        per.join(F.broadcast(tot), "day")
        .select(
            "day",
            "n",
            "n_types",
            (p * F.log2(p)).cast("decimal(38,18)").alias("term"),
        )
        .groupBy("day", "n", "n_types")
        .agg((-F.sum("term")).cast("double").alias("h"))
    )
    return ent.select(
        "day",
        F.col("n").alias("n_events"),
        "n_types",
        F.round("h", 6).alias("entropy_bits"),
        F.when(
            F.col("n_types") > 1,
            F.round(
                F.col("h") / F.log2(F.col("n_types").cast("double")), 6
            ),
        ).alias("evenness"),
    )


@query(
    "events_drift_psi",
    oracle="""
    WITH stats AS (
      SELECT min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us,
             min(value) AS vmin, max(value) AS vmax
      FROM events
    ),
    ex AS (
      SELECT t.dimension, t.bucket,
             CASE WHEN epoch_us(e.ts) <=
                  ((s.min_us + s.max_us) - ((s.min_us + s.max_us) % 2)) // 2
                  THEN 1 ELSE 0 END AS is_ref
      FROM events e, stats s,
           LATERAL (VALUES
             ('event_type', e.event_type),
             ('value_decile', CAST(CAST(least(9, floor(
                (e.value - s.vmin) / ((s.vmax - s.vmin) / 10)
              )) AS INT) AS VARCHAR))
           ) AS t(dimension, bucket)
    ),
    grp AS (
      SELECT dimension, bucket,
             SUM(is_ref) AS c_ref, SUM(1 - is_ref) AS c_cur
      FROM ex GROUP BY 1, 2
    ),
    dims AS (
      SELECT dimension, COUNT(*) AS n_buckets,
             SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur
      FROM grp GROUP BY 1
    ),
    terms AS (
      SELECT g.dimension,
             CAST(
               ((CAST(g.c_cur + 1 AS DOUBLE) / (d.n_cur + d.n_buckets))
                - (CAST(g.c_ref + 1 AS DOUBLE) / (d.n_ref + d.n_buckets)))
               * ln((CAST(g.c_cur + 1 AS DOUBLE) / (d.n_cur + d.n_buckets))
                    / (CAST(g.c_ref + 1 AS DOUBLE) / (d.n_ref + d.n_buckets)))
               AS DECIMAL(38,18)) AS term
      FROM grp g JOIN dims d USING (dimension)
    )
    SELECT d.dimension, CAST(d.n_buckets AS BIGINT) AS n_buckets,
           CAST(d.n_ref AS BIGINT) AS n_ref, CAST(d.n_cur AS BIGINT) AS n_cur,
           round(CAST(t.psi AS DOUBLE), 6) AS psi
    FROM dims d JOIN (
      SELECT dimension, SUM(term) AS psi FROM terms GROUP BY 1
    ) t USING (dimension)
    """,
)
def events_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first and second half of
    the event stream's time range — the standard drift monitor a
    training-data pipeline runs on every refresh (PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 broken), computed over two dimensions at
    once: the event-type mix and the value-decile histogram (fixed
    10-bucket grid over the observed range). Laplace-smoothed so
    buckets empty on one side contribute finitely.

    Determinism: the time midpoint is an exact integer floor-division
    of epoch-micros; decile edges divide exactly-known doubles
    (identical IEEE in both engines); each PSI term computes from two
    exact integer-ratio probabilities and the per-dimension SUM runs
    over DECIMAL(38,18) interiors (the repo-wide convention, so
    partial-aggregation order can't perturb the total).

    Scale shape: one pass computes the 1-row stats broadcast; the
    bucketing pass explodes each event into its 2 (dimension, bucket)
    memberships with map-side partial aggregation down to the bucket
    table (≤ types + 10 rows per partition); everything downstream is
    broadcast-sized. Nothing data-sized shuffles or moves twice."""
    e = load_table(spark, sf_dir, "events")
    stats = F.broadcast(
        e.agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("min_us"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("max_us"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    s = F.col("min_us") + F.col("max_us")
    mid = ((s - (s % 2)) / 2).cast("long")
    decile = F.least(
        F.lit(9),
        F.floor(
            (F.col("value") - F.col("vmin"))
            / ((F.col("vmax") - F.col("vmin")) / 10)
        ),
    ).cast("int")
    ex = (
        e.crossJoin(stats)
        .select(
            F.explode(
                F.array(
                    F.named_struct(
                        F.lit("dimension"),
                        F.lit("event_type"),
                        F.lit("bucket"),
                        F.col("event_type"),
                    ),
                    F.named_struct(
                        F.lit("dimension"),
                        F.lit("value_decile"),
                        F.lit("bucket"),
                        decile.cast("string"),
                    ),
                )
            ).alias("z"),
            F.when(
                F.unix_micros(F.col("ts").cast("timestamp")) <= mid, 1
            )
            .otherwise(0)
            .alias("is_ref"),
        )
        .select("z.dimension", "z.bucket", "is_ref")
    )
    grp = ex.groupBy("dimension", "bucket").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("c_cur"),
    )
    dims = F.broadcast(
        grp.groupBy("dimension").agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("c_ref").alias("n_ref"),
            F.sum("c_cur").alias("n_cur"),
        )
    )
    p_cur = (F.col("c_cur") + 1).cast("double") / (
        F.col("n_cur") + F.col("n_buckets")
    )
    p_ref = (F.col("c_ref") + 1).cast("double") / (
        F.col("n_ref") + F.col("n_buckets")
    )
    terms = grp.join(dims, "dimension").select(
        "dimension",
        ((p_cur - p_ref) * F.log(p_cur / p_ref))
        .cast("decimal(38,18)")
        .alias("term"),
    )
    psi = terms.groupBy("dimension").agg(F.sum("term").alias("psi"))
    return (
        dims.join(psi, "dimension")
        .select(
            "dimension",
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round(F.col("psi").cast("double"), 6).alias("psi"),
        )
    )


@query(
    "events_survival_km",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    hm AS (SELECT MAX(CAST(ts AS DATE)) AS hmax FROM events),
    c AS (
      SELECT s.user_id, s.t0,
             MIN(CASE WHEN CAST(p.ts AS DATE) >= s.t0
                      THEN CAST(p.ts AS DATE) END) AS tc
      FROM s LEFT JOIN events p
        ON p.user_id = s.user_id AND p.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    dur AS (
      SELECT CAST(CASE WHEN tc IS NOT NULL THEN date_diff('day', t0, tc)
                       ELSE date_diff('day', t0, hmax) END AS INT) AS day,
             CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM c, hm
    ),
    lt AS (
      SELECT day, SUM(ev) AS d_events, SUM(1 - ev) AS c_censored,
             COUNT(*) AS leaving
      FROM dur GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM dur),
    lt2 AS (
      SELECT day, d_events, c_censored,
             n - COALESCE(SUM(leaving) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk,
             row_number() OVER (ORDER BY day) AS rn
      FROM lt, tot
    ),
    fl AS (
      SELECT list(CAST(n_risk - d_events AS DOUBLE) / n_risk ORDER BY day)
               AS fs
      FROM lt2
    )
    SELECT day, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_events AS BIGINT) AS n_events,
           CAST(c_censored AS BIGINT) AS n_censored,
           round(CAST(d_events AS DOUBLE) / n_risk, 6) AS hazard,
           round(list_reduce(list_slice(fl.fs, 1, CAST(rn AS INT)),
                             (a, b) -> a * b), 6) AS survival
    FROM lt2, fl
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of signup→purchase conversion — the
    censoring-aware activation report (naive conversion rates undercount
    recent cohorts whose users haven't had time to convert yet): each
    signed-up user contributes either their days-to-first-purchase (an
    event) or their days-to-end-of-observation (right-censored at the
    global horizon), and S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}) steps down
    only at event times while censored users still count in the
    at-risk denominators before they leave.

    Determinism: all life-table counts (d, c, n_risk via an integer
    running sum keyed on `day` — a calendar-grain global window over
    O(days) rows) are exact integers; each hazard is ONE division of
    exact ints (identical IEEE in both engines); the survival product
    folds the day-ordered factor list LEFT-TO-RIGHT in both engines
    (`F.aggregate` with exact 1.0 seed ↔ DuckDB `list_reduce`) — a
    pinned multiplication sequence, so no commutativity hazard ever
    arises (the same reason the repo sums in decimal interiors).

    Scale shape: two conditional-min aggregates shuffle on user_id
    (map-side combined); everything after the duration rollup operates
    on O(observed-days) rows — the life table, the 1-row factor list
    and the per-step prefix folds are all broadcast-sized. Nothing
    data-sized sorts globally."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("t0"))
    )
    hm = F.broadcast(e.agg(F.max(F.to_date("ts")).alias("hmax")))
    c = (
        s.join(
            e.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"),
                F.to_date("ts").alias("pd"),
            ),
            F.col("user_id") == F.col("p_user"),
            "left",
        )
        .groupBy("user_id", "t0")
        .agg(
            F.min(F.when(F.col("pd") >= F.col("t0"), F.col("pd"))).alias("tc")
        )
    )
    dur = c.crossJoin(hm).select(
        F.when(
            F.col("tc").isNotNull(), F.datediff("tc", "t0")
        )
        .otherwise(F.datediff("hmax", "t0"))
        .cast("int")
        .alias("day"),
        F.when(F.col("tc").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    lt = dur.groupBy("day").agg(
        F.sum("ev").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).alias("c_censored"),
        F.count(F.lit(1)).alias("leaving"),
    )
    tot = F.broadcast(dur.agg(F.count(F.lit(1)).alias("n")))
    w_prev = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_rn = Window.orderBy("day")
    lt2 = lt.crossJoin(tot).select(
        "day",
        "d_events",
        "c_censored",
        (
            F.col("n")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
        F.row_number().over(w_rn).alias("rn"),
    )
    fl = F.broadcast(
        lt2.agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "day",
                            (
                                (F.col("n_risk") - F.col("d_events")).cast(
                                    "double"
                                )
                                / F.col("n_risk")
                            ).alias("f"),
                        )
                    )
                ),
                lambda st: st["f"],
            ).alias("fs")
        )
    )
    return lt2.crossJoin(fl).select(
        "day",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_events").cast("long").alias("n_events"),
        F.col("c_censored").cast("long").alias("n_censored"),
        F.round(F.col("d_events").cast("double") / F.col("n_risk"), 6).alias(
            "hazard"
        ),
        F.round(
            F.aggregate(
                F.slice("fs", 1, F.col("rn").cast("int")),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ),
            6,
        ).alias("survival"),
    )


@query(
    "events_lifecycle_accounting",
    oracle="""
    WITH aw AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 AS wk
      FROM events
    ),
    mx AS (SELECT MAX(wk) AS max_wk FROM aw),
    seq AS (
      SELECT user_id, wk,
             lag(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM aw
    ),
    states AS (
      SELECT wk,
             SUM(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END) AS n_new,
             SUM(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END) AS n_retained,
             SUM(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
                      THEN 1 ELSE 0 END) AS n_resurrected,
             COUNT(*) AS n_active
      FROM seq GROUP BY wk
    ),
    churn AS (
      SELECT s.wk + 1 AS wk, COUNT(*) AS n_churned
      FROM seq s, mx
      WHERE (s.next_wk IS NULL OR s.next_wk > s.wk + 1)
        AND s.wk + 1 <= mx.max_wk
      GROUP BY 1
    )
    SELECT CAST(date_add(DATE '1970-01-05',
                    INTERVAL (COALESCE(s.wk, c.wk) * 7) DAY) AS DATE)
             AS week_start,
           CAST(COALESCE(s.n_new, 0) AS BIGINT) AS n_new,
           CAST(COALESCE(s.n_retained, 0) AS BIGINT) AS n_retained,
           CAST(COALESCE(s.n_resurrected, 0) AS BIGINT) AS n_resurrected,
           CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned,
           CAST(COALESCE(s.n_active, 0) AS BIGINT) AS n_active
    FROM states s FULL JOIN churn c ON s.wk = c.wk
    """,
)
def events_lifecycle_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the Social-Capital framework every product
    team runs): per week, how many active users are NEW (first week
    ever), RETAINED (also active the prior week), RESURRECTED (active
    before a gap) — and how many CHURNED into this week (active last
    week, not this one). n_active = new + retained + resurrected by
    construction; MAU quick ratio = (new + resurrected) / churned.

    Determinism: weeks are an exact integer index
    floor(days-since-1970-01-05 / 7) — engine-neutral (no reliance on
    either engine's week-truncation convention) and converted back to
    a Monday week_start date only for display. Every count is an
    exact integer; churn is derived from each user's NEXT active week
    (lead) so inactive weeks are never materialized.

    Scale shape: one distinct over (user, week) — a single shuffle
    with map-side combine; the lag/lead window partitions BY USER
    (parallel, no global sort); the weekly rollup keys on O(weeks)
    rows; churn needs no per-(user, inactive-week) row explosion —
    the (next_wk > wk+1) predicate replaces a calendar-spine
    anti-join, which at 100 TB would be users × weeks rows."""
    e = load_table(spark, sf_dir, "events")
    aw = e.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) / 7
        ).alias("wk"),
    ).distinct()
    mx = F.broadcast(aw.agg(F.max("wk").alias("max_wk")))
    wu = Window.partitionBy("user_id").orderBy("wk")
    seq = aw.select(
        "user_id",
        "wk",
        F.lag("wk").over(wu).alias("prev_wk"),
        F.lead("wk").over(wu).alias("next_wk"),
    )
    states = seq.groupBy("wk").agg(
        F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(
            F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
        F.count(F.lit(1)).alias("n_active"),
    )
    churn = (
        seq.crossJoin(mx)
        .filter(
            (F.col("next_wk").isNull() | (F.col("next_wk") > F.col("wk") + 1))
            & (F.col("wk") + 1 <= F.col("max_wk"))
        )
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    j = states.join(churn, "wk", "full")
    return j.select(
        F.date_add(
            F.lit("1970-01-05").cast("date"), (F.col("wk") * 7).cast("int")
        ).alias("week_start"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
        F.coalesce("n_resurrected", F.lit(0))
        .cast("long")
        .alias("n_resurrected"),
        F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
    )


@query(
    "events_pattern_decline_rebound",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, n,
             lag(n, 1) OVER w AS n1, lag(n, 2) OVER w AS n2,
             lag(n, 3) OVER w AS n3,
             lag(day, 3) OVER w AS d3
      FROM per
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day AS rebound_day,
           CAST(n3 AS BIGINT) AS n_t3, CAST(n2 AS BIGINT) AS n_t2,
           CAST(n1 AS BIGINT) AS n_t1, CAST(n AS BIGINT) AS n_rebound,
           round(CAST(n3 - n1 AS DOUBLE) / n3, 6) AS drawdown
    FROM lagged
    WHERE n3 > n2 AND n2 > n1 AND n > n1
      AND date_diff('day', d3, day) = 3
    """,
)
def events_pattern_decline_rebound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE / Flink-CEP
    operator class, expressed as lag chains): per event type, find
    every day whose preceding three CALENDAR-CONSECUTIVE days declined
    strictly twice and then rebounded (n₋₃ > n₋₂ > n₋₁ < n₀) — the
    "dip-and-recover" alert an ops dashboard pages on. Calendar
    consecutiveness is enforced with one date_diff on the 3-step
    lagged day (a gap anywhere inside the window breaks it), so
    missing days never fake a pattern.

    All counts are exact integers; the drawdown is one division of
    exact ints. Shape: one groupBy(type, day) with map-side combine
    down to O(types × days) rows, then a PARTITIONED-BY-TYPE lag
    window (never global) and a stateless predicate — the same plan
    detects patterns per user/per device/per series by swapping the
    partition key, which is how it scales to millions of series."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = per.select(
        "event_type",
        "day",
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 2).over(w).alias("n2"),
        F.lag("n", 3).over(w).alias("n3"),
        F.lag("day", 3).over(w).alias("d3"),
    )
    return (
        lagged.filter(
            (F.col("n3") > F.col("n2"))
            & (F.col("n2") > F.col("n1"))
            & (F.col("n") > F.col("n1"))
            & (F.datediff("day", "d3") == 3)
        )
        .select(
            "event_type",
            F.col("day").alias("rebound_day"),
            F.col("n3").cast("long").alias("n_t3"),
            F.col("n2").cast("long").alias("n_t2"),
            F.col("n1").cast("long").alias("n_t1"),
            F.col("n").cast("long").alias("n_rebound"),
            F.round(
                (F.col("n3") - F.col("n1")).cast("double") / F.col("n3"), 6
            ).alias("drawdown"),
        )
    )
