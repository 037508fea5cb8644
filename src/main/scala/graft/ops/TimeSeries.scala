package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling (north-star extension): downsample an event
  * stream into fixed-width OHLC bars — the canonical "resample + first/
  * last/min/max" rollup of metric and market pipelines.
  *
  * First/last within a bar are derived from two ROW_NUMBERs over one
  * window partition (ascending and descending time, unique-key
  * tiebreaker), then collapsed by conditional aggregation — this costs a
  * single Exchange on (series, bar) feeding two sorts, and both engines
  * agree exactly because the order is total. An argmin/argmax aggregate
  * would halve the sort work but Spark's `min_by` breaks ties arbitrarily
  * — not cross-engine-deterministic on tied timestamps, so the windowed
  * formulation is the contract-grade one.
  *
  * Scale: bars are epoch-aligned via Spark's own `window()` (tumbling),
  * computed per-row inside the scan — the partition key (series, bar) is
  * bounded (series × bars), and each partition holds one bar's events, so
  * the window sort never sees more than a bar's worth of rows.
  */
object TimeSeries {

  /** 15-minute OHLC bars per event type over the events stream. */
  def ohlcResample(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("bar", window(col("ts"), "15 minutes").getField("start"))
    val asc = Window.partitionBy(col("event_type"), col("bar"))
      .orderBy(col("ts"), col("event_id"))
    val desc = Window.partitionBy(col("event_type"), col("bar"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rna", row_number().over(asc))
      .withColumn("rnd", row_number().over(desc))
      .groupBy(col("event_type"), col("bar"))
      .agg(
        max(when(col("rna") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rnd") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .sortSmall(col("event_type"), col("bar"))
  }

  // Spark's window(ts, 15m) is epoch-aligned; mirrored with integer
  // epoch-microsecond arithmetic (make_timestamp stays naive/TZ-free).
  val ohlcResampleSql: String =
    """WITH b AS (
      |  SELECT event_type, ts, event_id, value,
      |    make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bar
      |  FROM events),
      |r AS (
      |  SELECT event_type, bar, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bar
      |                       ORDER BY ts, event_id) AS rna,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bar
      |                       ORDER BY ts DESC, event_id DESC) AS rnd
      |  FROM b)
      |SELECT event_type, bar,
      |  MAX(CASE WHEN rna = 1 THEN value END) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  MAX(CASE WHEN rnd = 1 THEN value END) AS close,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM r GROUP BY event_type, bar
      |ORDER BY event_type, bar""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * count every consecutive (src → dst) event-type transition (ordered by
    * time with a unique tiebreaker within each user), then row-normalize
    * to transition probabilities in FIXED-POINT 10⁶ integer arithmetic
    * (bit-identical across engines; same rationale as
    * [[Graph.pagerankBipartite]]'s ranks).
    *
    * Plan: one exchange on user_id for the lead() window, then the pair
    * census map-side-combines into a (types × types)-sized table; the
    * row-total is a second window over that tiny census, not the events.
    * This is the sequence-statistics shape (n-gram transition models over
    * user/session streams) at its scale-correct minimum: the corpus
    * shuffles once. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(byUser))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("src"))
    pairs
      .withColumn("row_total", sum(col("n")).over(bySrc))
      .withColumn("p_fp", expr("(n * 1000000) div row_total"))
      .select(col("src"), col("dst"), col("n"), col("row_total"), col("p_fp"))
      .sortSmall(col("src"), col("dst"))
  }

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS src,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS dst
      |  FROM events),
      |c AS (
      |  SELECT src, dst, COUNT(*) AS n FROM seq
      |  WHERE dst IS NOT NULL GROUP BY src, dst)
      |SELECT src, dst, n,
      |  CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS row_total,
      |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_fp
      |FROM c ORDER BY src, dst""".stripMargin

  /** Temporal aggregation lattice: hour → day → month rollups where each
    * coarser tier re-aggregates the PREVIOUS tier's partials — the raw
    * table is scanned ONCE (the materialized-rollup reuse chain every
    * warehouse maintains; exact decimal sums make partial re-aggregation
    * lossless, which a plain double sum would not be). Emitted as one
    * union census tagged by grain. Day and month derive from the hour
    * tier's integer keys — day = hour_id div 24; month from the day via
    * date arithmetic — so no tier ever returns to the events table.
    * The DuckDB twin aggregates each tier INDEPENDENTLY from raw rows,
    * cross-validating that partial reuse loses nothing. */
  def rollupLattice(spark: SparkSession, dir: String): DataFrame = {
    val hours = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_date(cast(ts as date)) * 24 + hour(ts)").as("hour_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = hours.groupBy(col("event_type"),
        expr("hour_id div 24").as("day_id"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val months = days.groupBy(col("event_type"),
        expr("(year(date_add(date '1970-01-01', cast(day_id as int))) * 100 + " +
          "month(date_add(date '1970-01-01', cast(day_id as int))))").as("month_id"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
    def tier(df: DataFrame, grain: String, key: Column): DataFrame =
      df.select(lit(grain).as("grain"), col("event_type"),
        key.cast("long").as("bucket_id"), col("n"),
        col("sv").cast("double").as("sum_value"))
    tier(hours, "hour", col("hour_id"))
      .unionAll(tier(days, "day", col("day_id")))
      .unionAll(tier(months, "month", col("month_id")))
      .sortSmall(col("grain"), col("event_type"), col("bucket_id"))
  }

  val rollupLatticeSql: String =
    """WITH base AS (
      |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(value AS DECIMAL(18,4)) AS v
      |  FROM events),
      |h AS (
      |  SELECT 'hour' AS grain, event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
      |      + hour(ts) AS bucket_id,
      |    COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_value
      |  FROM base GROUP BY event_type, bucket_id),
      |d AS (
      |  SELECT 'day' AS grain, event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS bucket_id,
      |    COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_value
      |  FROM base GROUP BY event_type, bucket_id),
      |m AS (
      |  SELECT 'month' AS grain, event_type,
      |    CAST(year(ts) * 100 + month(ts) AS BIGINT) AS bucket_id,
      |    COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_value
      |  FROM base GROUP BY event_type, bucket_id)
      |SELECT * FROM h UNION ALL SELECT * FROM d UNION ALL SELECT * FROM m
      |ORDER BY grain, event_type, bucket_id""".stripMargin

  /** Exponentially-weighted moving average (α = ½) of the daily value sum
    * per event type, over a trailing 8-day window — the standard
    * time-series smoother (Holt's level term; pandas `ewm(alpha=.5)` over
    * a bounded window).
    *
    * Cross-engine exactness without rounding: the recurrence
    * s_t = ½·x_t + ½·s_(t−1) only multiplies by the power of two ½ —
    * EXACT in binary floating point — and both engines evaluate the same
    * left fold over the same frame-ordered list (Spark `aggregate` /
    * DuckDB `list_reduce`, both acc-first, init = first element), so
    * every intermediate double is bit-identical: no tolerance, no
    * round(). The daily inputs are exact-decimal sums for the same
    * reason. Any other α would need fixed-point; ½ is the natural
    * halflife smoother.
    *
    * Scale: one map-side-combined daily aggregate (days × types rows),
    * then a bounded ROWS frame per type — the window partition is the
    * SERIES, already tiny after aggregation. The fold is per-row over ≤8
    * elements. A streaming twin is `stream_*`'s stateful shape: the same
    * recurrence as mapGroupsWithState carrying one double of state. */
  def ewmaDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(dsum(col("value")).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, 0)
    daily
      .withColumn("vs", collect_list(col("v")).over(w))
      .select(col("event_type"), col("day"), col("v"),
        expr("aggregate(slice(vs, 2, size(vs) - 1), vs[0]," +
          " (a, x) -> 0.5 * x + 0.5 * a)").as("ewma"))
      .sortSmall(col("event_type"), col("day"))
  }

  val ewmaDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |fr AS (
      |  SELECT event_type, day, v,
      |    list(v) OVER (PARTITION BY event_type ORDER BY day
      |                  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vs
      |  FROM daily)
      |SELECT event_type, day, v,
      |  list_reduce(vs, (a, x) -> 0.5 * x + 0.5 * a) AS ewma
      |FROM fr ORDER BY event_type, day""".stripMargin

  /** Holt's linear-trend double exponential smoothing (Holt 1957 /
    * Gardner's ES taxonomy) over each type's daily series — the
    * trend-aware forecasting tier next to [[ewmaDaily]]'s level-only
    * smoothing. α = β = ½, so every smoothing step is a HALVING — the one
    * damping both engines evaluate bit-identically (same trick as the
    * EWMA and the α=½ mixture weights): the recursion
    *   l_t = ½·v_t + ½·(l₋₁ + b₋₁);  b_t = ½·(l_t − l₋₁) + ½·b₋₁
    * runs as ONE sequential left fold per series with a [level, trend]
    * list accumulator seeded [v₁, 0] — Spark's `aggregate` and DuckDB's
    * `list_reduce` execute the identical IEEE operation sequence, so the
    * final state and the h-step linear forecasts l + h·b hash-match
    * unrounded. One exchange builds the day-ordered series per type;
    * the fold is per-group in-memory state of exactly two doubles —
    * at 100 TB the daily table is days × types, already tiny. */
  def holtTrend(spark: SparkSession, dir: String): DataFrame = {
    val lvl = "0.5 * x + 0.5 * (a[0] + a[1])"
    val trd = s"0.5 * (($lvl) - a[0]) + 0.5 * a[1]"
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(dsum(col("value")).as("v"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, v))), s -> s.v)")
          .as("vs"))
      .filter(col("n_days") >= 2)
      .select(col("event_type"), col("n_days"),
        expr("aggregate(slice(vs, 2, size(vs) - 1), " +
          "array(vs[0], cast(0.0 as double)), " +
          s"(a, x) -> array($lvl, $trd))").as("st"))
      .select(col("event_type"), col("n_days"),
        expr("st[0]").as("level"), expr("st[1]").as("trend"),
        expr("st[0] + st[1]").as("forecast_1"),
        expr("st[0] + 3 * st[1]").as("forecast_3"))
      .sortSmall(col("event_type"))
  }

  val holtTrendSql: String = {
    val lvl = "0.5 * x[1] + 0.5 * (a[1] + a[2])"
    val trd = s"0.5 * (($lvl) - a[1]) + 0.5 * a[2]"
    s"""WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |series AS (
      |  SELECT event_type, COUNT(*) AS n_days, list(v ORDER BY day) AS vs
      |  FROM daily GROUP BY event_type HAVING COUNT(*) >= 2),
      |folded AS (
      |  SELECT event_type, n_days,
      |    list_reduce(list_transform(vs, x -> [x, 0.0]),
      |      (a, x) -> [$lvl, $trd]) AS st
      |  FROM series)
      |SELECT event_type, n_days, st[1] AS level, st[2] AS trend,
      |  st[1] + st[2] AS forecast_1, st[1] + 3 * st[2] AS forecast_3
      |FROM folded ORDER BY event_type""".stripMargin
  }

  /** Volume-anomaly detection: days whose event count sits more than 2σ
    * from that type's mean daily volume — the monitoring query every
    * ingestion pipeline runs against its own throughput. Counts are
    * integers, so the per-type moments (Σn, Σn²) are EXACT longs and the
    * closed-form mean/σ/z evaluate on identical operands in both engines
    * (same posture as [[graft.ops.Statistics]]; a running stddev over
    * doubles would drift in the last ulp). Two map-side-combined
    * aggregates + a broadcast join of the 5-row stats table back onto the
    * daily series — at 100 TB the daily table is days × types, already
    * tiny relative to raw events. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    // Moments are overflow-proof, mirroring the twin's arithmetic exactly:
    // Σn² accumulates in DECIMAL(38,0) (exact, like DuckDB's HUGEINT SUM —
    // a long n·n product would silently wrap once daily counts reach ~3e9)
    // and s is cast to double BEFORE squaring (the twin's
    // CAST(SUM(n) AS DOUBLE) * SUM(n); long·long s·s wraps at the same
    // threshold). Identical operand order → identical IEEE results.
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"), sum(col("n")).as("s"),
        sum(col("n").cast("decimal(19,0)") * col("n")).as("ss"))
      .select(col("event_type"), col("days"),
        (col("s").cast("double") / col("days")).as("mean"),
        sqrt((col("ss").cast("double") -
            col("s").cast("double") * col("s") / col("days")) /
          (col("days") - 1)).as("sd"))
    daily.join(broadcast(stats), "event_type")
      .filter((col("n") - col("mean")) * (col("n") - col("mean")) >
        lit(4.0) * col("sd") * col("sd"))
      .select(col("event_type"), col("day"), col("n"),
        round((col("n") - col("mean")) / col("sd"), 6).as("z"))
      .sortSmall(col("event_type"), col("day"))
  }

  val anomalyZscoreSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, COUNT(*) AS days,
      |    CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean,
      |    sqrt((CAST(SUM(n*n) AS DOUBLE)
      |          - CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*))
      |         / (COUNT(*) - 1)) AS sd
      |  FROM daily GROUP BY event_type)
      |SELECT event_type, day, CAST(n AS BIGINT) AS n,
      |  round((n - mean) / sd, 6) AS z
      |FROM daily JOIN st USING (event_type)
      |WHERE (n - mean) * (n - mean) > 4.0 * sd * sd
      |ORDER BY event_type, day""".stripMargin

  /** Classical additive seasonal decomposition (the moving-average
    * method, Makridakis/Wheelwright/Hyndman's "classical decomposition";
    * STL's loess refinement swaps the smoothers, not the dataflow) of
    * each type's daily value series into trend + weekly seasonal +
    * remainder:
    *
    *   - trend: centered 7-day moving average (partial at the series
    *     edges — both engines share the ROWS frame, so edge semantics
    *     agree),
    *   - seasonal: per day-of-week mean of the detrended series
    *     (dow = epoch-day mod 7, engine-neutral — Spark and DuckDB
    *     disagree on `dayofweek` numbering),
    *   - remainder: what's left.
    *
    * Determinism: window + seasonal sums accumulate in DECIMAL (exact,
    * order-independent); each division is a single IEEE-correctly-rounded
    * double op; every emitted component is round(x, 6). Scale posture:
    * one exchange on event_type carries the window pass; the seasonal
    * table is (types × 7)-sized — broadcast back; nothing touches the
    * driver. */
  /** The decomposition table shared by [[stlDecompose]] (which emits it)
    * and [[seasonalityStrength]] (which scores it). */
  private def stlComponents(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(dsum(col("value")).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val tr = daily
      .withColumn("trend", round(
        sum(col("v").cast("decimal(18,6)")).over(w).cast("double") /
          count(lit(1)).over(w), 6))
      .withColumn("det", round(col("v") - col("trend"), 6))
      .withColumn("dow", pmod(datediff(col("day"),
        to_date(lit("1970-01-01"))), lit(7)))
    val seasonal = tr.groupBy(col("event_type"), col("dow"))
      .agg(round(sum(col("det").cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("seasonal"))
    tr.join(broadcast(seasonal), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("v"), col("trend"),
        col("seasonal"),
        round(col("det") - col("seasonal"), 6).as("remainder"))
  }

  def stlDecompose(spark: SparkSession, dir: String): DataFrame =
    stlComponents(spark, dir)
      .sortSmall(col("event_type"), col("day"))

  /** The decomposition CTE prefix (final table in `comp`) shared by the
    * stlDecompose and seasonalityStrength twins. */
  private val stlCtesSql: String =
    """daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT event_type, day, v,
      |    round(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
      |          / COUNT(*) OVER w, 6) AS trend,
      |    date_diff('day', DATE '1970-01-01', day) % 7 AS dow
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |de AS (SELECT *, round(v - trend, 6) AS det FROM tr),
      |seas AS (
      |  SELECT event_type, dow,
      |    round(CAST(SUM(CAST(det AS DECIMAL(18,6))) AS DOUBLE)
      |          / COUNT(*), 6) AS seasonal
      |  FROM de GROUP BY 1, 2),
      |comp AS (
      |  SELECT d.event_type, d.day, d.v, d.trend, s.seasonal,
      |    round(d.det - s.seasonal, 6) AS remainder
      |  FROM de d JOIN seas s USING (event_type, dow))""".stripMargin

  val stlDecomposeSql: String =
    s"""WITH $stlCtesSql
      |SELECT event_type, day, v, trend, seasonal, remainder
      |FROM comp ORDER BY event_type, day""".stripMargin

  /** Seasonality / trend strength (Hyndman & Athanasopoulos, FPP's
    * variance-ratio diagnostics; Wang/Smith/Hyndman 2006): per series,
    * Fs = max(0, 1 − Var(R)/Var(S+R)) and Ft = max(0, 1 − Var(R)/Var(T+R))
    * — the [0,1] scores that say whether the weekly seasonal and the
    * trend component of [[stlDecompose]] actually carry signal. The
    * feature-selection scalar for forecasting pipelines (which series
    * deserve a seasonal model), computed from the decomposition rather
    * than asserted.
    *
    * Determinism: components are rounded to 6 decimals, so each sum
    * (S+R, T+R) is an EXACT double and the casts are lossless; the
    * operand precisions are deliberately ASYMMETRIC per engine so both
    * sides' moment products are exact. Spark takes DECIMAL(18,6):
    * its product type for (p,6)×(p,6) is (2p+1,12), so (18,6)² =
    * (37,12) fits the 38-digit cap, whereas (19,6)² = (39,12) would be
    * rounded (under allowPrecisionLoss) to (38,11) — a 1e-6-boundary
    * drift channel. The DuckDB twin takes DECIMAL(19,6): DuckDB
    * multiplies in the OPERANDS' physical lane without widening, so
    * (18,6) (an INT64 decimal) overflow-errors on these magnitudes,
    * while 19 digits forces the INT128 lane and the (38,12) product is
    * exact. Identical values, exact in both engines; each variance
    * numerator n·Σx²−(Σx)² (the n² denominators cancel in the ratio)
    * is one identically-ordered double chain; degenerate (zero-variance)
    * denominators emit NULL in both engines. */
  def seasonalityStrength(spark: SparkSession, dir: String): DataFrame = {
    val c = stlComponents(spark, dir)
      .select(col("event_type"),
        col("remainder").cast("decimal(18,6)").as("r"),
        (col("seasonal") + col("remainder")).cast("decimal(18,6)").as("sr"),
        (col("trend") + col("remainder")).cast("decimal(18,6)").as("tq"))
    val m = c.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("r")).as("s_r"), sum(col("r") * col("r")).as("ss_r"),
      sum(col("sr")).as("s_sr"), sum(col("sr") * col("sr")).as("ss_sr"),
      sum(col("tq")).as("s_tq"), sum(col("tq") * col("tq")).as("ss_tq"))
    def vn(s: String, ss: String) =
      col("n").cast("double") * col(ss).cast("double") -
        col(s).cast("double") * col(s).cast("double")
    m.select(col("event_type"), col("n").cast("long").as("n_days"),
        when(vn("s_sr", "ss_sr") > 0.0,
          greatest(lit(0.0), round(lit(1.0) -
            vn("s_r", "ss_r") / vn("s_sr", "ss_sr"), 6)))
          .as("seasonal_strength"),
        when(vn("s_tq", "ss_tq") > 0.0,
          greatest(lit(0.0), round(lit(1.0) -
            vn("s_r", "ss_r") / vn("s_tq", "ss_tq"), 6)))
          .as("trend_strength"))
      .sortSmall(col("event_type"))
  }

  /** Oracle twin: the shared decomposition CTEs + the same exact
    * moments and identically-ordered variance-ratio assembly. */
  val seasonalityStrengthSql: String =
    s"""WITH $stlCtesSql,
      |c AS (
      |  SELECT event_type,
      |    CAST(remainder AS DECIMAL(19,6)) AS r,
      |    CAST(seasonal + remainder AS DECIMAL(19,6)) AS sr,
      |    CAST(trend + remainder AS DECIMAL(19,6)) AS tq
      |  FROM comp),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(r) AS s_r, SUM(r * r) AS ss_r,
      |    SUM(sr) AS s_sr, SUM(sr * sr) AS ss_sr,
      |    SUM(tq) AS s_tq, SUM(tq * tq) AS ss_tq
      |  FROM c GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(ss_sr AS DOUBLE)
      |           - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE) > 0
      |  THEN greatest(CAST(0 AS DOUBLE), round(1.0 -
      |    (CAST(n AS DOUBLE) * CAST(ss_r AS DOUBLE)
      |      - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(ss_sr AS DOUBLE)
      |      - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE)), 6))
      |  END AS seasonal_strength,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(ss_tq AS DOUBLE)
      |           - CAST(s_tq AS DOUBLE) * CAST(s_tq AS DOUBLE) > 0
      |  THEN greatest(CAST(0 AS DOUBLE), round(1.0 -
      |    (CAST(n AS DOUBLE) * CAST(ss_r AS DOUBLE)
      |      - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(ss_tq AS DOUBLE)
      |      - CAST(s_tq AS DOUBLE) * CAST(s_tq AS DOUBLE)), 6))
      |  END AS trend_strength
      |FROM m ORDER BY event_type""".stripMargin

  // Lag range for the cross-correlation sweep (0..MaxXcorrLag days).
  private val MaxXcorrLag = 7

  /** Lagged Pearson cross-correlation between every ordered pair of
    * event-type daily series (lag 0..[[MaxXcorrLag]] days): r(a,b,L) =
    * corr(a_t, b_{t−L}) — "does b lead a by L days?" — the lead/lag
    * screening matrix behind any causal/forecasting hypothesis on event
    * streams. Ordered pairs include a==b, so the autocorrelation
    * function comes out of the same pass.
    *
    * Determinism: the daily sums are re-pinned to a controlled decimal
    * after the aggregate, ASYMMETRICALLY per engine (same rationale as
    * [[seasonalityStrength]]): Spark takes (18,4) — it widens
    * sum(DECIMAL(18,4)) to (28,4), whose squares' ideal type (57,8)
    * would be rounded to (38,6), a lossy engine-specific accumulation,
    * while (18,4)² = (37,8) is exact; DuckDB takes (19,4) — its INT128
    * decimal lane, since DuckDB multiplies without widening the
    * operands' physical type and the (18,4)/INT64 lane would
    * overflow-error one scale-up away. So all five moments
    * (Σx, Σy, Σx², Σy², Σxy) accumulate in exact DECIMAL over the joined
    * overlap window — order-independent —
    * and the Pearson assembly is IEEE-correctly-rounded double ops in
    * identical operand order, then round(·, 6); degenerate (constant)
    * windows emit NULL in both engines. Scale posture: the daily table
    * is (types × days)-sized — tiny relative to raw events — so the
    * lag-shifted self-join and the moment aggregate ride one exchange;
    * the per-pair×lag output is (types² × lags). The raw table is
    * scanned ONCE for the daily rollup. */
  def crossCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lags = spark.range(0, MaxXcorrLag + 1)
      .select(col("id").cast("int").as("lag"))
    val x = daily.select(col("event_type").as("a_type"),
      col("day"), col("v").as("vx"))
      .crossJoin(broadcast(lags))
    val j = x.join(
      daily.select(col("event_type").as("b_type"),
        col("day").as("bday"), col("v").as("vy")),
      date_sub(col("day"), col("lag")) === col("bday"))
    val mom = j.groupBy(col("a_type"), col("b_type"), col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("vx")).as("sx"), sum(col("vy")).as("sy"),
        sum(col("vx") * col("vx")).as("sxx"),
        sum(col("vy") * col("vy")).as("syy"),
        sum(col("vx") * col("vy")).as("sxy"))
    val nD = col("n_days").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val dx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val dy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    mom.select(col("a_type"), col("b_type"), col("lag"), col("n_days"),
        when(dx > 0.0 && dy > 0.0, round(num / sqrt(dx * dy), 6))
          .as("xcorr"))
      .sortSmall(col("a_type"), col("b_type"), col("lag"))
  }

  /** Oracle twin: same daily rollup, lag-shifted join (DATE − INTEGER),
    * exact decimal moments, and identically-ordered Pearson assembly. */
  val crossCorrelationSql: String =
    s"""WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(19,4)) AS v
      |  FROM events GROUP BY 1, 2),
      |lags AS (SELECT CAST(unnest(range(0, ${MaxXcorrLag + 1})) AS INTEGER) AS lag),
      |j AS (
      |  SELECT a.event_type AS a_type, b.event_type AS b_type, l.lag,
      |    a.v AS vx, b.v AS vy
      |  FROM daily a CROSS JOIN lags l
      |  JOIN daily b ON b.day = a.day - l.lag),
      |mom AS (
      |  SELECT a_type, b_type, lag, COUNT(*) AS n_days,
      |    SUM(vx) AS sx, SUM(vy) AS sy,
      |    SUM(vx * vx) AS sxx, SUM(vy * vy) AS syy, SUM(vx * vy) AS sxy
      |  FROM j GROUP BY 1, 2, 3)
      |SELECT a_type, b_type, lag, n_days,
      |  CASE WHEN CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |        AND CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |  THEN round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |  END AS xcorr
      |FROM mom ORDER BY a_type, b_type, lag""".stripMargin

  /** CUSUM changepoint detection (Page 1954; the argmax-|S| split is the
    * first step of binary segmentation, Scott/Knott 1974) on each type's
    * daily series: S_t = Σ_{i≤t}(v_i − mean), and the candidate
    * changepoint is the day maximizing |S_t| — where the running
    * deviation mass peaks before reverting. Emitted per type with the
    * peak CUSUM value and the series mean, ties broken to the earliest
    * day.
    *
    * Determinism: deviations are rounded doubles cast to DECIMAL(18,6),
    * so the running prefix sum is EXACT and order-independent (a double
    * running sum would be accumulation-order-sensitive inside the
    * window); the argmax is a deterministic (|S| desc, day asc) rank.
    * Scale posture: one exchange on event_type carries the running-sum
    * window AND the rank window (same partition key); the mean is a
    * per-type aggregate broadcast back — the raw table is scanned once
    * for the daily rollup. */
  def changepointCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("v"))
    val means = daily.groupBy(col("event_type"))
      .agg(round(sum(col("v")).cast("double") / count(lit(1)), 6).as("mean"),
        count(lit(1)).as("n_days"))
    val runW = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankW = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s")).desc, col("day").asc)
    daily.join(broadcast(means), "event_type")
      .withColumn("dev",
        round(col("v").cast("double") - col("mean"), 6).cast("decimal(18,6)"))
      .withColumn("s", sum(col("dev")).over(runW))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("s").cast("double").as("cusum_peak"), col("mean"), col("n_days"))
      .sortSmall(col("event_type"))
  }

  /** Oracle twin: same rounded-deviation decimal prefix sum and
    * deterministic argmax rank in SQL. */
  val changepointCusumSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type,
      |    round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean,
      |    COUNT(*) AS n_days
      |  FROM daily GROUP BY 1),
      |s AS (
      |  SELECT d.event_type, d.day, m.mean, m.n_days,
      |    SUM(CAST(round(CAST(d.v AS DOUBLE) - m.mean, 6) AS DECIMAL(18,6)))
      |      OVER (PARTITION BY d.event_type ORDER BY d.day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM daily d JOIN m USING (event_type)),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY abs(s) DESC, day ASC) AS rn
      |  FROM s)
      |SELECT event_type, day AS cp_day, CAST(s AS DOUBLE) AS cusum_peak,
      |  mean, CAST(n_days AS BIGINT) AS n_days
      |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** Median-absolute-deviation outlier census (Hampel's robust scale;
    * the Leys et al. 2013 recommendation over z-scores) per daily
    * series: med = median(v), MAD = median(|v − med|), outlier ⇔
    * |v − med| > 3·MAD. The robust sibling of [[anomalyZscore]] — a
    * single wild day shifts a mean/stddev but not a median/MAD, so this
    * census stays stable exactly where the z-score one saturates.
    *
    * Determinism: both medians are `percentile(·, 0.5)` /
    * `quantile_cont(·, 0.5)` rounded to 6 (the cross-engine-agreeing
    * pair the percentile queries already pin); deviations are rounded
    * before the second median; the 3·MAD compare is one exact multiply
    * on identical doubles. Scale posture: two grouped percentile passes
    * + a broadcast join back — the daily table is (types × days)-sized,
    * raw events scanned once. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(dsum(col("value")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = daily.groupBy(col("event_type"))
      .agg(expr("round(percentile(v, 0.5), 6)").as("med"),
        count(lit(1)).as("n_days"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev", round(abs(col("v") - col("med")), 6))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("round(percentile(dev, 0.5), 6)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("median_v"), first(col("mad")).as("mad"),
        first(col("n_days")).as("n_days"),
        sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .sortSmall(col("event_type"))
  }

  val madOutliersSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, round(quantile_cont(v, 0.5), 6) AS med,
      |    COUNT(*) AS n_days
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, d.v, m.med, m.n_days,
      |    round(abs(d.v - m.med), 6) AS dev
      |  FROM daily d JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, round(quantile_cont(dev, 0.5), 6) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, MIN(d.med) AS median_v, MIN(m.mad) AS mad,
      |  CAST(MIN(d.n_days) AS BIGINT) AS n_days,
      |  CAST(SUM(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Calendar gap-filling with last-observation-carried-forward (LOCF —
    * the standard irregular→regular series alignment step before any
    * window/lag model): per type, densify to the FULL [min_day, max_day]
    * calendar (each type's own span), mark which days are observed, and
    * carry the last observed value forward across the gaps. Every
    * emitted value is an exact COPY of an input value (no arithmetic),
    * so cross-engine agreement is structural.
    *
    * Scale posture: the calendar is generated per TYPE from one
    * min/max aggregate row (sequence + explode — #days rows per type,
    * never corpus-sized), left-joined to the daily rollup, and the
    * carry-forward is one last(ignoreNulls) window on the same
    * event_type exchange the join used. At 100 TB the same plan holds:
    * calendar size is domain-sized (types × days), not data-sized. */
  def gapfillLocf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(dsum(col("value")).as("v"))
    val calendar = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(daily, Seq("event_type", "day"), "left")
      .withColumn("observed", col("v").isNotNull)
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("day"), col("observed"), col("v_filled"))
      .sortSmall(col("event_type"), col("day"))
  }

  /** Oracle twin: generate_series calendar + the same windowed
    * carry-forward (DuckDB spells last(x IGNORE NULLS) as
    * last_value(x IGNORE NULLS)). */
  val gapfillLocfSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
      |  FROM daily GROUP BY 1),
      |cal AS (
      |  SELECT event_type, CAST(unnest(generate_series(lo, hi,
      |    INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span)
      |SELECT c.event_type, c.day, d.v IS NOT NULL AS observed,
      |  last_value(d.v IGNORE NULLS) OVER (
      |    PARTITION BY c.event_type ORDER BY c.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM cal c LEFT JOIN daily d USING (event_type, day)
      |ORDER BY c.event_type, c.day""".stripMargin
}
