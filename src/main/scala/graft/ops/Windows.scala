package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window-function inventory (SURVEY.md §2b "Window functions").
  *
  * Each window partitions by a key and orders by a deterministic column
  * list ending in a unique tiebreaker — required both for cross-engine
  * reproducibility and for sane semantics at scale (a window over an
  * ambiguous order is nondeterministic on any distributed engine).
  * Scale note: window partitions must fit an executor; partition keys here
  * (custkey, brand, status) are fine. A per-ALL-rows window (no
  * partitionBy) would single-task at 100 TB — none are used.
  */
object Windows {

  /** row_number top-k per group: top 3 orders by price per order status.
    * Spark 4 plans the rank filter as WindowGroupLimit (verified in the
    * executed plan): each partition keeps only its local top-k before the
    * window shuffle, so no full partition sort materializes — no custom
    * operator needed for this shape. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderstatus"), col("rn"))
  }

  val topkPerGroupSql: String =
    """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin

  /** Same top-3-per-status semantics via the engine's own whole-operator
    * extension `graft.plans.TopKPerGroup` (logical node → strategy →
    * two-phase bounded-heap physical operator) instead of a window: the
    * heap keeps k rows per group map-side, so the shuffle carries at most
    * groups × k rows per partition and no partition sort materializes.
    * Same DuckDB oracle as the window formulation, minus the rank column
    * (the operator emits rows, not ranks). */
  def topkPerGroupNative(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.GraftOps.topKPerGroup(
        o,
        groupCols = Seq("o_orderstatus"),
        orderCols = Seq("o_totalprice" -> true, "o_orderkey" -> false),
        k = 3)
      .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val topkPerGroupNativeSql: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin

  /** lag/lead: previous and next order price per customer over time. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val lagLeadSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |                             ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |                              ORDER BY o_orderdate, o_orderkey) AS next_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Running total with an explicit ROWS frame; the summed measure is cast
    * to decimal so the running sum is exact in both engines. */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast(DoubleType).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val runningSumSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** rank / dense_rank with real ties (p_retailprice repeats within brand). */
  def rankDense(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    p.select(
        col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).as("price_rank"),
        dense_rank().over(w).as("price_dense_rank"))
      .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
  }

  val rankDenseSql: String =
    """SELECT p_brand, p_partkey, p_retailprice,
      |  RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
      |  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
      |FROM part ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin

  /** RANGE frame (value-based, not row-based): for each order, how many of
    * the customer's orders fall within ±10000 of its price, and their
    * exact sum — the frame every sliding-value analytic needs. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, 10000L)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_near_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast(DoubleType).as("sum_near_price"))
      .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
  }

  val rangeFrameSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  COUNT(*) OVER w AS n_near_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_near_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
      |             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
      |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin

  /** Time-interval RANGE frame: per user, the trailing-1-hour event count
    * and exact value sum at every event — the rate/rolling-metric window a
    * sessionized event log is queried with. The frame bound is an INTERVAL
    * over the timestamp ordering (value-based, so simultaneous events are
    * frame peers — deterministic, unlike a ROWS frame under ties). One
    * exchange on user_id; the interval arithmetic is NTZ wall-clock on
    * both engines, so no session-timezone sensitivity. */
  def timeRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    // The user_id filter PRECEDES the window (and pushes to the scan):
    // the partition key is the filter key, so kept users keep all their
    // events and the frame semantics are unchanged — at scale this is the
    // difference between windowing the corpus and windowing the slice.
    val over = "OVER (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    graft.Tables.events(spark, dir)
      .filter(col("user_id") % 20 === 0)
      .selectExpr("user_id", "event_id", "ts",
        s"COUNT(*) $over AS n_last_hour",
        s"CAST(SUM(CAST(value AS DECIMAL(18,4))) $over AS DOUBLE) AS sum_last_hour")
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val timeRangeFrameSql: String =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |  COUNT(*) OVER w AS n_last_hour,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
      |FROM events WHERE user_id % 20 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
      |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** first_value / last_value / nth_value over a fully-specified frame. */
  def firstLastNth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val firstLastNthSql: String =
    """SELECT o_custkey, o_orderkey,
      |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
      |  LAST_VALUE(o_totalprice) OVER w AS last_price,
      |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ntile + percent_rank distribution stats per nation over customers. */
  def distribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    c.select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
  }

  val distributionSql: String =
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  NTILE(4) OVER (PARTITION BY c_nationkey
      |                 ORDER BY c_acctbal, c_custkey) AS quartile,
      |  CUME_DIST() OVER (PARTITION BY c_nationkey
      |                    ORDER BY c_acctbal, c_custkey) AS cdist
      |FROM customer ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin

  /** NTILE(10) decile census per order status: rank orders into price
    * deciles, then aggregate each decile to its count / price band / exact
    * sum. The analytic window emits one row per input, but the census
    * collapses it to statuses × 10 rows — the distribution-profile rollup
    * a pricing dashboard runs. SQL-standard NTILE over a total order
    * (price, then unique key) is engine-independent, so both sides bucket
    * identically. Scale: per-status partitions must fit an executor for
    * the sort; a 100 TB variant buckets by percent_rank from a sampled CDF
    * instead — the census shape downstream is unchanged. */
  def ntileDeciles(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.withColumn("decile", ntile(10).over(w))
      .groupBy(col("o_orderstatus"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo_price"),
        max(col("o_totalprice")).as("hi_price"),
        dsum(col("o_totalprice")).as("sum_price"))
      .sortSmall(col("o_orderstatus"), col("decile"))
  }

  val ntileDecilesSql: String =
    """WITH d AS (
      |  SELECT o_orderstatus, o_totalprice,
      |    NTILE(10) OVER (PARTITION BY o_orderstatus
      |                    ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT o_orderstatus, decile, COUNT(*) AS n,
      |  MIN(o_totalprice) AS lo_price, MAX(o_totalprice) AS hi_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM d GROUP BY o_orderstatus, decile
      |ORDER BY o_orderstatus, decile""".stripMargin

  /** Gaps-and-islands: longest run of CONSECUTIVE active days per user.
    * The classic derivation — island id = day − row_number() over the
    * user's distinct active days (constant within a consecutive run,
    * jumps across a gap) — needs only integer date arithmetic, so both
    * engines agree exactly. Plan: distinct (user, day) pre-partitioned on
    * user_id so the dedup aggregate, the row_number window, and the
    * island census all ride ONE exchange (subset-key clustering, same
    * trick as [[Graph.triangleCount]]); the final per-user max is a
    * second tiny aggregate on the same partitioning. */
  def gapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_date(cast(ts as date))").as("day"))
      .repartition(col("user_id"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("run_len"), min(col("day")).as("run_start"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("run_len"), col("run_start"))).as("best"))
      .select(col("user_id"), col("best.run_len").as("longest_streak"),
        col("best.run_start").as("streak_start_day"))
      .orderBy(col("user_id"))
  }

  // The per-user argmax (longest run, earliest start as tiebreaker) is a
  // lexicographic struct max in Spark; DuckDB mirrors it with arg-max over
  // the same composed ordering via ROW_NUMBER.
  val gapsIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
      |  FROM events),
      |isl AS (
      |  SELECT user_id,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island,
      |    day
      |  FROM days),
      |runs AS (
      |  SELECT user_id, island, COUNT(*) AS run_len, MIN(day) AS run_start
      |  FROM isl GROUP BY user_id, island),
      |ranked AS (
      |  SELECT user_id, run_len, run_start,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY run_len DESC, run_start DESC) AS rk
      |  FROM runs)
      |SELECT user_id, run_len AS longest_streak, run_start AS streak_start_day
      |FROM ranked WHERE rk = 1 ORDER BY user_id""".stripMargin

  /** Running-distinct milestones: for every user, the event at which they
    * touched their k-th DISTINCT event type ("time to k-th behavior" —
    * the activation-curve metric). A cumulative COUNT(DISTINCT) window is
    * not partial-aggregable (neither engine supports it over a running
    * frame); the standard reformulation is two stacked windows: flag
    * first occurrences with a per-(user, type) ROW_NUMBER, then rank the
    * flagged rows per user — output is ≤ |event types| rows per user, and
    * both windows hash-shuffle on user_id ONCE (the second sort reuses
    * the first's partitioning; same subset-key posture as the triangle
    * pipeline). */
  def timeToKthType(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      // hash on user_id — a SUBSET of the first window's partition key —
      // satisfies both windows' clustering, so the pair runs on ONE
      // exchange (two sorts, no re-shuffle between them)
      .repartition(col("user_id"))
    val firstSeen = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val perUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e.withColumn("occ", row_number().over(firstSeen))
      .filter(col("occ") === 1)
      .withColumn("k", row_number().over(perUser))
      .select(col("user_id"), col("k"), col("event_type"),
        col("event_id").as("first_event_id"), col("ts").as("first_ts"))
      .orderBy(col("user_id"), col("k"))
  }

  val timeToKthTypeSql: String =
    """WITH f AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS occ
      |  FROM events),
      |k AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS k
      |  FROM f WHERE occ = 1)
      |SELECT user_id, CAST(k AS INTEGER) AS k, event_type,
      |  event_id AS first_event_id, ts AS first_ts
      |FROM k ORDER BY user_id, k""".stripMargin
}
