package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse-maintenance shapes: MERGE-style upsert, SCD type-2 dimension
  * derivation, and Z-order (Morton-curve) clustering — the table-upkeep
  * operators a 100 TB corpus needs between query workloads. No table
  * format (Delta/Iceberg) ships in this environment, so each is expressed
  * as the underlying relational plan those systems execute; swapping the
  * sink for a format-aware writer changes none of the dataflow.
  *
  * Scale posture:
  *  - MERGE = one sort-merge full-outer shuffle on the key. With the base
  *    table bucketed by key (the layout a maintained table would have),
  *    the base side's exchange disappears and only the (small) changeset
  *    shuffles; a format-aware writer additionally prunes to the files
  *    whose key ranges overlap the changeset.
  *  - SCD2 = two window passes over the SAME (user) partitioning — one
  *    exchange, two in-partition sorts; never a self-join.
  *  - Z-order = pure per-row bit arithmetic (codegen'd) + one census
  *    aggregate; the clustered WRITE is repartitionByRange(z) +
  *    sortWithinPartitions(z), demonstrated with real parquet footers in
  *    `ZOrderSpec`.
  */
object Lakehouse {

  // ---------------------------------------------------------------- MERGE

  /** Deterministic changeset derived from the base table itself: keys
    * ≡ 0 (mod 10) get an update (price bumped by exactly +100.0, status
    * 'U'); keys ≡ 3 (mod 17) spawn an insert under a shifted key range
    * that cannot collide with base keys. Deriving changes from the base
    * keeps the query self-contained and the oracle twin exact. */
  private val InsertKeyShift = 100000000L

  private def baseAndChanges(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val upd = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
    val ins = base.filter(col("o_orderkey") % 17 === 3)
      .select((col("o_orderkey") + lit(InsertKeyShift)).as("o_orderkey"),
        col("o_totalprice"), lit("N").as("o_orderstatus"))
    (base, upd.union(ins))
  }

  /** MERGE INTO base USING changes ON key — WHEN MATCHED UPDATE, WHEN NOT
    * MATCHED INSERT — expressed as the full-outer join + coalesce plan
    * every MERGE lowers to. The `action` column labels each output row
    * (update/insert/carry) so the changeset routing itself is part of the
    * hash-checked result. Output is sampled by key (mod 7) to bound the
    * result; the sample crosses all three action classes. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val (base, chg) = baseAndChanges(spark, dir)
    base.as("b").join(chg.as("c"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("c.o_totalprice"), col("b.o_totalprice")).as("o_totalprice"),
        coalesce(col("c.o_orderstatus"), col("b.o_orderstatus")).as("o_orderstatus"),
        when(col("c.o_orderstatus").isNotNull && col("b.o_orderstatus").isNotNull,
          lit("update"))
          .when(col("b.o_orderstatus").isNull, lit("insert"))
          .otherwise(lit("carry")).as("action"))
      .filter(col("o_orderkey") % 7 === 0)
      .orderBy(col("o_orderkey"))
  }

  val mergeUpsertSql: String =
    s"""WITH base AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |chg AS (
      |  SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
      |    'U' AS o_orderstatus
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + $InsertKeyShift, o_totalprice, 'N'
      |  FROM base WHERE o_orderkey % 17 = 3)
      |SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
      |  COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
      |  CASE WHEN c.o_orderstatus IS NOT NULL AND b.o_orderstatus IS NOT NULL
      |         THEN 'update'
      |       WHEN b.o_orderstatus IS NULL THEN 'insert'
      |       ELSE 'carry' END AS action
      |FROM base b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey
      |WHERE COALESCE(c.o_orderkey, b.o_orderkey) % 7 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------------- SCD2

  /** Slowly-changing-dimension type 2 over the events stream: per user,
    * collapse consecutive same-type events and emit one versioned row per
    * type CHANGE with [effective_from, effective_to) validity and an
    * is_current flag — the standard history-keeping dimension build.
    * Two window functions over the same (user_id) partitioning: the
    * change filter runs on lag(), the validity range on lead() AFTER the
    * filter (so effective_to is the next *change*, not the next event).
    * Ties on ts are ordered by event_id, which also rides along as the
    * deterministic version anchor. */
  def scd2UserStatus(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val chg = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    chg
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"),
        col("ts").as("effective_from"),
        lead(col("ts"), 1).over(byUser).as("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
      .filter(col("user_id") % 25 === 0)
      .orderBy(col("user_id"), col("effective_from"), col("first_event_id"))
  }

  val scd2UserStatusSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_id, ts, event_type FROM e
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, event_id AS first_event_id,
      |  ts AS effective_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM chg
      |WHERE user_id % 25 = 0
      |ORDER BY user_id, effective_from, first_event_id""".stripMargin

  // -------------------------------------------------------------- Z-order

  /** Morton-code (Morton 1966; the Z-order curve of Orenstein/Merrett 1984
    * and Delta/Databricks OPTIMIZE ZORDER) bit-spread of a 16-bit value
    * into the even bits of a 32-bit word — the classic magic-mask ladder, all LONG arithmetic so both
    * engines evaluate identically. */
  private def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(65535L))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(16711935L)) // 0x00FF00FF
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(252645135L)) // 0x0F0F0F0F
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(858993459L)) // 0x33333333
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(1431655765L)) // 0x55555555
  }

  /** 2-D Morton (Z-order) interleave of two 16-bit dims → 32-bit z. */
  private[graft] def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The same ladder as portable SQL (DuckDB `<<`/`&`/`|` on BIGINT). */
  private def spread16Sql(x: String): String = {
    val s0 = s"(($x) & 65535)"
    val s1 = s"((($s0 << 8) | $s0) & 16711935)"
    val s2 = s"((($s1 << 4) | $s1) & 252645135)"
    val s3 = s"((($s2 << 2) | $s2) & 858993459)"
    s"((($s3 << 1) | $s3) & 1431655765)"
  }

  private def morton2Sql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Z-order clustering census: lineitem keyed by the Morton interleave of
    * (l_partkey, l_suppkey), bucketed into 32×32 boxes
    * (z >> 10). Because z-bins are axis-aligned boxes on the interleaved
    * grid, each bin's min/max span on BOTH dims is bounded (≤ 31) — the locality
    * property that makes a z-sorted layout prunable on either column, vs
    * a single-column sort which is prunable on one. The census output IS
    * that property, hash-checked; the physical clustered write
    * (repartitionByRange(z) + sortWithinPartitions(z) + parquet footers)
    * is pinned by `ZOrderSpec`. */
  def zorderBins(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      pmod(col("l_partkey"), lit(65536L)).as("p"),
      pmod(col("l_suppkey"), lit(65536L)).as("s"))
    li.withColumn("zbin", shiftrightunsigned(morton2(col("p"), col("s")), 10))
      .groupBy(col("zbin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("p")).as("p_min"), max(col("p")).as("p_max"),
        min(col("s")).as("s_min"), max(col("s")).as("s_max"))
      .sortSmall(col("zbin"))
  }

  val zorderBinsSql: String = {
    val z = morton2Sql("l_partkey % 65536", "l_suppkey % 65536")
    s"""WITH zed AS (
      |  SELECT l_partkey % 65536 AS p, l_suppkey % 65536 AS s,
      |    ($z >> 10) AS zbin
      |  FROM lineitem)
      |SELECT zbin, COUNT(*) AS n_rows,
      |  MIN(p) AS p_min, MAX(p) AS p_max,
      |  MIN(s) AS s_min, MAX(s) AS s_max
      |FROM zed GROUP BY zbin ORDER BY zbin""".stripMargin
  }

  /** The clustered write itself, split out for `ZOrderSpec`: range-shuffle
    * on z then sort each output file by z — every file covers a tight z
    * interval, hence a bounded box on both dims, which parquet footer
    * min/max stats expose to any reader for two-column pruning. */
  private[graft] def zorderClusteredWrite(df: DataFrame, nFiles: Int): DataFrame = {
    val zed = df.select(
      pmod(col("l_partkey"), lit(65536L)).as("p"),
      pmod(col("l_suppkey"), lit(65536L)).as("s"))
      .withColumn("z", morton2(col("p"), col("s")))
    zed.repartitionByRange(nFiles, col("z")).sortWithinPartitions(col("z"))
  }

  /** CDC log apply (the Debezium/Delta CDF consumption pattern): compact
    * an insert/update/delete change log to its final snapshot by per-key
    * LAST-WRITER-WINS — keep each key's highest-version row, drop the
    * key if that row is a delete — then census the survivors. The log is
    * built deterministically from orders (every key inserts at v1, every
    * 3rd key updates at v2 with +10.0 — one exactly-rounded double add —
    * every 10th key deletes at v3), so both engines derive the identical
    * log without a CDC source. Emitted as the per-status census of the
    * applied snapshot plus the op counts processed, so the driver
    * compare pins both the compaction and the routing.
    *
    * Scale posture: the compaction is ONE exchange on the key (window
    * max-version rank — the same shape a streaming foreachBatch
    * compactor runs per micro-batch over much smaller deltas); the log
    * build is three narrow projections unioned, no join. At warehouse
    * scale this is exactly Delta/Iceberg MERGE-from-CDF: key-partitioned,
    * no driver state. */
  /** The deterministic synthetic I/U/D log (shared with
    * `StreamingSpec`'s foreachBatch CDC-compaction lifecycle). */
  private[graft] def cdcLog(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val ins = o.select(col("o_orderkey"), lit(1L).as("version"),
      lit("I").as("op"), col("o_orderstatus"), col("o_totalprice"))
    val upd = o.filter(pmod(col("o_orderkey"), lit(3L)) === 0)
      .select(col("o_orderkey"), lit(2L).as("version"), lit("U").as("op"),
        col("o_orderstatus"), (col("o_totalprice") + lit(10.0)).as("o_totalprice"))
    val del = o.filter(pmod(col("o_orderkey"), lit(10L)) === 0)
      .select(col("o_orderkey"), lit(3L).as("version"), lit("D").as("op"),
        col("o_orderstatus"), col("o_totalprice"))
    ins.union(upd).union(del)
  }

  /** The applied-snapshot census over a compacted (one-row-per-key,
    * deletes included) snapshot — shared with the streaming spec so the
    * batch and foreachBatch compactors are censused identically. */
  private[graft] def cdcCensus(last: DataFrame): DataFrame =
    last.filter(col("op") =!= "D")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"),
        dsum(col("o_totalprice")).as("sum_price"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updated"))

  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    // r20 rewrite (guide §2.3/§2.4), value-identical to the window+join
    // shape (LakehouseSpec pins parity against cdcLog + window):
    //
    //  - ONE-SCAN log: the synthetic I/U/D entries are generated per
    //    base row as an array and exploded, instead of cdcLog's 3-arm
    //    union whose every consumer re-scanned orders 3× (and this query
    //    had two consumers: 6 scans).
    //  - last-writer-wins as an AGGREGATE, not a window: versions are
    //    distinct within a key, so max(struct(version, …)) IS the
    //    row_number()=1 row, without the window's per-partition sort and
    //    with map-side partial aggregation (every key's log rows are
    //    born in one input partition, so the exchange carries ~1 row per
    //    key).
    //  - the per-status log-row count rides the SAME aggregate (a key's
    //    status is constant across its log rows), so the separate
    //    opCounts aggregate + broadcast join disappears. A status whose
    //    every key ends deleted must still vanish from the output (the
    //    old inner join dropped it with the empty census row) — the
    //    n_live > 0 filter keeps that contract exactly.
    //
    //  6 scans / 3 exchanges / window sort / join → 1 scan / 2 exchanges
    //  (plans/r20/merge_cdc_apply_{before,after}.txt). At 100 TB a real
    //  CDC log is an input table, and this is the one-pass compaction
    //  census shape over it.
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    def entry(v: Column, op: Column, price: Column): Column =
      struct(v.as("version"), op.as("op"),
        col("o_orderstatus").as("o_orderstatus"), price.as("o_totalprice"))
    val log = o.select(col("o_orderkey"), explode(filter(array(
        entry(lit(1L), lit("I"), col("o_totalprice")),
        when(pmod(col("o_orderkey"), lit(3L)) === 0,
          entry(lit(2L), lit("U"), col("o_totalprice") + lit(10.0))),
        when(pmod(col("o_orderkey"), lit(10L)) === 0,
          entry(lit(3L), lit("D"), col("o_totalprice")))),
        x => x.isNotNull)).as("e"))
    val last = log.groupBy(col("o_orderkey"))
      .agg(max(col("e")).as("s"), count(lit(1)).as("n_log"))
    last.groupBy(col("s.o_orderstatus").as("o_orderstatus"))
      .agg(
        count(when(col("s.op") =!= "D", lit(1))).as("n_live"),
        dsum(when(col("s.op") =!= "D", col("s.o_totalprice"))).as("sum_price"),
        sum(when(col("s.op") === "U", 1L).otherwise(0L)).as("n_updated"),
        sum(col("n_log")).as("n_log_rows"))
      .filter(col("n_live") > 0)
      .sortSmall(col("o_orderstatus"))
  }

  /** Oracle twin: identical synthetic log (UNION ALL), last-writer-wins
    * window, delete drop, and census. */
  val cdcApplySql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |log AS (
      |  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, 'I' AS op,
      |    o_orderstatus, o_totalprice FROM base
      |  UNION ALL
      |  SELECT o_orderkey, CAST(2 AS BIGINT), 'U', o_orderstatus,
      |    o_totalprice + 10.0 FROM base WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, CAST(3 AS BIGINT), 'D', o_orderstatus,
      |    o_totalprice FROM base WHERE o_orderkey % 10 = 0),
      |last AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |      ORDER BY version DESC) AS rn
      |    FROM log) WHERE rn = 1),
      |census AS (
      |  SELECT o_orderstatus, COUNT(*) AS n_live,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
      |  FROM last WHERE op <> 'D' GROUP BY 1),
      |oc AS (
      |  SELECT o_orderstatus, COUNT(*) AS n_log_rows FROM log GROUP BY 1)
      |SELECT c.o_orderstatus, c.n_live, c.sum_price, c.n_updated, o.n_log_rows
      |FROM census c JOIN oc o USING (o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin
}
