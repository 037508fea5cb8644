package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components: PageRank
  * (Brin/Page 1998) over the user↔event-type bipartite interaction graph,
  * run as THREE UNROLLED join-aggregate rounds in EXACT fixed-point
  * integer arithmetic — rank mass is scaled to 10¹² and every update is
  * integer division/multiplication, so both engines produce bit-identical
  * ranks (floating-point PageRank can never hash-match across engines:
  * partial-sum order differs in the last ulps every iteration and the
  * error compounds).
  *
  * Scale posture: each round is one equi-join of the edge table against
  * the (node-cardinality) rank table + one map-side-combined aggregate —
  * the standard distributed PageRank step. The rank table broadcasts here
  * (nodes ≪ edges, the common bipartite case); on a graph where it
  * cannot, the same plan degrades to a shuffled join on src. Unrolling is
  * deliberate for a FIXED iteration count (no lineage growth to manage —
  * the iterative-loop machinery with localCheckpoint truncation lives in
  * [[Dedup.labelPropagationCC]]); a convergence-driven variant would add
  * the checkpoint cadence, not change the per-round dataflow.
  */
object Graph {

  private val Scale = 1000000000000L // 10^12 fixed-point rank mass
  private val Rounds = 3

  def pagerankBipartite(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.events(spark, dir)
      .select(concat(lit("u:"), col("user_id")).as("a"),
        concat(lit("t:"), col("event_type")).as("b"))
      .distinct()
    // undirected interaction graph → both directions; every node thus has
    // in- and out-degree ≥ 1 (no dangling-mass handling needed)
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .union(e0.select(col("b").as("src"), col("a").as("dst")))
    // The degree table IS the node table (unique per src, node-sized):
    // nodes, N, and r0 all derive from this one cached aggregate — no
    // separate distinct pass. Persisted node-sized; the edge table joins
    // it by BROADCAST (narrow — no co-partitioning shuffle of edges).
    // On a graph whose node table exceeds broadcast size, drop this hint
    // (and the per-round one): the joins degrade to shuffles on src and
    // the dataflow is the standard partitioned PageRank — same plan
    // shape, keyed exchanges instead of broadcasts.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ed = edges.join(broadcast(deg), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDf = deg.agg(count(lit(1)).as("nn"))
    // N rides the rank table as a constant column: a crossJoin-broadcast
    // of the count per round would add a stage wave per iteration for a
    // value that never changes (max(nn) in the round aggregate recovers
    // it for free).
    val r0 = deg.select(col("src").as("node")).crossJoin(broadcast(nDf))
      .select(col("node"), expr(s"$Scale div nn").as("r"), col("nn"))
    val rFinal = (1 to Rounds).foldLeft(r0) { (r, _) =>
      ed.join(broadcast(r), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div deg")).as("inc"), max(col("nn")).as("nn"))
        .select(col("dst").as("node"),
          expr(s"(15 * ($Scale div nn)) div 100 + (85 * inc) div 100").as("r"),
          col("nn"))
    }
    rFinal.select(col("node"), col("r"))
      .orderBy(col("r").desc, col("node")).limit(20)
  }

  val pagerankBipartiteSql: String = {
    def round(prev: String): String =
      s"""SELECT dst AS node,
         |    (15 * ($Scale // nn)) // 100 + (85 * SUM(r // deg)) // 100 AS r
         |  FROM edges JOIN deg USING (src) JOIN $prev ON $prev.node = edges.src, n
         |  GROUP BY dst, nn""".stripMargin
    s"""WITH e0 AS (
      |  SELECT DISTINCT 'u:' || user_id AS a, 't:' || event_type AS b
      |  FROM events),
      |edges AS (
      |  SELECT a AS src, b AS dst FROM e0
      |  UNION ALL SELECT b AS src, a AS dst FROM e0),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      |n AS (SELECT COUNT(DISTINCT src) AS nn FROM edges),
      |r0 AS (
      |  SELECT src AS node, $Scale // nn AS r
      |  FROM (SELECT DISTINCT src FROM edges) s, n),
      |r1 AS (
      |  ${round("r0")}),
      |r2 AS (
      |  ${round("r1")}),
      |r3 AS (
      |  ${round("r2")})
      |SELECT node, r FROM r3 ORDER BY r DESC, node LIMIT 20""".stripMargin
  }
}
