package graft

import graft.functions.{GraftFunctions, SpaceSavingTopK}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving sketch semantics: exactness when capacity covers the
  * domain, heavy-hitter retention under eviction, and cross-partition
  * merge correctness through the real aggregation pipeline. */
class SpaceSavingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def topkOf(tokens: Seq[String], capacity: Int, k: Int,
      partitions: Int): Seq[(String, Long)] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    tokens.toDF("token").repartition(partitions)
      .agg(expr(s"graft_topk_sketch(token, $capacity, $k)").as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.token"), col("s.n"))
      .as[(String, Long)].collect().toSeq
      .sortBy { case (t, n) => (-n, t) }
  }

  test("exact when capacity >= distinct items, across 8 partitions") {
    val tokens = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c") ++
      Seq.fill(3)("d")
    val got = topkOf(scala.util.Random.shuffle(tokens), capacity = 16, k = 10,
      partitions = 8)
    assert(got === Seq("a" -> 50L, "b" -> 30L, "c" -> 7L, "d" -> 3L))
  }

  test("heavy hitter survives eviction when capacity < distinct items") {
    // 200 'hot' among 100 distinct cold singletons, capacity 8
    val tokens = scala.util.Random.shuffle(
      Seq.fill(200)("hot") ++ (1 to 100).map(i => s"cold$i"))
    val got = topkOf(tokens, capacity = 8, k = 3, partitions = 4)
    assert(got.head._1 === "hot")
    // SpaceSaving may overestimate but never undercount the true frequency
    assert(got.head._2 >= 200L)
  }

  test("buffer serialization round-trips") {
    val s = new SpaceSavingTopK.Sketch(4)
    Seq("x", "x", "y", "z", "w", "v").foreach(s.offer)
    val agg = SpaceSavingTopK(
      org.apache.spark.sql.catalyst.expressions.Literal("t"), 4, 4)
    val back = agg.deserialize(agg.serialize(s))
    assert(back.capacity === s.capacity)
    assert(back.counts.toMap === s.counts.toMap)
  }
}
