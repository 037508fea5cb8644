package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch invariants: one-sidedness (estimate ≥ true count,
  * guaranteed by construction — counters only ever over-count), the
  * paper's ε·N overestimate bound, and distributed merge correctness
  * (multi-partition build must equal a single-partition one: merges are
  * element-wise sums). */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("estimates are one-sided, within bound, and merge-invariant") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // key i appears exactly i times; N = 5050 over width 4096
    val keys = (1 to 100).flatMap(i => Seq.fill(i)(i.toLong))
    def build(parts: Int): Array[Byte] =
      spark.createDataset(keys).toDF("k").repartition(parts)
        .agg(call_function("graft_cms_build", col("k"), lit(4), lit(4096)))
        .head().getAs[Array[Byte]](0)
    val one = build(1)
    val many = build(7) // forces serialize/merge across partial buffers
    assert(java.util.Arrays.equals(one, many),
      "sketch must be identical however the input is partitioned")
    val bound = math.ceil(math.E * 5050 / 4096.0).toLong
    (1 to 100).foreach { i =>
      val est = graft.functions.CountMinOps.estimate(one, i.toLong)
      assert(est >= i, s"count-min can never under-count (key $i: $est < $i)")
      assert(est - i <= bound, s"overestimate for key $i beyond eN/width: $est")
    }
    // an unseen key may collide but stays within the same bound
    val unseen = graft.functions.CountMinOps.estimate(one, 987654321L)
    assert(unseen >= 0 && unseen <= bound)
  }
}
