package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BoundedCollectLongs semantics: exactly `collect_list` for groups of at
  * most cap values, NULL for anything larger — under partial aggregation,
  * merges, and serialization (the shapes the LSH tiers rely on). */
class BoundedCollectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("buffer: add/overflow/merge invariants") {
    import BoundedCollectLongs.Buf
    val b = new Buf(3)
    b.add(1); b.add(2); b.add(3)
    assert(b.n === 3 && !b.overflowed)
    b.add(4) // cap+1-th value overflows and is not stored
    assert(b.overflowed && b.n === 3)
    // merge of two under-cap buffers that jointly overflow
    val x = new Buf(3); x.add(1); x.add(2)
    val y = new Buf(3); y.add(3); y.add(4)
    x.addAll(y)
    assert(x.overflowed)
    // merge that lands exactly at cap does not overflow
    val p = new Buf(3); p.add(1)
    val q = new Buf(3); q.add(2); q.add(3)
    p.addAll(q)
    assert(!p.overflowed && p.n === 3)
    // overflow flag propagates through merge regardless of counts
    val o = new Buf(3); o.overflowed = true
    val z = new Buf(3); z.add(9)
    z.addAll(o)
    assert(z.overflowed)
  }

  test("aggregate equals collect_list under cap, NULL over cap (many partitions)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // group g has g members (1..60); cap 25 → groups 26..60 must be NULL.
    // 16 input partitions force partial buffers + merges + serialization.
    val rows = for { g <- 1 to 60; i <- 1 to g } yield (g.toLong, (g * 1000 + i).toLong)
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(call_function("graft_bounded_collect", col("v"), lit(25)).as("ds"))
      .select(col("g"), col("ds"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    (1 to 60).foreach { g =>
      if (g <= 25) {
        val ds = got(g.toLong)
        assert(ds.isDefined, s"group $g must survive the cap")
        assert(ds.get.sorted === (1 to g).map(i => (g * 1000 + i).toLong),
          s"group $g must collect exactly its members")
      } else
        assert(got(g.toLong).isEmpty, s"group $g (size $g > 25) must be NULL")
    }
  }
}
