package graft

import graft.functions.{FloatVectorDot, FloatVectorSqNorm, GraftFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native expression correctness: the codegen'd vector ops must agree
  * bit-for-bit with the declarative higher-order-function folds they
  * replace, in both codegen and interpreted evaluation, and the optimizer
  * rule must rewrite self-dots into single-read square norms. */
class FloatVectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def em = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
  }

  test("graft_vec_dot equals the declarative zip_with/aggregate fold bit-for-bit") {
    val mismatch = em.select(
        expr("graft_vec_dot(embedding, embedding)").as("native"),
        aggregate(
          zip_with(col("embedding"), col("embedding"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch === 0L)
  }

  test("interpreted eval matches codegen results") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val arr = ArrayData.toArrayData(Array(1.5f, -2.25f, 3.0f))
    val ref = Literal.create(arr, ArrayType(FloatType))
    val dot = FloatVectorDot(ref, ref).eval(null).asInstanceOf[Double]
    val sq = FloatVectorSqNorm(ref).eval(null).asInstanceOf[Double]
    val expected = 1.5 * 1.5 + 2.25 * 2.25 + 3.0 * 3.0
    assert(dot === expected)
    assert(sq === expected)
    assert(dot === sq)
  }

  test("optimizer rule rewrites dot(x, x) to sqnorm(x)") {
    val df = em.select(expr("graft_vec_dot(embedding, embedding)").as("n"))
    val optimized = df.queryExecution.optimizedPlan
    val exprs = optimized.expressions.flatMap(_.collect {
      case e: FloatVectorSqNorm => e
      case e: FloatVectorDot => e
    })
    assert(exprs.exists(_.isInstanceOf[FloatVectorSqNorm]),
      s"expected FloatVectorSqNorm in optimized plan, got: $optimized")
    assert(!exprs.exists(_.isInstanceOf[FloatVectorDot]))
  }

  test("rule does NOT fire for distinct vectors") {
    val two = em.as("a").crossJoin(em.as("b")).limit(10)
      .select(expr("graft_vec_dot(a.embedding, b.embedding)").as("d"))
    val exprs = two.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case e: FloatVectorDot => e })
    assert(exprs.nonEmpty)
  }

  test("sqnorm rewrite preserves values") {
    val r = em.select(
        expr("graft_vec_dot(embedding, embedding)").as("via_rule"),
        expr("graft_vec_sqnorm(embedding)").as("direct"))
      .filter(col("via_rule") =!= col("direct"))
      .count()
    assert(r === 0L)
  }

  test("vecDot composes with non-trivial child expressions (no parser round-trip)") {
    // slice() children would break a string-interpolated expr() build;
    // call_function-based construction must handle them.
    val df = em.select(
        GraftFunctions.vecDot(
          slice(col("embedding"), 1, 4), slice(col("embedding"), 1, 4)).as("native"),
        aggregate(
          zip_with(slice(col("embedding"), 1, 4), slice(col("embedding"), 1, 4),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(df.count() === 0L)
  }

  test("MIPS norm-augmentation reduction preserves inner-product order (Bachrach 2014)") {
    // Append sqrt(M^2 - |x|^2) to each item and 0 to the query: the
    // augmented vectors all have norm M, so cosine against the augmented
    // corpus ranks exactly like the raw inner product — the reduction
    // that lets the ANN tiers (LSH/IVF/PQ) answer MIPS. Checked on the
    // real embeddings for every query sim_mips_topk uses.
    val vecs = em.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val maxSq = vecs.map(v => dot(v._2, v._2)).max
    val queries = vecs.filter(_._1 % 71 == 0)
    queries.foreach { case (qid, q) =>
      val others = vecs.filter(_._1 != qid)
      val byIp = others.sortBy { case (id, x) => (-dot(q, x), id) }
        .take(5).map(_._1).toSeq
      // augmented: item -> [x, sqrt(M^2-|x|^2)], query -> [q, 0]; all
      // augmented item norms equal M, so cosine order == dot order
      val byAug = others.sortBy { case (id, x) =>
        val aug = x :+ math.sqrt(math.max(0.0, maxSq - dot(x, x)))
        val cos = dot(q :+ 0.0, aug) /
          (math.sqrt(dot(q, q)) * math.sqrt(dot(aug, aug)))
        (-cos, id)
      }.take(5).map(_._1).toSeq
      assert(byIp == byAug, s"query $qid: $byIp != $byAug")
    }
  }
}

/** NearestCells (graft_nearest_cells): the single-literal IVF quantizer
  * loop must select exactly the p nearest centroids by (‖c‖²−2·v·c, cid)
  * — agreeing with an independently computed sort-based reference in both
  * codegen (DataFrame) and interpreted (direct eval) paths, honoring the
  * lowest-cid tie-break, and degrading cleanly when p ≥ k. */
class NearestCellsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def em = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
  }

  /** Independent reference: score every centroid, full sort by (s, cid),
    * take p — the semantics the bounded insertion loop must reproduce. */
  private def reference(emb: Seq[Float], cents: Seq[(Int, Seq[Double])],
      p: Int): Seq[Int] =
    cents.map { case (cid, c) =>
      val csq = c.foldLeft(0.0)((a, x) => a + x * x)
      val n = math.min(emb.length, c.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += emb(i).toDouble * c(i); i += 1 }
      (csq - 2.0 * dot, cid)
    }.sorted.take(p).map(_._2)

  private def centsOf(k: Int): Seq[(Int, Seq[Double])] =
    em.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect().toSeq
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)

  test("codegen path agrees with the sort-based reference for p=1..4") {
    val cents = centsOf(7)
    val lit7 = typedLit(cents.map { case (cid, c) =>
      (cid, c.foldLeft(0.0)((a, x) => a + x * x), c)
    })
    val cols = Seq(col("vec_id"), col("embedding")) ++
      (1 to 4).map(p => call_function("graft_nearest_cells",
        col("embedding"), lit7, lit(p)).as(s"p$p"))
    val rows = em.select(cols: _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      (1 to 4).foreach { p =>
        val got = r.getSeq[Int](1 + p)
        assert(got == reference(emb, cents, p),
          s"vec ${r.getLong(0)} p=$p")
      }
    }
  }

  test("p >= k returns all k cids in rank order; ties break to lowest cid") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    val emb = Literal.create(ArrayData.toArrayData(Array(1.0f, 0.0f)),
      ArrayType(FloatType))
    // two IDENTICAL centroids (cids 5 and 3) + one farther: the tie must
    // order 3 before 5, and p=5 > k=3 must return exactly 3 entries
    val centType = ArrayType(StructType(Seq(
      StructField("_1", IntegerType), StructField("_2", DoubleType),
      StructField("_3", ArrayType(DoubleType)))))
    def c(cid: Int, v: Seq[Double]) = InternalRow(cid,
      v.foldLeft(0.0)((a, x) => a + x * x), ArrayData.toArrayData(v.toArray))
    val cents = Literal.create(ArrayData.toArrayData(Array(
      c(5, Seq(1.0, 0.0)), c(3, Seq(1.0, 0.0)), c(9, Seq(-5.0, 4.0)))),
      centType)
    val out = graft.functions.NearestCells(emb, cents, Literal(5))
      .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    assert(out == Seq(3, 5, 9))
  }
}
