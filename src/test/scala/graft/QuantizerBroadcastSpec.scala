package graft.ops

import graft.TestSpark
import graft.functions.{GraftFunctions, NearestCells, NearestCellsBcast}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast-backed quantizer (NearestCellsBcast) must be a drop-in
  * replacement for the literal-backed graft_nearest_cells: bit-identical
  * cell rankings in both codegen (DataFrame) and interpreted (direct
  * eval) paths, and — the property that justifies its existence — a
  * serialized expression size that is O(1) in nlist, where the typedLit
  * form grows linearly (it is what rode in every task binary at √N
  * nlist, the last named scale-killer). */
class QuantizerBroadcastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def em = {
    GraftFunctions.register(spark)
    graft.Tables.embeddings(spark, dir)
  }

  private def centsOf(k: Int): Seq[(Int, Seq[Double])] =
    em.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect().toSeq
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)

  test("codegen path agrees with the literal-backed expression for p=1..4") {
    val cents = centsOf(7)
    val bc = Similarity.broadcastQuantizer(em, cents)
    val litQ = Similarity.centroidsLit(cents)
    val cols = Seq(col("vec_id")) ++
      (1 to 4).flatMap(p => Seq(
        call_function("graft_nearest_cells",
          col("embedding"), litQ, lit(p)).as(s"lit$p"),
        Similarity.nearestCellsCol(bc, col("embedding"), p).as(s"bc$p")))
    val rows = em.select(cols: _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 4).foreach { p =>
        val litRes = r.getSeq[Int](2 * p - 1)
        val bcRes = r.getSeq[Int](2 * p)
        assert(litRes == bcRes, s"vec ${r.getLong(0)} p=$p")
      }
    }
  }

  test("interpreted eval agrees with NearestCells.eval and honors tie-breaks") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val emb = Literal.create(ArrayData.toArrayData(Array(1.0f, 0.0f)),
      ArrayType(FloatType))
    // identical centroids (cids 5, 3) + one farther: tie must order 3
    // before 5 in BOTH forms, and p=5 > k=3 returns exactly 3 entries
    val cents = Seq(5 -> Seq(1.0, 0.0), 3 -> Seq(1.0, 0.0), 9 -> Seq(-5.0, 4.0))
    val centType = ArrayType(StructType(Seq(
      StructField("_1", IntegerType), StructField("_2", DoubleType),
      StructField("_3", ArrayType(DoubleType)))))
    def rowOf(cid: Int, v: Seq[Double]) = InternalRow(cid,
      v.foldLeft(0.0)((a, x) => a + x * x), ArrayData.toArrayData(v.toArray))
    val centLit = Literal.create(ArrayData.toArrayData(
      cents.map { case (c, v) => rowOf(c, v) }.toArray), centType)
    val bc = spark.sparkContext.broadcast(Similarity.quantizerOf(cents))
    (1 to 5).foreach { p =>
      val viaLit = NearestCells(emb, centLit, Literal(p))
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      val viaBc = NearestCellsBcast(emb, bc, p)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(viaLit == viaBc, s"p=$p")
    }
    assert(NearestCellsBcast(emb, bc, 5)
      .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq == Seq(3, 5, 9))
  }

  private def serSize(a: AnyRef): Int = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(a)
    oos.close()
    bos.size
  }

  test("serialized expression size is O(1) in nlist; the literal form is not") {
    import org.apache.spark.sql.graft.DatasetShim
    // synthetic quantizers — size behavior needs no real data
    def cents(k: Int): Seq[(Int, Seq[Double])] =
      (0 until k).map(i => i -> Seq.tabulate(64)(d => (i * 64 + d) * 0.5))
    def litExpr(k: Int) = DatasetShim.expression(
      call_function("graft_nearest_cells",
        col("embedding"), Similarity.centroidsLit(cents(k)), lit(1)))
    def bcExpr(k: Int) = NearestCellsBcast(
      DatasetShim.expression(col("embedding")),
      spark.sparkContext.broadcast(Similarity.quantizerOf(cents(k))), 1)
    val lit8 = serSize(litExpr(8))
    val lit512 = serSize(litExpr(512))
    val bc8 = serSize(bcExpr(8))
    val bc512 = serSize(bcExpr(512))
    // literal payload grows ~linearly in k (64 doubles per centroid)
    assert(lit512 > lit8 + 512 * 64 * 4,
      s"literal did not grow with nlist: k=8 → $lit8 B, k=512 → $lit512 B")
    // broadcast handle is O(1): a 64× nlist costs (at most) a few hundred
    // bytes of handle bookkeeping, never the k×dim payload
    assert(math.abs(bc512 - bc8) < 1024,
      s"broadcast form grew with nlist: k=8 → $bc8 B, k=512 → $bc512 B")
    assert(bc512 < lit512 / 100,
      s"broadcast form ($bc512 B) not ≪ literal form ($lit512 B) at k=512")
  }

  test("IVF assignment and SemDeDup plans carry the broadcast form, not the literal") {
    val cents = centsOf(7)
    val assigned = Similarity.assignCells(em, cents)
    val exprs = assigned.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect {
        case e: NearestCellsBcast => e
        case e: NearestCells => e
      })
    assert(exprs.exists(_.isInstanceOf[NearestCellsBcast]),
      "assignCells plan lost the broadcast-backed quantizer")
    assert(!exprs.exists(_.isInstanceOf[NearestCells]),
      "assignCells plan still carries the literal-backed quantizer")
  }
}
