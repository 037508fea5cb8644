package graft

import graft.functions.{GraftFunctions, PolyHash64}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native rolling-hash expression must agree bit-for-bit with the
  * declarative higher-order-function fold it replaced, in both codegen
  * and interpreted evaluation. */
class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("graft_poly_hash equals the declarative sequence/transform/aggregate fold") {
    GraftFunctions.register(spark)
    val mismatch = Tables.documents(spark, dir)
      .select(
        expr("graft_poly_hash(text)").as("native"),
        expr(
          """aggregate(
            |  transform(sequence(1, length(text)), i -> cast(ascii(substr(text, i, 1)) as bigint)),
            |  cast(7 as bigint),
            |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatch === 0L)
  }

  test("interpreted eval matches the definition on a known string") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val v = PolyHash64(Literal("abc")).eval(null).asInstanceOf[Long]
    val expected = "abc".getBytes.foldLeft(7L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(v === expected)
    // empty string folds to the seed
    assert(PolyHash64(Literal("")).eval(null) === 7L)
  }
}
