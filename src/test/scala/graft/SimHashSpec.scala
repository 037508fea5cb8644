package graft

import graft.functions.{GraftFunctions, SimHash64}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimHash64 expression semantics: interpreted == codegen, similarity
  * monotonicity (shared-token docs are closer than disjoint ones), and
  * determinism. */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sig(tokens: Seq[String]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
    SimHash64(Literal.create(arr, ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]
  }

  test("interpreted eval matches codegen through the query engine") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq("a b c d", "x y z", "a b c q").toDF("text")
    val fromEngine = docs
      .select(expr("graft_simhash64(split(text, ' '))").as("s"))
      .as[Long].collect().toSeq
    val direct = Seq("a b c d", "x y z", "a b c q")
      .map(t => sig(t.split(" ").toSeq))
    assert(fromEngine === direct)
  }

  test("similar token sets have smaller hamming distance than disjoint ones") {
    val base = sig(Seq("spark", "scala", "catalyst", "tungsten", "parquet"))
    val near = sig(Seq("spark", "scala", "catalyst", "tungsten", "arrow"))
    val far = sig(Seq("apple", "banana", "cherry", "date", "elderberry"))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(base, near) < hamming(base, far))
  }

  test("signature is order-insensitive and deterministic") {
    val a = sig(Seq("one", "two", "three"))
    val b = sig(Seq("three", "one", "two"))
    assert(a === b)
    assert(a === sig(Seq("one", "two", "three")))
  }

  test("FNV-1a token hash matches the public-domain reference values") {
    // Independently computed from the FNV spec (also re-derived by the
    // DuckDB oracle twin with HUGEINT arithmetic).
    assert(SimHash64.fnv1a64("hello".getBytes("UTF-8")) === 0xa430d84680aabd0bL)
    assert(SimHash64.fnv1a64("a".getBytes("UTF-8")) === 0xaf63dc4c8601ec8cL)
    assert(SimHash64.fnv1a64(Array.emptyByteArray) === 0xcbf29ce484222325L)
  }
}
