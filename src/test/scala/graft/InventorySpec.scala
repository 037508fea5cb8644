package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level spec over the whole operator inventory: every registered
  * query must run at sf0.001, produce a schema, and stay in sync with its
  * oracle registration. (Value-level correctness is the driver's DuckDB
  * gate, emulated locally by tools/check_oracle.py.) */
class InventorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every oracle entry has a matching query entry") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracleSql without queries: $orphan")
  }

  test("every query is oracle-checked (no rows-only entries)") {
    // The inventory's standing claim is 100% oracle coverage — a new
    // query landing without its DuckDB twin must fail here, not silently
    // downgrade to the driver's weaker rows-only check.
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without oracleSql: $unchecked")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001 with a non-empty schema") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // anti/except legitimately return 0 rows (every customer has orders
      // in some SFs), and the sf0.001 co-occurrence graph is too sparse to
      // close any triangle or leave any open wedge (2 edges — verified vs
      // DuckDB); everything else must produce data
      if (!Set("join_anti", "setop_except", "graph_triangle_count",
          "graph_link_prediction").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }
}
