package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke + invariants over real testdata at sf0.001. */
class PipelinesSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns a schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = withClue(s"query $name: ")(fn(spark, sf))
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("pipelines preserve key uniqueness after dedup") {
    import org.apache.spark.sql.functions._
    val o = graft.pipelines.Pipelines.orders(spark, sf)
    assert(o.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
    val i = graft.pipelines.Pipelines.orderItems(spark, sf)
    assert(i.groupBy("l_orderkey", "l_linenumber").count().filter(col("count") > 1).isEmpty)
  }
}
