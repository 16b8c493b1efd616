package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The native LangId expression must agree row-for-row with the composable
  * HOF formulation (whose semantics the DuckDB oracle pins). */
class LangIdParitySpec extends SparkSpec {
  import spark.implicits._

  test("native langId == HOF langId on the documents table") {
    val docs = Tables.load(spark, sf, "documents")
    val diff = docs.select(
      TextFunctions.langId(col("text")).as("native"),
      TextFunctions.langIdHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, diff.take(5).mkString(", "))
  }

  test("native langId edge cases") {
    val rows = Seq(
      "the cat and the dog in the house",     // en
      "der hund und die katze ist von hier",  // de
      "el perro y la casa de los gatos",      // es
      "xyzzy plugh qwerty",                   // und: no stopword hits
      "中文文本内容很多", // zh via CJK ratio
      ""                                      // empty → und
    ).toDF("text")
    val out = rows.select(TextFunctions.langId(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "de", "es", "und", "zh", "und"))
    // de/fr share no listed words here, but es/fr share "la"/"de"/"que":
    // equal scores must break lexicographically (es before fr)
    val tie = Seq("la de que").toDF("text")
      .select(TextFunctions.langId(col("text")).as("l")).as[String].head()
    assert(tie == "es")
  }
}
