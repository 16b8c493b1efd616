package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql` users get them alongside the built-ins (the reference's
  * "tables queryable by plain SQL" capability extended to functions). */
object Registry {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("word_tokens",
      exprs => WordTokens(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("winnow_hashes",
      exprs => WinnowHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("lang_id",
      exprs => LangId(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("word_ngrams",
      exprs => WordNgrams(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("char_class_counts",
      exprs => CharClassCounts(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("member_count",
      exprs => MemberCount(exprs(0), evalStringArray(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("phrase_match",
      exprs => PhraseMatch(exprs(0), evalStringArray(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("multi_pattern_match",
      exprs => MultiPatternMatch(exprs(0), evalStringArray(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("deletion_neighborhood",
      exprs => DeletionNeighborhood(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("gram_hashes",
      exprs => GramRollingHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    // merges as a literal array of 2-element arrays: array(array('a','b'), ...)
    reg.createOrReplaceTempFunction("bpe_encode",
      exprs => BpeEncode(exprs(0), evalStringArrayArray(exprs(1)).map {
        case Seq(a, b) => (a, b)
        case other => throw new IllegalArgumentException(
          s"bpe_encode merges must be 2-element arrays, got $other")
      }), "built-in")
    // aggregates: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression during resolution, same as the built-ins
    reg.createOrReplaceTempFunction("freq_items",
      exprs => FreqItems(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("count_min",
      exprs => CountMin(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("bottom_k",
      exprs => BottomK(exprs(0), exprs(1).eval().asInstanceOf[Int]),
      "built-in")
  }

  /** Fold a literal array-of-strings argument (e.g. `array('a','b')`). */
  private[graft] def evalStringArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] =
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq

  /** Fold a literal array-of-string-arrays (e.g. `array(array('a','b'))`). */
  private[graft] def evalStringArrayArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Seq[String]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    e.eval().asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(StringType))
      .map(_.asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq)
      .toSeq
  }
}
