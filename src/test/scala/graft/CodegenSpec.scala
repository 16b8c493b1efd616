package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.HashExpressions

/** The native expressions claim real doGenCode (RefEvalCodegen) — prove
  * the generated code compiles by forbidding the silent interpreted
  * fallback Spark normally uses when codegen fails. */
class CodegenSpec extends SparkSpec {

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  test("native expressions evaluate with codegen fallback disabled") {
    withConf("spark.sql.codegen.fallback", "false") {
      withConf("spark.sql.codegen.factoryMode", "CODEGEN_ONLY") {
        val docs = Tables.load(spark, sf, "documents").limit(50)
        val out = docs.select(
          tokenCount(col("text")).as("n_tok"),
          langId(col("text")).as("lang"),
          size(shingles(col("text"), 3)).as("n_sh"),
          size(winnowingFingerprints(col("text"))).as("n_fp"),
          HashExpressions.simhash64(tokens(col("text"))).as("sim"),
          size(HashExpressions.minhashSig(shingles(col("text"), 3), 16)).as("n_sig"))
          .agg(sum("n_tok"), count(lit(1))).collect()
        assert(out.head.getLong(1) == 50L)
        // the binary rewrite target too
        graft.plans.GraftOptimizations.install(spark)
        import spark.implicits._
        val n = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("a", "b").repartition(2)
          .select(size(array_intersect(col("a"), col("b"))).as("n"))
          .as[Int].collect()
        assert(n.toSeq == Seq(1))
        // round-4 expressions: AC scan, deletion neighborhood, BPE encode.
        // Aggregate over the COMPUTED columns — a count-only agg would let
        // ColumnPruning drop the projections and never exercise codegen
        val r4 = docs.select(
          size(graft.functions.TextExpressions.multiPatternMatch(
            col("text"), Seq("merge batch", "fast table"))).as("n_pat"),
          size(graft.functions.TextExpressions.deletionNeighborhood(
            substring(col("text"), 1, 8), 1)).as("n_del"),
          size(graft.functions.Bpe.bpeEncode(
            col("text"), Seq(("t", "h"), ("th", "e")))).as("n_bpe"))
          .agg(sum("n_pat"), sum("n_del"), sum("n_bpe")).collect()
        // <= 9 variants per 8-char prefix (dupes collapse), always >= 2
        assert(r4.head.getLong(1) >= 100L && r4.head.getLong(1) <= 450L)
        assert(r4.head.getLong(2) > 0)
      }
    }
  }
}
