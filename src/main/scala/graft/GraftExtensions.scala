package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BottomK, CharClassCounts, CountMin, DotProduct,
  FreqItems, JaroWinkler, LangId, MemberCount, MinHashSig, PhraseMatch,
  Registry, SimHash64, WinnowHashes, WordNgrams, WordShingles, WordTokens}
import graft.plans.{MvRewrite, RewriteIntersectSize}

/** Deployment packaging: `--conf spark.sql.extensions=graft.GraftExtensions`
  * gives any session the graft native functions and optimizer rules
  * without code changes (the same registrations `Registry.register` and
  * `GraftOptimizations.install` apply programmatically). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteIntersectSize)
    e.injectOptimizerRule(_ => MvRewrite)
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => MinHashSig(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => SimHash64(exprs(0))))
    e.injectFunction((FunctionIdentifier("word_tokens"),
      new ExpressionInfo(classOf[WordTokens].getName, "word_tokens"),
      exprs => WordTokens(exprs(0))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      exprs => WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("winnow_hashes"),
      new ExpressionInfo(classOf[WinnowHashes].getName, "winnow_hashes"),
      exprs => WinnowHashes(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      exprs => LangId(exprs(0))))
    e.injectFunction((FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      exprs => WordNgrams(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("char_class_counts"),
      new ExpressionInfo(classOf[CharClassCounts].getName, "char_class_counts"),
      exprs => CharClassCounts(exprs(0))))
    e.injectFunction((FunctionIdentifier("member_count"),
      new ExpressionInfo(classOf[MemberCount].getName, "member_count"),
      exprs => MemberCount(exprs(0), Registry.evalStringArray(exprs(1)))))
    e.injectFunction((FunctionIdentifier("phrase_match"),
      new ExpressionInfo(classOf[PhraseMatch].getName, "phrase_match"),
      exprs => PhraseMatch(exprs(0), Registry.evalStringArray(exprs(1)))))
    e.injectFunction((FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FreqItems].getName, "freq_items"),
      exprs => FreqItems(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      exprs => JaroWinkler(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMin].getName, "count_min"),
      exprs => CountMin(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[BottomK].getName, "bottom_k"),
      exprs => BottomK(exprs(0), exprs(1).eval().asInstanceOf[Int])))
  }
}
