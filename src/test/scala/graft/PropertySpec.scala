package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.CoreOps._
import graft.table.LakeTable

/** Property-based invariants (SURVEY.md §5.2): merge idempotency, dedup
  * cardinality, split partition. Small generated tables, full operator
  * stack. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // raw ScalaCheck sampling with fixed seeds (scalatestplus bridge is not
  // in the offline cache): deterministic, 10 cases per property
  private def cases[T](g: Gen[T], n: Int = 10): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default.withSize(20), Seed(i.toLong)))

  private def forAllCases[T](g: Gen[T])(f: T => Unit): Unit = cases(g).foreach(f)

  private val rowGen = for {
    id <- Gen.chooseNum(0L, 15L)
    ts <- Gen.option(Gen.chooseNum(0L, 5L))
    v <- Gen.alphaStr.map(_.take(4))
  } yield (id, ts, v)

  private val tableGen = Gen.listOf(rowGen)

  test("valid ∪ rejected == input (row-count preserving, any null pattern)") {
    forAllCases(tableGen) { rows =>
      val df = rows.toDF("id", "ts", "v")
      val (valid, rejected) = splitValid(Seq("ts"))(df)
      assert(valid.count() + rejected.count() == rows.size)
    }
  }

  test("latestWins yields exactly one row per present key") {
    forAllCases(tableGen) { rows =>
      val df = rows.toDF("id", "ts", "v")
      val out = latestWins(Seq("id"), "ts", tiebreakers = Seq($"v"))(df)
      val keys = rows.map(_._1).distinct.size
      assert(out.count() == keys)
      assert(out.select("id").distinct().count() == keys)
    }
  }

  test("upsert is idempotent for any target/source pair") {
    forAllCases(Gen.zip(tableGen, tableGen)) { case (t, s) =>
      if (t.nonEmpty || s.nonEmpty) {
        val root = Files.createTempDirectory("prop").toString
        val target = t.toDF("id", "ts", "v")
        // source deduped on merge key (the pipelines' guarantee)
        val source = latestWins(Seq("id"), "ts", tiebreakers = Seq($"v"))(
          s.toDF("id", "ts", "v"))
        val tbl = LakeTable(spark, root, "t", Seq("id"))
        tbl.create(target)
        tbl.upsert(source)
        val once = tbl.read.collect().map(_.toString).sorted.toSeq
        tbl.upsert(source)
        val twice = tbl.read.collect().map(_.toString).sorted.toSeq
        assert(once == twice)
        // all source keys present exactly once per id
        val srcIds = source.select("id").as[Long].collect().toSet
        val outPairs = tbl.read.select("id").as[Long].collect()
          .groupBy(identity).map { case (k, v) => k -> v.length }
        srcIds.foreach(k => assert(outPairs(k) >= 1))
      }
    }
  }
}
