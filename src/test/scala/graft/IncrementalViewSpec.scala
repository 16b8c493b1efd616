package graft

import org.apache.spark.sql.functions._

import graft.table.{IncrementalView, LakeTable}

/** Delta-rule IVM invariant: maintaining the stored view from the CDC
  * feed must equal re-aggregating the base — through inserts, updates,
  * deletes, and group extinction (last member deleted → group row
  * removed, not left at zero). */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(t: LakeTable): Set[(Long, Long, java.math.BigDecimal)] =
    t.read.select(col("k"), col("n"), col("sum_value"))
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet

  test("maintained view == full recompute across insert/update/delete batches") {
    val root = "/tmp/graft_tables/ivm_spec"
    val base = LakeTable(spark, root, "ivm_base", Seq("id"))
    val view = LakeTable(spark, root, "ivm_view", Seq("k"))
    base.drop(); view.drop()
    // groups: k = id % 3; values = id as decimal-able double
    val t0 = (1L to 30L).map(i => (i, i % 3, i * 1.0)).toDF("id", "k", "v")
    base.create(t0)
    view.create(IncrementalView.sumView(base.read, Seq("k"), "v"))

    // batch: update ids % 4 == 0 (v doubled), insert 31..35, delete % 7 == 0
    val batch = (1L to 30L).filter(_ % 4 == 0).map(i => (i, i % 3, i * 2.0)) ++
      (31L to 35L).map(i => (i, i % 3, i * 1.0))
    base.upsert(batch.toDF("id", "k", "v"))
    base.delete(col("id") % 7 === 0)
    IncrementalView.maintainSumView(base, view, Seq("k"), "v",
      sinceVersion = base.availableVersions.min)

    val recomputed = LakeTable(spark, root, "ivm_recomp", Seq("k"))
    recomputed.drop()
    recomputed.create(IncrementalView.sumView(base.read, Seq("k"), "v"))
    assert(snapshot(view) == snapshot(recomputed))
    assert(snapshot(view).nonEmpty)
  }

  test("group extinction: deleting a group's last members removes its row") {
    val root = "/tmp/graft_tables/ivm_spec2"
    val base = LakeTable(spark, root, "ivm_base2", Seq("id"))
    val view = LakeTable(spark, root, "ivm_view2", Seq("k"))
    base.drop(); view.drop()
    base.create(Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 1.0))
      .toDF("id", "k", "v"))
    view.create(IncrementalView.sumView(base.read, Seq("k"), "v"))
    base.delete(col("k") === 10L)
    IncrementalView.maintainSumView(base, view, Seq("k"), "v",
      sinceVersion = base.availableVersions.min)
    val rows = snapshot(view)
    assert(rows.map(_._1) == Set(20L), s"group 10 must vanish, got $rows")
    assert(rows.head._2 == 1L)
  }
}
