package graft

import graft.sources.{MaterializedView => Mv, Snapshots}
import org.apache.spark.sql.functions._

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("mvspec")
    (root.resolve("base").toString, root.resolve("view").toString)
  }

  private def viewMap(view: String): Map[String, (Long, Long)] =
    Snapshots.read(spark, view).as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("incremental refresh equals a full recompute after several appends") {
    val (base, view) = dirs()
    Snapshots.commit(Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"), base)
    assert(Mv.fullRefresh(spark, base, view, "k", Seq("v")) == 1)
    Snapshots.commit(Seq(("a", 1L), ("c", 7L)).toDF("k", "v"), base)
    Snapshots.commit(Seq(("b", 2L), ("c", 3L)).toDF("k", "v"), base)
    assert(Mv.refresh(spark, base, view, "k", Seq("v")) == 3)
    assert(viewMap(view) == Map("a" -> (3L, 31L), "b" -> (2L, 7L), "c" -> (2L, 10L)))
    // and it matches a from-scratch rebuild bit for bit
    val (_, view2) = dirs()
    Mv.fullRefresh(spark, base, view2, "k", Seq("v"))
    assert(viewMap(view2) == viewMap(view))
  }

  test("a caught-up refresh is a no-op: no new view version, same reflected base") {
    val (base, view) = dirs()
    Snapshots.commit(Seq(("a", 1L)).toDF("k", "v"), base)
    Mv.fullRefresh(spark, base, view, "k", Seq("v"))
    val v1 = Snapshots.currentVersion(view)
    assert(Mv.refresh(spark, base, view, "k", Seq("v")) == 1)
    assert(Snapshots.currentVersion(view) == v1) // nothing committed
  }

  test("a crashed refresh re-runs as a no-op, never a double-fold (tag ledger)") {
    val (base, view) = dirs()
    Snapshots.commit(Seq(("a", 1L)).toDF("k", "v"), base)
    Mv.fullRefresh(spark, base, view, "k", Seq("v"))
    Snapshots.commit(Seq(("a", 10L)).toDF("k", "v"), base)
    Mv.refresh(spark, base, view, "k", Seq("v"))
    // the "crash after commit, before caller bookkeeping" replay:
    // calling refresh again must see reflected == HEAD and fold nothing
    Mv.refresh(spark, base, view, "k", Seq("v"))
    assert(viewMap(view) == Map("a" -> (2L, 11L)))
  }

  test("refresh rewrites only view files containing touched keys") {
    val (base, view) = dirs()
    // view lands as 3 files keyed apart; the delta touches one key
    Snapshots.commit(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v").repartition(3, $"k"), base)
    Mv.fullRefresh(spark, base, view, "k", Seq("v"))
    // rebuild the view into 3 single-key files for a measurable carry
    val split = Snapshots.read(spark, view).repartition(3, $"k")
    Snapshots.commit(split, view, "overwrite",
      tag = Some("mv.base=1")) // re-tag: same reflected base
    val before = Snapshots.liveFiles(view, Snapshots.currentVersion(view)).toSet
    Snapshots.commit(Seq(("a", 100L)).toDF("k", "v"), base)
    Mv.refresh(spark, base, view, "k", Seq("v"))
    val after = Snapshots.liveFiles(view, Snapshots.currentVersion(view)).toSet
    val carried = after.intersect(before)
    assert(carried.size >= 1 && carried.size < before.size,
      s"expected partial carry, got ${carried.size} of ${before.size}")
    assert(viewMap(view) == Map("a" -> (2L, 101L), "b" -> (1L, 2L), "c" -> (1L, 3L)))
  }

  test("refresh across a base rewrite fails loud; fullRefresh recovers") {
    val (base, view) = dirs()
    Snapshots.commit(Seq(("a", 1L)).toDF("k", "v"), base)
    Mv.fullRefresh(spark, base, view, "k", Seq("v"))
    Snapshots.commit(Seq(("z", 9L)).toDF("k", "v"), base, mode = "overwrite")
    val e = intercept[IllegalArgumentException] {
      Mv.refresh(spark, base, view, "k", Seq("v"))
    }
    assert(e.getMessage.contains("append-only"))
    Mv.fullRefresh(spark, base, view, "k", Seq("v"))
    assert(viewMap(view) == Map("z" -> (1L, 9L)))
  }

  test("refreshing a never-built view fails loud") {
    val (base, view) = dirs()
    Snapshots.commit(Seq(("a", 1L)).toDF("k", "v"), base)
    assert(intercept[IllegalArgumentException] {
      Mv.refresh(spark, base, view, "k", Seq("v"))
    }.getMessage.contains("never built"))
  }
}
