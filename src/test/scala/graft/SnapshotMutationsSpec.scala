package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Copy-on-write DELETE / MERGE and the retrying append over
  * versioned-snapshot tables: row semantics (NULL-predicate
  * survivors, upsert replace-or-insert), the rewrite-only-affected-
  * files guarantee (measured against manifest lines, not asserted),
  * serializable-conflict aborts, and the append rebase that
  * re-carries a concurrent winner without rewriting staged bytes. */
class SnapshotMutationsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("snapmut").resolve("t").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"id").as[Long].collect().sorted.toSeq

  private def manifestFileLines(t: String, v: Int): Seq[String] =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(t, "_snapshots", f"v$v%08d.txt")).toArray.map(_.toString)
      .filterNot(l => l.isEmpty || Seq("version", "parent", "op", "tag", "ts").exists(k => l.startsWith(k + "=")))
      .toSeq

  // three single-file commits with disjoint id ranges + stats, so
  // affected-file sets are measurable and zone maps are live
  private def threeFileTable(): String = {
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t,
      statsCols = Seq("id"))
    Snapshots.commit(Seq((10L, "c"), (11L, "d")).toDF("id", "s").coalesce(1), t,
      statsCols = Seq("id"))
    Snapshots.commit(Seq((20L, "e"), (21L, "f")).toDF("id", "s").coalesce(1), t,
      statsCols = Seq("id"))
    t
  }

  test("deleteWhere removes TRUE rows only; history stays time-travelable") {
    val t = threeFileTable()
    val v = Snapshots.deleteWhere(spark, t, $"id" === 10L)
    assert(v == 4)
    assert(ids(Snapshots.read(spark, t)) == Seq(1L, 2L, 11L, 20L, 21L))
    assert(ids(Snapshots.read(spark, t, version = 3)) == Seq(1L, 2L, 10L, 11L, 20L, 21L))
  }

  test("deleteWhere rewrites ONLY files containing a match; kept lines carry stats verbatim") {
    val t = threeFileTable()
    val before = manifestFileLines(t, 3)
    Snapshots.deleteWhere(spark, t, $"id" === 10L)
    val after = manifestFileLines(t, 4)
    // the two untouched files' lines (path + id=min:max stats) are
    // carried byte-identically; exactly one new file replaces the hit one
    val carried = after.toSet.intersect(before.toSet)
    assert(carried.size == 2)
    assert(carried.forall(_.contains("id=")))
    assert((after.toSet -- before.toSet).size == 1)
  }

  test("NULL-predicate rows survive a delete (SQL DELETE semantics)") {
    val t = freshTable()
    Snapshots.commit(
      Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("y"))).toDF("id", "s"), t)
    Snapshots.deleteWhere(spark, t, $"s" === "x")
    assert(ids(Snapshots.read(spark, t)) == Seq(2L, 3L))
  }

  test("deleteWhere with no matching rows commits nothing") {
    val t = threeFileTable()
    assert(Snapshots.deleteWhere(spark, t, $"id" === 999L) == -1)
    assert(Snapshots.currentVersion(t) == 3)
  }

  test("mergeInto replaces matched keys, inserts new ones, carries untouched files") {
    val t = threeFileTable()
    val before = manifestFileLines(t, 3)
    val src = Seq((10L, "UPDATED"), (99L, "NEW")).toDF("id", "s")
    val v = Snapshots.mergeInto(spark, t, src, "id")
    assert(v == 4)
    val rows = Snapshots.read(spark, t).as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b", 10L -> "UPDATED", 11L -> "d",
      20L -> "e", 21L -> "f", 99L -> "NEW"))
    // only the file containing id=10 was rewritten; 99 landed in new files
    val carried = manifestFileLines(t, 4).toSet.intersect(before.toSet)
    assert(carried.size == 2)
  }

  test("mergeInto with no matched keys is a pure insert that carries every file") {
    val t = threeFileTable()
    val before = manifestFileLines(t, 3)
    Snapshots.mergeInto(spark, t, Seq((99L, "NEW")).toDF("id", "s"), "id")
    assert(manifestFileLines(t, 4).toSet.intersect(before.toSet).size == 3)
    assert(ids(Snapshots.read(spark, t)) == Seq(1L, 2L, 10L, 11L, 20L, 21L, 99L))
  }

  test("mergeInto fails loud on duplicate source keys and on schema mismatch") {
    val t = threeFileTable()
    val dup = Seq((10L, "x"), (10L, "y")).toDF("id", "s")
    val eDup = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, t, dup, "id")
    }
    assert(eDup.getMessage.contains("duplicate"))
    val wrong = Seq((10L, "x", 1)).toDF("id", "s", "extra")
    val eSchema = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, t, wrong, "id")
    }
    assert(eSchema.getMessage.contains("schema mismatch"))
    assert(Snapshots.currentVersion(t) == 3) // nothing committed
  }

  test("a mutation publishing after a concurrent commit aborts loudly (stale rewrite set)") {
    val t = threeFileTable()
    // a real interloper append lands INSIDE deleteWhere's window —
    // after its plan is staged, before its manifest link
    val e = intercept[java.util.ConcurrentModificationException] {
      Snapshots.deleteWhereHook(spark, t, $"id" === 1L, () => {
        Snapshots.commit(Seq((30L, "g")).toDF("id", "s"), t)
      })
    }
    assert(e.getMessage.contains("stale"))
    // the interloper's commit survives untouched; no half-delete landed
    assert(Snapshots.currentVersion(t) == 4)
    assert(ids(Snapshots.read(spark, t)) == Seq(1L, 2L, 10L, 11L, 20L, 21L, 30L))
  }

  test("commitWithRetry rebases onto an interloper's HEAD without losing either write") {
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    val v = Snapshots.commitWithRetryHook(
      Seq((2L, "b")).toDF("id", "s"), t, maxRetries = 5, tag = None, statsCols = Nil,
      beforePublish = { n =>
        // a real interloper lands inside attempt 0's race window
        // (post-read, pre-link): we lose v2, rebase, win v3
        if (n == 0) Snapshots.commit(Seq((9L, "z")).toDF("id", "s"), t)
      })
    assert(v == 3)
    assert(ids(Snapshots.read(spark, t)) == Seq(1L, 2L, 9L))
  }

  test("commitWithRetry fails loud after exhausting retries, naming the staged dir") {
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    val e = intercept[IllegalArgumentException] {
      Snapshots.commitWithRetryHook(
        Seq((2L, "b")).toDF("id", "s"), t, maxRetries = 2, tag = None, statsCols = Nil,
        // every attempt loses: an interloper beats us to each slot
        beforePublish = { _ =>
          val head = Snapshots.currentVersion(t)
          Snapshots.writeManifest(t, head + 1, head, "append",
            manifestFileLines(t, head))
        })
    }
    assert(e.getMessage.contains("version race"))
  }
}
