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
      .filterNot(l => l.isEmpty ||
        Seq("version", "parent", "op", "tag", "ts", "schema").exists(k => l.startsWith(k + "=")))
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

  test("replaceWhere swaps one scope atomically; untouched files carry; out-of-scope inserts raise") {
    val t = threeFileTable()
    val before = manifestFileLines(t, 3)
    // reload the 10-19 scope with recomputed rows
    val v = Snapshots.replaceWhere(spark, t, $"id" >= 10L && $"id" < 20L,
      Seq((10L, "C2"), (12L, "NEW")).toDF("id", "s"))
    assert(v == 4)
    val rows = Snapshots.read(spark, t).as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "b", 10L -> "C2", 12L -> "NEW",
      20L -> "e", 21L -> "f")) // 11 gone (replaced scope), others untouched
    assert(manifestFileLines(t, 4).toSet.intersect(before.toSet).size == 2)
    // an insert OUTSIDE the scope fails the write; the table is untouched
    val e = intercept[Exception] {
      Snapshots.replaceWhere(spark, t, $"id" >= 10L && $"id" < 20L,
        Seq((99L, "ESCAPEE")).toDF("id", "s"))
    }
    assert(e.getMessage.contains("outside the replaced scope") ||
      Option(e.getCause).exists(_.getMessage.contains("outside the replaced scope")))
    assert(Snapshots.currentVersion(t) == 4)
  }

  test("metadata-only COUNT and MIN/MAX fold exactly from manifest stats") {
    val t = threeFileTable()
    assert(Snapshots.countRows(t) == 6L)
    assert(Snapshots.minMaxFromStats(t, "id") == ((1L, 21L)))
    // still exact after a copy-on-write delete re-stats nothing: the
    // rewritten file has no stats -> loud, never a silent wrong answer
    Snapshots.deleteWhere(spark, t, $"id" === 10L)
    val e = intercept[IllegalArgumentException](Snapshots.countRows(t))
    assert(e.getMessage.contains("without stats"))
    // a stats-less commit also refuses metadata answers
    val t2 = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t2)
    assert(intercept[IllegalArgumentException](Snapshots.countRows(t2))
      .getMessage.contains("without stats"))
  }

  test("mergeIntoKeys matches on ALL key columns (composite keys)") {
    val t = freshTable()
    Snapshots.commit(Seq((1L, "x", "a"), (1L, "y", "b"), (2L, "x", "c"))
      .toDF("k1", "k2", "s"), t)
    val src = Seq((1L, "x", "UPD"), (3L, "z", "NEW")).toDF("k1", "k2", "s")
    Snapshots.mergeIntoKeys(spark, t, src, Seq("k1", "k2"))
    val rows = Snapshots.read(spark, t).as[(Long, String, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (1,x) replaced; (1,y) and (2,x) untouched despite sharing a key part
    assert(rows == Map((1L, "x") -> "UPD", (1L, "y") -> "b",
      (2L, "x") -> "c", (3L, "z") -> "NEW"))
    // duplicate composite keys in the source fail loud
    val dup = Seq((1L, "x", "p"), (1L, "x", "q")).toDF("k1", "k2", "s")
    assert(intercept[IllegalArgumentException] {
      Snapshots.mergeIntoKeys(spark, t, dup, Seq("k1", "k2"))
    }.getMessage.contains("duplicate"))
  }

  test("commitChecked: schema enforcement rejects a drifted append before writing") {
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    val drifted = Seq((2L, "b", 9)).toDF("id", "s", "extra")
    val e = intercept[IllegalArgumentException] {
      Snapshots.commitChecked(drifted, t)
    }
    assert(e.getMessage.contains("schema enforcement"))
    assert(Snapshots.currentVersion(t) == 1) // nothing committed
    // a type change is also drift, not just a column-set change
    val retyped = Seq(("2", "b")).toDF("id", "s")
    assert(intercept[IllegalArgumentException] {
      Snapshots.commitChecked(retyped, t)
    }.getMessage.contains("schema enforcement"))
  }

  test("commitChecked: a CHECK violation fails the write; the table is untouched") {
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    val checks = Seq[(String, org.apache.spark.sql.Column)](
      "id_positive" -> ($"id" > 0L),
      "s_nonempty" -> (length($"s") > 0))
    // passing batch commits normally
    assert(Snapshots.commitChecked(Seq((2L, "b")).toDF("id", "s"), t, checks = checks) == 2)
    // violating batch: write job fails, no new version, rows unchanged
    val e = intercept[Exception] {
      Snapshots.commitChecked(Seq((3L, "c"), (-7L, "d")).toDF("id", "s"), t, checks = checks)
    }
    assert(e.getMessage.contains("id_positive") ||
      Option(e.getCause).exists(_.getMessage.contains("id_positive")), e.getMessage)
    assert(Snapshots.currentVersion(t) == 2)
    assert(ids(Snapshots.read(spark, t)) == Seq(1L, 2L))
  }

  test("commitChecked: a NULL check result is a violation, not a pass") {
    val t = freshTable()
    Snapshots.commit(Seq((1L, Option("a"))).toDF("id", "s"), t)
    val e = intercept[Exception] {
      Snapshots.commitChecked(
        Seq((2L, Option.empty[String])).toDF("id", "s"), t,
        checks = Seq[(String, org.apache.spark.sql.Column)]("s_short" -> (length($"s") < 10)))
    }
    assert(e.getMessage.contains("s_short") ||
      Option(e.getCause).exists(_.getMessage.contains("s_short")), e.getMessage)
    assert(Snapshots.currentVersion(t) == 1)
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
