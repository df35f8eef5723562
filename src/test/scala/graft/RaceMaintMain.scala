package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Separate-JVM maintenance racer (the RacePutMain pattern, r10
  * verdict item #6): one process loops real appends through the
  * manifest protocol (staged parquet bytes copied from a template,
  * then the no-clobber link), another loops `vacuum(keepLast = 1)`.
  * Plain file IO only — no SparkSession, so JVM startup is the whole
  * latency and the loops genuinely interleave at millisecond grain.
  * A mutual barrier (each side drops a ready-file and spins for the
  * other's) guarantees overlap regardless of startup skew. The parent
  * spec asserts the invariant afterwards: HEAD carries exactly one
  * row per committed version — a staged file eaten by the old
  * negative-list vacuum surfaces as a short count or a missing-file
  * read error. */
object RaceMaintMain {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val tableDir = args(1)
    val tmpl = Paths.get(args(2))
    val mine = Paths.get(tableDir, s".ready-$mode")
    val other = Paths.get(tableDir,
      if (mode == "commit") ".ready-vacuum" else ".ready-commit")
    Files.createFile(mine)
    val deadline = System.nanoTime + 30L * 1000000000L
    while (!Files.exists(other)) {
      if (System.nanoTime > deadline) { System.err.println("barrier timeout"); sys.exit(2) }
      Thread.sleep(1)
    }
    mode match {
      case "commit" =>
        val pid = ProcessHandle.current.pid
        (1 to 15).foreach { i =>
          val h = graft.sources.Snapshots.currentVersion(tableDir)
          val dir = Paths.get(tableDir, "data", s"c${h + 1}-jvm$pid-$i")
          Files.createDirectories(dir)
          val staged = dir.resolve(s"part-race-$i.parquet")
          Files.copy(tmpl, staged, StandardCopyOption.REPLACE_EXISTING)
          // the exact commit() sequence: bytes first, link second —
          // the window the vacuum loop is trying to hit. OVERWRITE
          // commits so history expires every iteration and the vacuum
          // loop is genuinely deleting files throughout the race
          // (appends carry files forward — nothing would ever expire)
          Thread.sleep(3)
          graft.sources.Snapshots.writeManifest(tableDir, h + 1, h, "overwrite",
            Seq(staged.toString))
          // the loss detector, checked at EVERY interleaving: a
          // published manifest must never point at eaten bytes
          if (!Files.exists(staged)) {
            System.err.println(s"v${h + 1}: staged file eaten before/after link")
            sys.exit(3)
          }
        }
        println("COMMITTER DONE")
      case "vacuum" =>
        (1 to 120).foreach { _ =>
          graft.sources.Snapshots.vacuum(tableDir, keepLast = 1)
          Thread.sleep(1)
        }
        println("VACUUMER DONE")
      case m =>
        System.err.println(s"unknown mode $m"); sys.exit(2)
    }
  }
}
