package graft

/** Separate-JVM race writer for the conditional-PUT publisher spec:
  * each process arms the staged object-store publisher, spin-waits on
  * a barrier file so all JVMs fire into the same millisecond window,
  * then races to publish version 2 of the given table. Prints exactly
  * one line — WIN or LOSE — that the parent spec collects. Plain file
  * IO, no SparkSession, so JVM startup is the only latency. */
object RacePutMain {
  def main(args: Array[String]): Unit = {
    val tableDir = args(0)
    val barrier = java.nio.file.Paths.get(args(1))
    graft.sources.Snapshots.setCommitPublisher(
      graft.sources.ObjectStoreCommitPublisher.rooted(tableDir))
    while (!java.nio.file.Files.exists(barrier)) Thread.sleep(1)
    try {
      graft.sources.Snapshots.writeManifest(tableDir, 2, 1, "append",
        Seq(s"pid-${ProcessHandle.current.pid}.parquet"))
      println("WIN")
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => println("LOSE")
    }
  }
}
