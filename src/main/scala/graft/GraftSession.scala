package graft

import org.apache.spark.sql.SparkSession

/** Local SparkSession factory used by tests and ad-hoc runs.
  *
  * The driver harness (Verify/Bench) builds its own session; this one
  * mirrors its settings but defaults to local[32] (the container has
  * 32 cores). Shuffle partitions track core count — at cluster scale
  * you'd size them to data volume instead (AQE coalescing handles the
  * small-SF case here).
  */
object GraftSession {
  def create(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
