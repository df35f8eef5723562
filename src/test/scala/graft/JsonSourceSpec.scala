package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S4 (multiLine JSON dim seed) + S9 (truncate-and-reload) — the
  * reference's master-location init path
  * (run-once/init_master_location.py:20-32): load a nested JSON seed
  * file, flatten, truncate-reload the dimension table. */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  test("nested multiLine JSON seed → flatten → truncate-reload dim") {
    val dir = Files.createTempDirectory("graft-json")
    val seed =
      """[
        |  {"id": 3088089, "central_city": "Bandung",
        |   "coords": {"lat": -6.92, "lon": 107.61},
        |   "source": {"api": "weatherapi", "url": "https://example.invalid/b"}},
        |  {"id": 3088090, "central_city": "Bogor",
        |   "coords": {"lat": -6.59, "lon": 106.79},
        |   "source": {"api": "weatherapi", "url": "https://example.invalid/g"}}
        |]""".stripMargin
    Files.writeString(dir.resolve("seed.json"), seed)

    val raw = spark.read.option("multiLine", true).json(dir.resolve("seed.json").toString)
    // nested-path projection (O1 on nested structs)
    val dim = raw.select(
      col("id").as("location_id"),
      col("central_city").as("location_name"),
      col("coords.lat").as("lat"),
      col("coords.lon").as("lon"),
      col("source.api").as("source_api"))
    val out = dir.resolve("dim").toString
    Sinks.truncateReload(dim, out)
    // reload over it (truncate semantics): second write fully replaces
    Sinks.truncateReload(dim.where($"location_id" === 3088089), out)
    val back = spark.read.parquet(out)
    assert(back.count() == 1)
    val r = back.head()
    assert(r.getAs[String]("location_name") == "Bandung")
    assert(math.abs(r.getAs[Double]("lat") - (-6.92)) < 1e-9)
  }
}
