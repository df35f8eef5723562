package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types._

import graft.sources.v2.{PagedJsonScanBuilder, PagedLanding}

/** The DataSource V2 paged-landing connector: planning-time page
  * pruning against manifest key envelopes, column pruning down to
  * the parse loop, and end-to-end equality with a plain JSON read. */
class PagedSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("cat", StringType),
    StructField("v", DoubleType), StructField("flag", BooleanType)))

  /** 4 key-ranged pages: [0,9], [10,19], [20,29], [30,39], 3 rows each. */
  private lazy val landing: String = {
    import spark.implicits._
    val dest = new Path(Files.createTempDirectory("graft-paged-spec").toString)
    val rows = (0 until 4).flatMap { p =>
      Seq(0, 4, 9).map(o => (p * 10L + o, s"c${p % 2}", p * 10.0 + o / 2.0, o == 4, p.toLong))
    }
    val df = rows.toDF("k", "cat", "v", "flag", "page")
    PagedLanding.writePages(df, dest.getFileSystem(new Configuration()), dest,
      keyCol = "k", nPages = 4)
    dest.toString
  }

  private def read() = spark.read.format("graft-pages").schema(schema)
    .option("manifest", landing).option("keyCol", "k").load()

  private def builder() = new PagedJsonScanBuilder(schema, landing, Some("k"))

  /** Full message chain — executor failures surface wrapped. */
  private def chain(e: Throwable): String = {
    val sw = new java.io.StringWriter(); e.printStackTrace(new java.io.PrintWriter(sw)); sw.toString
  }

  test("full read equals the landed rows") {
    val got = read().orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    val want = (0 until 4).flatMap { p =>
      Seq(0, 4, 9).map(o => (p * 10L + o, s"c${p % 2}", p * 10.0 + o / 2.0, o == 4))
    }
    assert(got.toSeq == want)
  }

  test("page pruning: range, equality, and IN filters open only intersecting pages") {
    def pages(fs: org.apache.spark.sql.sources.Filter*) = {
      val b = builder()
      b.pushFilters(fs.toArray)
      b.build().toBatch.planInputPartitions().length
    }
    assert(pages() == 4)
    assert(pages(GreaterThan("k", 25L)) == 2)   // [20,29] and [30,39]
    assert(pages(EqualTo("k", 15L)) == 1)
    assert(pages(EqualTo("k", 100L)) == 0)      // outside every envelope
    assert(pages(In("k", Array(5L, 35L))) == 2)
    assert(pages(IsNotNull("k")) == 4)          // accepted, prunes nothing
    assert(pages(StringStartsWith("cat", "c")) == 4) // non-key filter: no page info
    // non-key filters never prune pages, but every filter stays in the
    // residual for row-level re-evaluation
    val b = builder()
    val residual = b.pushFilters(Array(GreaterThan("k", 25L), StringStartsWith("cat", "c")))
    assert(residual.length == 2)
    assert(b.pushedFilters().toSeq == Seq(GreaterThan("k", 25L)))
  }

  test("row-level filtering on top of page pruning is exact") {
    // k > 25 prunes to 2 pages, then Spark's residual filter trims rows
    val got = read().where(col("k") > 25).orderBy("k").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(29L, 30L, 34L, 39L))
  }

  test("column pruning reaches the scan; empty schema counts lines without parsing") {
    val b = builder()
    b.pruneColumns(StructType(Seq(StructField("cat", StringType))))
    assert(b.build().readSchema().fieldNames.toSeq == Seq("cat"))
    assert(read().select("cat").distinct().collect().map(_.getString(0)).sorted.toSeq == Seq("c0", "c1"))
    assert(read().count() == 12) // count(*) → empty required schema path
  }

  test("explain shows the scan with its pushed page filters") {
    val plan = read().where(col("k") > 25).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PagedJsonScan"), plan)
    assert(plan.contains("GreaterThan(k,25)"), plan)
  }

  test("malformed page line fails loud with path and line number") {
    val dir = Files.createTempDirectory("graft-paged-bad")
    val page = dir.resolve("p0.json")
    Files.write(page, "{\"k\": 1, \"cat\": \"a\"}\nnot json at all\n".getBytes)
    Files.write(dir.resolve("manifest.json"),
      s"""{"path": "${page.toString}", "rows": 2, "key_min": 1, "key_max": 1}\n""".getBytes)
    val e = intercept[Exception] {
      spark.read.format("graft-pages").schema(schema)
        .option("manifest", dir.toString).load().collect()
    }
    val msg = chain(e)
    assert(msg.contains("malformed JSON") && msg.contains("line 2"), msg)
  }

  test("type drift in an engine-written page fails loud, missing fields are null") {
    val dir = Files.createTempDirectory("graft-paged-drift")
    val page = dir.resolve("p0.json")
    Files.write(page, "{\"k\": 1}\n{\"k\": \"oops\"}\n".getBytes)
    Files.write(dir.resolve("manifest.json"),
      s"""{"path": "${page.toString}", "rows": 2, "key_min": 1, "key_max": 1}\n""".getBytes)
    val df = spark.read.format("graft-pages").schema(schema).option("manifest", dir.toString).load()
    val e = intercept[Exception] { df.collect() }
    assert(chain(e).contains("expected integer"), chain(e))
    // a page of valid lines with absent fields reads as nulls
    Files.write(page, "{\"k\": 1}\n".getBytes)
    val row = spark.read.format("graft-pages").schema(schema)
      .option("manifest", dir.toString).load().collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("schema is explicit by contract: inference refuses with guidance") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-pages").option("manifest", landing).load()
    }
    assert(e.getMessage.contains("explicit schema"), e.getMessage)
  }

  test("ensureLanding derivation: connector read equals the parquet events selection") {
    val sfDir = "/root/testdata/sf0.001"
    val dir = PagedLanding.ensureLanding(spark, sfDir)
    val viaConnector = spark.read.format("graft-pages").schema(PagedLanding.pageSchema)
      .option("manifest", dir).option("keyCol", "user_id").load()
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("event_id").as("s"))
    val viaParquet = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("user_id").isNotNull)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("event_id").as("s"))
    assert(viaConnector.orderBy("event_type").collect().toSeq ==
      viaParquet.orderBy("event_type").collect().toSeq)
  }
}
