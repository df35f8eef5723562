package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic SKEWED variant of a source SF (r9 verdict item #3):
  * same tables, same row counts, but with the hot keys a uniform-ish
  * generator never produces and a 100 TB corpus always has —
  *
  *   - events: ~20% of rows remapped to ONE hot user_id (and their
  *     event_type pinned) — the hot-entity shape that breaks
  *     hash-partitioned joins/aggs on user_id;
  *   - documents: ~20% remapped to ONE hot source domain, and the
  *     same docs get a shared leading hot token — hot URL-domain
  *     groups, hot FuzzyJoin first-token blocks, hot postings;
  *   - orders: ~20% remapped to ONE hot o_custkey (FK stays valid) —
  *     a skewed fact→dim join;
  *   - lineitem: ~20% remapped to ONE hot l_partkey — a skewed
  *     co-occurrence graph node (wedge/pair volume concentrates).
  *
  * Everything else is verbatim. All remaps are pure deterministic
  * column transforms (pmod of the row's own id — no RNG), so the
  * variant is reproducible and the uniform-vs-skewed bench deltas in
  * SCALE_NOTES are attributable to SKEW alone, not data volume: a
  * query's time moving means its plan met a hot key, and a loud
  * volume cap firing here is the cap working on organic-shaped skew
  * rather than a unit-test fixture.
  *
  * Usage: `runMain graft.GenSkew [srcDir] [outDir]`
  * (defaults: /root/testdata/sf0.1 → testdata/sf0.1-skew).
  */
object GenSkew {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "testdata/sf0.1-skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = Tables.table(spark, src, name)

    // a row is HOT when its own primary id ≡ 0..1 (mod 10) → exactly
    // 20%, deterministic, spread across the id range (not one block)
    def hot(idCol: String): org.apache.spark.sql.Column =
      pmod(col(idCol), lit(10L)) < 2

    def write(df: DataFrame, name: String, files: Int): Long = {
      df.repartition(files)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      spark.read.parquet(s"$out/$name.parquet").count()
    }

    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    counts += "region" -> write(tbl("region"), "region", 1)
    counts += "nation" -> write(tbl("nation"), "nation", 1)
    counts += "customer" -> write(tbl("customer"), "customer", 8)
    counts += "supplier" -> write(tbl("supplier"), "supplier", 2)
    counts += "part" -> write(tbl("part"), "part", 8)

    // hot customer: 20% of orders point at custkey 1
    counts += "orders" -> write(
      tbl("orders").withColumn("o_custkey",
        when(hot("o_orderkey"), lit(1L)).otherwise(col("o_custkey"))),
      "orders", 16)

    // hot part: 20% of lineitem rows point at partkey 1 — the
    // co-occurrence graph gets one node on 20% of all orders
    counts += "lineitem" -> write(
      tbl("lineitem").withColumn("l_partkey",
        when(hot("l_orderkey"), lit(1L)).otherwise(col("l_partkey"))),
      "lineitem", 32)

    // hot user: 20% of events belong to user 1, all of type "view"
    counts += "events" -> write(
      Tables.events(spark, src)
        .withColumn("user_id",
          when(hot("event_id"), lit(1L)).otherwise(col("user_id")))
        .withColumn("event_type",
          when(hot("event_id"), lit("view")).otherwise(col("event_type"))),
      "events", 16)

    // hot domain + hot leading token: same 20% of docs
    counts += "documents" -> write(
      tbl("documents")
        .withColumn("source",
          when(hot("doc_id"), lit("hothub.example")).otherwise(col("source")))
        .withColumn("text",
          when(hot("doc_id"), concat(lit("hotlead "), col("text")))
            .otherwise(col("text")))
        // keep n_chars true for the prefixed docs AND keep the SOURCE
        // type: length() returns INT where the driver SFs carry
        // BIGINT, and a twin that silently narrows a column is not a
        // twin (found by the r10 skew-twin ORACLE gate: the narrowed
        // column made q_merge_cow's +long promotion write mixed-type
        // files)
        .withColumn("n_chars",
          length(col("text")).cast(tbl("documents").schema("n_chars").dataType)),
      "documents", 8)

    counts += "embeddings" -> write(tbl("embeddings"), "embeddings", 4)

    val js = counts.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    println(s"""{"gen":"$out","mode":"skew","src":"$src","rows":$js}""")
    spark.stop()
  }
}
