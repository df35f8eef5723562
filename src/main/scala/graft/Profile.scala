package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — times individual queries / stages at a
  * given SF dir. Not part of the driver contract. */
object Profile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    args.headOption.getOrElse("components") match {
      case "components" =>
        val docs = Tables.documents(spark, sfDir)
        val pairs = graft.operators.NearDup.minhashNearDupPairs(docs, "text", 3, 0.8)
        time("pairs.count")(pairs.count())
        time("pairs.count warm")(pairs.count())
        val clusters = graft.operators.Components.duplicateClusters(pairs)
        time("cc.count")(clusters.count())
        val pairs2 = graft.operators.NearDup.minhashNearDupPairs(docs, "text", 3, 0.8)
        time("cc.count warm")(graft.operators.Components.duplicateClusters(pairs2).count())
      case "recap" =>
        import graft.ops.{Observations, Recap}
        def obs = Observations.guardValid(Observations.fromEvents(Tables.events(spark, sfDir)))
        time("obs.count")(obs.count())
        time("slotFirst")(Recap.slotFirst(obs).count())
        time("hourly")(Recap.hourly(Recap.slotFirst(obs)).count())
        time("daily")(Recap.daily(Recap.hourly(Recap.slotFirst(obs))).count())
        time("nested q")(SparkEntry.queries("q_recap_nested")(spark, sfDir).count())
        time("nested q warm")(SparkEntry.queries("q_recap_nested")(spark, sfDir).count())
      case "jaccard" =>
        import graft.operators.NearDup
        val docs = Tables.documents(spark, sfDir)
        val sh = NearDup.shingled(docs, "text", 3)
        time("shingled")(sh.count())
        val cl = NearDup.clusteredSets(sh).persist()
        time("clusteredSets")(cl.count())
        time("jaccardFrom")(NearDup.jaccardPairsFrom(cl, 0.8).count())
        time("jaccardFrom warm")(NearDup.jaccardPairsFrom(cl, 0.8).count())
        time("minhashFrom")(NearDup.minhashNearDupPairsFrom(cl, 0.8).count())
        time("minhashFrom warm")(NearDup.minhashNearDupPairsFrom(cl, 0.8).count())
      case "asofscale" =>
        // as-of join scaling: events at 1x and a 10x synthetic union
        // (ids and users shifted so the key space also grows 10x)
        def evN(n: Int) = {
          val base = Tables.events(spark, sfDir).where(col("user_id").isNotNull)
          (0 until n).map(i => base
            .withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L))
            .withColumn("user_id", col("user_id") + lit(i.toLong * 1000L)))
            .reduce(_ unionByName _)
        }
        for (n <- Seq(1, 10)) {
          val ev = evN(n).persist()
          val rows = ev.count()
          val purchases = ev.where(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts"))
          val clicks = ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
          time(s"asof ${n}x ($rows rows)")(
            graft.ops.Joins.asOfJoin(purchases, clicks, Seq("user_id"),
              "ts", "ts", "click_id", Seq("click_id")).count())
          ev.unpersist()
        }
      case name =>
        val q = SparkEntry.queries(name)
        time(s"$name cold")(q(spark, sfDir).count())
        time(s"$name warm")(q(spark, sfDir).count())
    }
    spark.stop()
  }
}
