package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: builds an sfN dataset as K
  * disjoint shifted copies of a driver-generated source SF (round-8
  * verdict item #1 — the full-suite 10× proof needs an sf1 the
  * driver does not ship).
  *
  * Design rules, in order of importance:
  *
  *  1. **Deterministic** — no RNG anywhere; the k-th copy is a pure
  *     column transform of the source, so two runs produce
  *     byte-identical logical content and per-round numbers stay
  *     comparable.
  *  2. **FK-consistent** — every key domain shifts by its own
  *     power-of-ten stride (computed from the actual max, so copies
  *     can never collide), and fact/dim keys shift TOGETHER:
  *     join cardinality structure is exactly 10 disjoint replicas of
  *     the source's. Fixed dims (region, nation) stay 1× like TPC-H.
  *  3. **Content-disjoint copies** — document text gets a per-copy
  *     Caesar rotation (length-preserving, so n_chars stays true) and
  *     embeddings a per-copy cyclic component rotation
  *     (norm-preserving). Copies are therefore NOT 10-clone near-dup
  *     clusters: dup/ANN volume scales linearly like a real 10×
  *     corpus, not quadratically like the deliberately-adversarial
  *     SCALE_NOTES round-1 clone corpus. WITHIN-copy structure
  *     (near-dup pairs, clusters, language mix) replicates 10×.
  *  4. **Realistic file layout** — outputs are multi-file parquet
  *     directories sized so local[32] gets real scan parallelism.
  *
  * Usage: `runMain graft.GenScale [srcDir] [outDir] [copies]`
  * (defaults: /root/testdata/sf0.1 → testdata/sf1 × 10).
  */
object GenScale {

  private def nextPow10(v: Long): Long = {
    var p = 1L
    while (p <= v) p *= 10
    p
  }

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "testdata/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // <= 26: the per-copy Caesar rotation is injective only within one
    // alphabet cycle — copy 26 would reproduce copy 0's text/names
    // verbatim and recreate exactly the quadratic clone-corpus
    // near-dup shape design rule 3 promises to rule out (r9 advice)
    require(copies >= 1 && copies <= 26, s"copies in [1,26], got $copies")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = Tables.table(spark, src, name)
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0)

    // key strides — one per key DOMAIN (lineitem shares orders',
    // parts', suppliers' domains), from the actual data so a copy
    // can never collide with another
    val sOrder = nextPow10(maxOf(tbl("orders"), "o_orderkey"))
    val sCust  = nextPow10(maxOf(tbl("customer"), "c_custkey"))
    val sSupp  = nextPow10(maxOf(tbl("supplier"), "s_suppkey"))
    val sPart  = nextPow10(maxOf(tbl("part"), "p_partkey"))
    val sEvent = nextPow10(maxOf(Tables.events(spark, src), "event_id"))
    val sUser  = nextPow10(maxOf(Tables.events(spark, src), "user_id"))
    val sDoc   = nextPow10(maxOf(tbl("documents"), "doc_id"))
    val sVec   = nextPow10(maxOf(tbl("embeddings"), "vec_id"))

    def shifted(df: DataFrame, copy: Int, shifts: Map[String, Long],
                extra: Map[String, Int => org.apache.spark.sql.Column] = Map.empty): DataFrame =
      df.select(df.columns.map { c =>
        if (extra.contains(c)) extra(c)(copy).as(c)
        else shifts.get(c) match {
          case Some(stride) => (col(c) + lit(stride * copy)).as(c)
          case None => col(c)
        }
      }.toIndexedSeq: _*)

    def replicate(df: DataFrame, shifts: Map[String, Long],
                  extra: Map[String, Int => org.apache.spark.sql.Column] = Map.empty): DataFrame =
      (0 until copies).map(k => shifted(df, k, shifts, extra)).reduce(_ unionByName _)

    def write(df: DataFrame, name: String, files: Int): Long = {
      df.repartition(files)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      spark.read.parquet(s"$out/$name.parquet").count()
    }

    // per-copy Caesar rotation of letters: length-preserving (keeps
    // n_chars truthful) and shingle-disjoint across copies, so the
    // near-dup corpus scales like 10 distinct crawls, not 10 clones
    def caesar(c: String)(copy: Int) = {
      val k = copy % 26
      val lo = lower.drop(k) + lower.take(k)
      val up = upper.drop(k) + upper.take(k)
      translate(col(c), lower + upper, lo + up)
    }
    // per-copy deterministic SIGN-FLIP pattern on embedding
    // components: dot(s∘a, s∘b) = Σ sᵢ²·aᵢbᵢ = dot(a,b), so every
    // within-copy dot product — hence the copy's entire cosine
    // geometry — is preserved EXACTLY, while cross-copy cosines
    // collapse toward 0 (Σ ±aᵢbᵢ with xxhash-derived signs cancels)
    // even for biased all-positive vectors. The first cut used a
    // cyclic component ROTATION, which preserves norms but NOT
    // cross-copy decorrelation on biased data: measured, it
    // manufactured 6,012 cosine≥0.5 near-dup pairs at sf1 where the
    // volume law predicts ~140 — a generator artifact, not corpus
    // structure. Copy 0 is the identity.
    def signFlip(copy: Int) =
      if (copy == 0) col("embedding")
      else expr(s"transform(embedding, (x, i) -> x * CAST(1 - 2 * pmod(" +
        s"xxhash64(concat('sf$copy', '_', CAST(i AS STRING))), 2) AS FLOAT))")

    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    // fixed dims: 1×, verbatim (the TPC-H convention)
    counts += "region" -> write(tbl("region"), "region", 1)
    counts += "nation" -> write(tbl("nation"), "nation", 1)
    // identity-LIKE string columns (names) rotate with their keys:
    // 10 exact clones of every name would make fuzzy-join/ER blocks
    // quadratic — the clone-corpus shape this generator's contract
    // rules out. Categorical columns (segment, brand, type, status)
    // stay verbatim so group-by cardinalities are unchanged.
    counts += "customer" -> write(
      replicate(tbl("customer"), Map("c_custkey" -> sCust),
        extra = Map("c_name" -> caesar("c_name"))), "customer", 8)
    counts += "supplier" -> write(
      replicate(tbl("supplier"), Map("s_suppkey" -> sSupp),
        extra = Map("s_name" -> caesar("s_name"))), "supplier", 2)
    counts += "part" -> write(
      replicate(tbl("part"), Map("p_partkey" -> sPart),
        extra = Map("p_name" -> caesar("p_name"))), "part", 8)
    counts += "orders" -> write(
      replicate(tbl("orders"), Map("o_orderkey" -> sOrder, "o_custkey" -> sCust)),
      "orders", 16)
    counts += "lineitem" -> write(
      replicate(tbl("lineitem"), Map(
        "l_orderkey" -> sOrder, "l_partkey" -> sPart, "l_suppkey" -> sSupp)),
      "lineitem", 32)
    // events: ids shift, timestamps stay — 10× concurrent users is
    // the realistic growth mode (per-user session structure intact,
    // per-window volume ×10)
    counts += "events" -> write(
      replicate(Tables.events(spark, src),
        Map("event_id" -> sEvent, "user_id" -> sUser)), "events", 16)
    counts += "documents" -> write(
      replicate(tbl("documents"), Map("doc_id" -> sDoc),
        extra = Map("text" -> caesar("text"))), "documents", 8)
    counts += "embeddings" -> write(
      replicate(tbl("embeddings"), Map("vec_id" -> sVec),
        extra = Map("embedding" -> signFlip)), "embeddings", 4)

    val js = counts.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    println(s"""{"gen":"$out","copies":$copies,"src":"$src","rows":$js}""")
    spark.stop()
  }
}
