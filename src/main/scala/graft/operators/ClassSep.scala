package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding class-separability diagnostics: pairwise distances
  * between per-label centroids — the first question about a labeled
  * embedding table ("are these classes even separated in this
  * space?") before training anything on it, and the drift check
  * after re-embedding ("did the new encoder collapse two classes?").
  *
  * Exactness: centroids are RATIONAL (vector sums over counts), so
  * the squared centroid distance is computed on cross-scaled integer
  * sums —
  *
  *   ‖μ_a − μ_b‖² = ‖s_a·n_b − s_b·n_a‖² / (n_a·n_b)²
  *
  * — numerator an exact DECIMAL(38,0) square-fold over LONG
  * cross-scaled differences, one IEEE division at the end,
  * nano-rounded. Bounds (r14 — the long fold wrapped at the third
  * decade): the per-dimension cross-scaled difference s·n stays a
  * LONG (loud per-element guard at 2⁶³: |s|·n ≈ 5·10¹⁰ at sf10,
  * headroom to ~150M vectors/class at worst-case sums), while the
  * SQUARE — measured ~10²² at sf10, past int64 — accumulates in
  * decimal(38,0) (≤ 5·10³¹ per dim, ≤ 3·10³³ over 64 dims; the
  * DuckDB mirror uses HUGEINT). sf1 sat just under the old long
  * edge, which is why the wrap only surfaced at sf10.
  *
  * Scale shape: ONE data-sized aggregate (per-label element-wise
  * vector sums via `posexplode` + hash aggregate with map-side
  * partials — the shuffle carries (label, dim) cells, never
  * vectors), then all pairwise arithmetic on the |labels|-sized
  * centroid frame (metadata-sized; the label-pair cross is |L|²).
  */
object ClassSep {

  /** Pairwise (label_a < label_b) centroid geometry: n_a, n_b,
    * dist2_nano (squared euclidean distance between centroids in
    * quantized units², ×10⁹). Vectors are quantized with
    * `Similarity.quantize` scaling. NULL labels/embeddings excluded
    * (no class identity / nothing to average). */
  def centroidDistances(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val q = emb
      .where(col(labelCol).isNotNull && col(vecCol).isNotNull)
      .select(col(labelCol).cast("long").as("lab"),
        Similarity.quantize(col(vecCol)).as("qv"))
    val cells = q
      .select(col("lab"), posexplode(col("qv")))
      .groupBy(col("lab"), col("pos"))
      .agg(sum(col("col")).as("s"))
    val sums = cells
      .groupBy(col("lab"))
      .agg(sort_array(collect_list(struct(col("pos"), col("s")))).as("sv"))
      .select(col("lab"), transform(col("sv"), x => x.getField("s")).as("sv"))
    val counts = q.groupBy(col("lab")).agg(count(lit(1)).as("n"))
    val cents = sums.join(counts, Seq("lab"))
    val a = cents.select(col("lab").as("label_a"), col("sv").as("__sa"), col("n").as("n_a"))
    val b = cents.select(col("lab").as("label_b"), col("sv").as("__sb"), col("n").as("n_b"))
    // per-element LONG cross-scale with a loud overflow guard (the
    // label-pair frame is |L|²·dims cells — metadata-sized, so the
    // guard costs nothing), then the square-sum in decimal(38,0):
    // the square is ~10²² at sf10, past int64, and Spark's non-ANSI
    // long multiply would wrap SILENTLY — measured, r14
    val diff = zip_with(col("__sa"), col("__sb"), (x, y) =>
      when(abs(x) > lit(Long.MaxValue) / col("n_b") ||
           abs(y) > lit(Long.MaxValue) / col("n_a"),
        raise_error(concat(lit("ClassSep: cross-scaled sum overflows long for pair ("),
          col("label_a"), lit(","), col("label_b"), lit(")"))).cast("long"))
        .otherwise(x * col("n_b") - y * col("n_a")))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(lit(1e9) *
          aggregate(diff, lit(0).cast("decimal(38,0)"),
            (acc, d) => acc + d.cast("decimal(19,0)") * d.cast("decimal(19,0)"))
            .cast("double") /
          (col("n_a") * col("n_b")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
          .cast("long").as("dist2_nano"))
  }
}
