package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document top terms by TF-IDF — the classic keyword/signature
  * extraction over a corpus.
  *
  * Plan shape: term frequencies are one (doc, term) hash aggregate;
  * document frequencies re-aggregate the SAME frame by term (map-side
  * partials on both); the tf⋈df join is a long/string equi-join on
  * term (vocabulary-sized right side — Catalyst broadcasts it when it
  * fits); the final top-k is one window per doc_id. Corpus size N
  * enters as a 1-row broadcast cross join, not a driver action, so
  * the whole operator stays one lazy plan.
  *
  * IDF is the RATIONAL form (N+1)/(df+1), not its logarithm: ln()
  * is a libm call whose last-ulp behavior differs across engines,
  * which would break bit-exact oracle comparison (same policy as the
  * integer-cents aggregates). The ranking it induces is identical —
  * x ↦ ln(x) is monotone — and ties break on the term itself, so the
  * top-k set is deterministic and engine-independent.
  */
object TfIdf {

  /** Top `k` terms per document: (doc_id, term, tf, df, tfidf, rnk). */
  def topTerms(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0) // split(" +") yields "" at edges
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dft, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * (col("n") + lit(1.0)) / (col("df") + lit(1.0))).as("tfidf"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rnk"))
  }
}
