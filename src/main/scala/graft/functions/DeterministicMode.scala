package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A6: deterministic mode — the most frequent value; ties broken by
  * the lexicographically smallest value.
  *
  * The reference uses `statistics.mode` (dags/daily_compile_weather.py:76)
  * whose tie-break is "first encountered" — an insertion-order artifact
  * that has no distributed meaning. Spark's built-in `mode` breaks ties
  * arbitrarily too. This Aggregator fixes the tie-break so results are
  * reproducible at any parallelism and expressible in oracle SQL
  * (row_number over count DESC, value ASC).
  *
  * Nulls are ignored (matching both `statistics.mode` over pre-filtered
  * values and SQL aggregate null semantics); an all-null group yields
  * null.
  *
  * Scale note: state is a per-group Map[value -> count]; fine for
  * low-cardinality categorical columns (weather conditions, event
  * types). The merge is associative/commutative so partial aggregation
  * works map-side.
  */
object DeterministicModeAgg extends Aggregator[String, Map[String, Long], String] {
  def zero: Map[String, Long] = Map.empty
  def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  }
  def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.minBy { case (k, v) => (-v, k) }._1
  // ExpressionEncoder (catalyst map layout), not Kryo blobs — partial
  // buffers shuffle as typed maps and skip generic serialization
  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[String] = Encoders.STRING
}

object DeterministicMode {
  private lazy val fn = udaf(DeterministicModeAgg, Encoders.STRING)

  /** Deterministic mode of a string column. */
  def modeDet(c: Column): Column = fn(c)
}
