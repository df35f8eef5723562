package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise max over fixed-length int arrays — the HLL register
  * merge as ONE aggregate. Used by [[graft.operators.HyperBall]],
  * where the per-round shuffle then carries one m-int array per
  * (node, map partition) instead of up to m (id, reg, r) rows per
  * EDGE: the partial-aggregation savings are the difference between
  * O(|V|·m) and O(|E|·m̄) round traffic.
  *
  * Element-wise max is associative, commutative, idempotent — so
  * partial buffers merge in any order (partitioning-independent) and
  * re-delivery cannot corrupt a register, the same contract as the
  * row-form `PortableHll.rollup`. The empty array is the additive
  * zero; mixed lengths fail loud (two different lgK sketches can
  * never merge meaningfully).
  */
object RegMaxAgg extends Aggregator[Array[Int], Array[Int], Array[Int]] {
  private def mergeInto(acc: Array[Int], x: Array[Int]): Array[Int] =
    if (x == null || x.isEmpty) acc
    else if (acc.isEmpty) x.clone()
    else {
      require(acc.length == x.length,
        s"RegMax: register arrays of different lengths (${acc.length} vs ${x.length}) " +
          "- sketches built at different lgK cannot merge")
      var i = 0
      while (i < acc.length) { if (x(i) > acc(i)) acc(i) = x(i); i += 1 }
      acc
    }
  def zero: Array[Int] = Array.empty
  def reduce(b: Array[Int], a: Array[Int]): Array[Int] = mergeInto(b, a)
  def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = mergeInto(b1, b2)
  def finish(b: Array[Int]): Array[Int] = b
  def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  def outputEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}

object RegMax {
  private lazy val fn = udaf(RegMaxAgg,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]())

  /** Element-wise max of int-array registers. */
  def regMax(c: Column): Column = fn(c)
}
