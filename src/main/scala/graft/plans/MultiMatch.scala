package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting in ONE pass — Aho-Corasick
  * (1975) over a driver-built dictionary, shipped into the task
  * binary like `BpeEncodeCount`'s merge table: the entity-tagging /
  * blocklist / PII-term primitive. The naive alternative scans the
  * text once PER pattern (`k × contains`), which at a 10⁴-term
  * dictionary over 100 TB is 10⁴ passes; the automaton pays one pass
  * whatever the dictionary size.
  *
  * Semantics: counts EVERY occurrence of every pattern, overlapping
  * included ("aaa" contains "aa" twice) and nested included (a match
  * of "tiger" is also a match of "tige…"'s suffix patterns) — the
  * standard AC output-link semantics, stated because the common
  * `length(replace(...))` counting trick is NON-overlapping and
  * disagrees on self-overlapping patterns (the oracle uses a
  * position-probe formula instead, which agrees).
  *
  * Matching is on UTF-16 code units, exact and case-sensitive —
  * normalization/casefolding belongs upstream (`Normalize`).
  *
  * Returns ARRAY<BIGINT> aligned with the pattern list. Pure per-row
  * map inside whole-stage codegen; the automaton (goto/fail/output
  * arrays) is built once on the driver and referenced via
  * `addReferenceObj`.
  */
case class MultiMatchCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "MultiMatchCount: empty pattern list")
  require(patterns.forall(_.nonEmpty),
    "MultiMatchCount: empty-string pattern (matches everywhere — meaningless)")
  require(patterns.distinct.size == patterns.size,
    "MultiMatchCount: duplicate patterns — each output slot must be unambiguous")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_match"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_multi_match expects STRING, got ${other.catalogString}")
  }

  // ---- Aho-Corasick automaton, built lazily per task (and on the
  // driver for eval): dense per-node hash maps for goto, fail links
  // via BFS, output = pattern ids ending at the node (own + the
  // fail-chain's, flattened at build time so matching never walks
  // fail chains per character).
  @transient private lazy val automaton: AcAutomaton = AcAutomaton(patterns)

  def countAll(text: UTF8String): GenericArrayData = {
    val counts = automaton.count(text.toString)
    new GenericArrayData(counts)
  }

  protected override def nullSafeEval(input: Any): Any =
    countAll(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("graftAc", this, classOf[MultiMatchCount].getName)
    defineCodeGen(ctx, ev, c => s"$self.countAll($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCount =
    copy(child = newChild)
}

/** The automaton itself — separable for direct JVM tests. */
final class AcAutomaton(gotoMaps: Array[java.util.HashMap[Character, Integer]],
                        outputs: Array[Array[Int]], nPatterns: Int) {
  def count(text: String): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = Character.valueOf(text.charAt(i))
      // follow fail links until a goto exists (root goto always exists
      // implicitly: missing at root = stay at root). Fail transitions
      // were pre-resolved into the goto maps at build time, so this is
      // a single lookup.
      val nxt = gotoMaps(state).get(ch)
      state = if (nxt == null) 0 else nxt.intValue()
      val out = outputs(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object AcAutomaton {
  /** Build with goto/fail, then FLATTEN: every state's transition map
    * is completed with its fail-state's transitions (recursively, via
    * BFS order), so matching needs one map lookup per character. */
  def apply(patterns: Seq[String]): AcAutomaton = {
    val gotos = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        val m = gotos(s)
        val nxt = m.get(Character.valueOf(c))
        s = if (nxt != null) nxt.intValue()
        else {
          gotos += new java.util.HashMap[Character, Integer]()
          ends += Nil
          m.put(Character.valueOf(c), Integer.valueOf(gotos.size - 1))
          gotos.size - 1
        }
      }
      ends(s) = pid :: ends(s)
    }
    val n = gotos.size
    val fail = new Array[Int](n)
    val out = Array.fill(n)(List.empty[Int])
    (0 until n).foreach(s => out(s) = ends(s))
    val queue = scala.collection.mutable.Queue[Int]()
    gotos(0).forEach { (_, v) => queue.enqueue(v.intValue()) }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      // children first collect their fail links from the parent's
      // (already-final) state, then inherit outputs and transitions
      val entries = new java.util.ArrayList(gotos(s).entrySet())
      entries.forEach { e =>
        val (c, child) = (e.getKey, e.getValue.intValue())
        queue.enqueue(child)
        val f = gotos(fail(s)).get(c)
        fail(child) = if (s == 0) 0
          else if (f != null && f.intValue() != child) f.intValue()
          else 0
      }
      if (s != 0) {
        out(s) = out(s) ++ out(fail(s))
        // flatten: inherit the fail state's transitions we lack
        gotos(fail(s)).forEach { (c, v) =>
          if (!gotos(s).containsKey(c)) gotos(s).put(c, v)
        }
      }
    }
    new AcAutomaton(gotos.toArray, out.map(_.toArray).toArray, patterns.size)
  }
}

object MultiMatch {
  /** Per-row occurrence counts (overlapping included) of each
    * pattern, as ARRAY<BIGINT> aligned with `patterns`. */
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column =
    GraftSqlShim.column(MultiMatchCount(GraftSqlShim.expression(text), patterns))
}
