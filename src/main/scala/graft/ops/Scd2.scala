package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the versioned
  * cousin of the S7 keyed upsert: instead of replacing a key's row,
  * a changed key CLOSES the current version (stamps `valid_to`) and
  * APPENDS a new one, so every historical state stays queryable
  * ("which tier was this customer on when the order shipped" is an
  * as-of join against this table — `Joins.asOfJoin` consumes it
  * directly).
  *
  * Contract:
  *  - `dim` rows: key, attrs, `valid_from`, `valid_to` (NULL = open,
  *    exactly one open row per key), `is_current`.
  *  - `updates`: key, attrs, `tsCol` — multiple updates per key per
  *    batch are collapsed to the LATEST by (ts, tieBreak) first
  *    (deterministic; one version per key per batch — intra-batch
  *    history needs per-event batches by construction).
  *  - An update whose attrs equal the open row's attrs is a no-op
  *    (no empty versions). A new key opens its first version.
  *  - Closed history rows pass through untouched.
  *  - Precondition: update ts ≥ the open row's `valid_from`
  *    (out-of-order batches corrupt intervals) — ENFORCED with a
  *    loud raise_error, same policy as asOfJoin's duplicate guard.
  *
  * Plan shape: one latest-per-key aggregate on the updates, one
  * key-partitioned equi-join against the OPEN slice of the dim, a
  * narrow union of (history ∪ kept-open ∪ closed ∪ new). Everything
  * shuffles on the key once; at 100 TB write the result with
  * `Sinks.upsertPartitions` keyed on a date bucket of `valid_from`.
  */
object Scd2 {

  /** Apply one update batch; returns the new full dimension state. */
  def apply(dim: DataFrame, updates: DataFrame, key: String,
            attrCols: Seq[String], tsCol: String, tieBreak: String): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val attrs = attrCols.map(col)

    // NULL timestamps cannot be existence sentinels (a NULL-ts
    // update or NULL-valid_from open row would silently vanish) —
    // reject them loudly and mark side membership explicitly
    val guardedUpdates = updates.withColumn(tsCol,
      when(col(tsCol).isNull,
        raise_error(concat(lit(s"Scd2: NULL $tsCol in update for key "),
          col(key).cast("string"))).cast(updates.schema(tsCol).dataType))
        .otherwise(col(tsCol)))
    // latest update per key, deterministic: max (ts, tieBreak)
    val latest = guardedUpdates
      .groupBy(col(key))
      .agg(max_by(struct((col(tsCol) +: col(tieBreak) +: attrs): _*),
        struct(col(tsCol), col(tieBreak))).as("u"))
      .select((col(key) +: col(s"u.$tsCol").as("__u_ts") +: lit(true).as("__upd") +:
        attrCols.map(a => col(s"u.$a").as(s"__u_$a"))): _*)

    val history = dim.where(col("valid_to").isNotNull)
    val open = dim.where(col("valid_to").isNull)
      .withColumn("valid_from",
        when(col("valid_from").isNull,
          raise_error(concat(lit("Scd2: open dim row with NULL valid_from for key "),
            col(key).cast("string"))).cast(dim.schema("valid_from").dataType))
          .otherwise(col("valid_from")))
      .withColumn("__open", lit(true))

    val joined = open.join(latest, Seq(key), "full_outer")

    val hasUpdate = col("__upd").isNotNull
    val hasOpen = col("__open").isNotNull
    val changed = hasOpen && hasUpdate &&
      attrCols.map(a => !(col(a) <=> col(s"__u_$a"))).reduce(_ || _)
    // loud out-of-order guard (evaluated only on matched pairs)
    val guardedTs = when(hasOpen && hasUpdate && col("__u_ts") < col("valid_from"),
      raise_error(concat(lit(s"Scd2: update $tsCol precedes the open version's valid_from for "),
        col(key).cast("string"))).cast(open.schema("valid_from").dataType))
      .otherwise(col("__u_ts"))

    // open rows that stay open (no update, or identical attrs)
    val keptOpen = joined.where(hasOpen && (!hasUpdate || !changed))
      .select((col(key) +: attrs :+ col("valid_from") :+
        lit(null).cast(open.schema("valid_to").dataType).as("valid_to") :+
        lit(true).as("is_current")): _*)
    // changed open rows, closed at the update ts
    val closed = joined.where(changed)
      .select((col(key) +: attrs :+ col("valid_from") :+
        guardedTs.as("valid_to") :+ lit(false).as("is_current")): _*)
    // new versions: changed keys and brand-new keys
    val opened = joined.where(hasUpdate && (!hasOpen || changed))
      .select((col(key) +: attrCols.map(a => col(s"__u_$a").as(a)) :+
        guardedTs.as("valid_from") :+
        lit(null).cast(open.schema("valid_to").dataType).as("valid_to") :+
        lit(true).as("is_current")): _*)

    history.select((col(key) +: attrs :+ col("valid_from") :+ col("valid_to") :+
        lit(false).as("is_current")): _*)
      .unionByName(keptOpen).unionByName(closed).unionByName(opened)
  }

  /** Bootstrap a dimension from an initial snapshot. */
  def init(snapshot: DataFrame, key: String, attrCols: Seq[String],
           tsCol: String): DataFrame =
    snapshot.select((col(key) +: attrCols.map(col) :+
      col(tsCol).as("valid_from") :+
      lit(null).cast(snapshot.schema(tsCol).dataType).as("valid_to") :+
      lit(true).as("is_current")): _*)

  /** Point-in-time (temporal) join: attach to every fact row the
    * dimension attributes that were valid AT the fact's timestamp —
    * the version with `valid_from` ≤ ts < `valid_to` (open version:
    * no upper bound). Facts before the key's first version, with an
    * unknown key, or falling in a GAP of a non-contiguous dimension
    * get NULL attributes (left-join semantics) — never the stale
    * previous version.
    *
    * Plan shape: because SCD2 intervals per key are ordered by
    * `valid_from`, "the containing interval" IS "the most recent
    * version starting at-or-before ts" — so this is one
    * [[Joins.asOfJoin]] (union + single window pass, ONE shuffle on
    * the key, linear) plus a narrow gap check, not an interval theta-
    * join (BroadcastNestedLoopJoin, quadratic per key — the plan
    * Spark picks for the naive BETWEEN join). Zero-width versions
    * (closed at their own start) share `valid_from` with their
    * successor; the tie is broken toward the version with the later
    * (or open) `valid_to` — the one actually containing ts. */
  def pointInTime(facts: DataFrame, dim: DataFrame, key: String,
                  factTs: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val vtType = dim.schema("valid_to").dataType
    val farFuture = lit("9999-12-31 23:59:59").cast(vtType)
    val d = dim.select((col(key) +: col("valid_from") +: col("valid_to") +:
        coalesce(col("valid_to"), farFuture).as("pit_tie") +:
        attrCols.map(col)): _*)
    val joined = Joins.asOfJoin(facts, d, Seq(key), factTs, "valid_from", "pit_tie",
      payload = attrCols :+ "valid_to")
    // gap guard: a closed version whose interval ended at-or-before
    // the fact ts matched only because the dimension has a hole
    // there — the honest answer is "no version", not the stale one
    val gap = col("valid_to").isNotNull && col(factTs) >= col("valid_to")
    attrCols.foldLeft(joined) { (df, a) =>
      df.withColumn(a, when(gap, lit(null).cast(df.schema(a).dataType)).otherwise(col(a)))
    }.drop("valid_to")
  }
}
