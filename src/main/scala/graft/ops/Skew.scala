package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY scale requirement; the
  * reference never joins at scale, but a 100 TB fact table will have
  * hot keys — e.g. one location producing most observations).
  *
  * `saltedEquiJoin` spreads each hot key over `salts` sub-keys:
  * the large side gets a random-ish (deterministic: hash of an id
  * column) salt in [0, salts); the small side is exploded ×salts so
  * every (key, salt) pair finds its match. Correctness is identical
  * to a plain equi-join; the shuffle partitions holding a hot key
  * shrink by ~salts×.
  *
  * AQE's skew-join splitting handles most cases automatically (it
  * splits oversized sort-merge partitions); explicit salting is for
  * hash-aggregate-feeding joins or when a single key exceeds what a
  * split can fix. Prefer AQE first — this operator is the manual
  * override.
  */
object Skew {

  /** Deterministic salt in [0, salts) from an id column (not rand():
    * retries/speculative tasks must salt identically). */
  def salt(idCol: Column, salts: Int): Column = pmod(xxhash64(idCol), lit(salts.toLong))

  /** Equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * `large` must carry `idCol` (any column with high entropy).
    *
    * Only inner/left-outer/semi/anti are supported: the small side is
    * exploded ×salts, so a right/full outer join would emit each
    * unmatched small-side row `salts` times. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     idCol: String, salts: Int, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
      allowed.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports inner/left/semi/anti joins, not '$joinType' " +
        "(the exploded small side would duplicate unmatched right-side rows)")
    val saltedLarge = large.withColumn("__salt", salt(col(idCol), salts))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
