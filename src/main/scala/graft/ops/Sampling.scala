package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and train/valid/test
  * splitting for training-data pipelines.
  *
  * Random sampling (`df.sample`, `rand()`) is useless for a corpus
  * that is re-processed incrementally: membership must be a PURE
  * FUNCTION of the row key so that (a) re-runs and backfills land
  * every document in the same split, (b) two engines (or two teams)
  * agree on the split without sharing state, and (c) adding documents
  * never reshuffles existing assignments. The standard trick: hash
  * the key, take a bucket in [0, 100), compare against percentage
  * cut-points.
  *
  * The hash is the library's md5-based `graft_hash60` (native codegen
  * expression, `plans.Hash60`) — cross-engine reproducible (DuckDB:
  * `CAST(concat('0x', substr(md5(k),1,15)) AS BIGINT)`), uniform, and
  * stable across Spark versions, unlike `hash()`/`xxhash64` whose
  * seeds/variants are engine-private. Scale shape: a narrow
  * projection, no shuffle, no state — filters by bucket push down to
  * a partition-local scan.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) as a pure function of `key`
    * (cast to its canonical string form first). A NULL key yields a
    * NULL bucket: null-keyed rows fail every `bucket < pct` filter
    * (dropped by samples) and fall to `assignSplit`'s otherwise-
    * branch ("test") — identically in the DuckDB mirror, since both
    * engines propagate NULL through comparison and CASE.
    *
    * The key must cast to the SAME canonical string in every engine,
    * which holds for integral and string keys only — double and
    * timestamp render differently between Spark and DuckDB, silently
    * desynchronizing the "same split everywhere" guarantee. The
    * DataFrame-level entry points enforce that; callers handing a
    * bare Column here keep that obligation themselves. */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0, "buckets must be positive")
    pmod(graft.plans.Hash60.hash60(key.cast("string")), lit(buckets.toLong))
  }

  /** Cross-engine-reproducible key types: integral or string. */
  private def requirePortableKey(df: DataFrame, key: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(key).dataType
    val portable = dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    require(portable,
      s"sampling key '$key' is $dt; only integral/string keys have one " +
        "canonical string form across engines (cast explicitly first)")
  }

  /** Keep ~pct% of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, key: String, pct: Int): DataFrame = {
    requirePortableKey(df, key)
    df.where(hashBucket(col(key)) < pct)
  }

  /** Stratified deterministic sampling: a different keep-percentage
    * per stratum (e.g. downsample boilerplate-heavy languages, keep
    * all of a rare one) — the deterministic form of `df.sampleBy`.
    * Strata missing from `pcts` fall back to `defaultPct`. Membership
    * stays a pure function of (key, stratum percentages), so re-runs
    * and corpus growth never reshuffle kept rows. */
  def stratifiedSampleByHash(df: DataFrame, key: String, strataCol: String,
                             pcts: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    requirePortableKey(df, key)
    val pctCol = pcts.foldLeft(lit(defaultPct)) { case (acc, (stratum, pct)) =>
      when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.where(hashBucket(col(key)) < pctCol)
  }

  /** Assign train/valid/test by hash cut-points: [0, trainPct) →
    * train, [trainPct, trainPct+validPct) → valid, rest → test.
    * Partitions are disjoint and exhaustive by construction. */
  def assignSplit(df: DataFrame, key: String,
                  trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      "cut-points must fit in [0, 100]")
    requirePortableKey(df, key)
    val b = hashBucket(col(key))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }
}
