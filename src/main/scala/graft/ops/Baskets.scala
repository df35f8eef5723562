package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — frequent item pairs and
  * item-item similarity from (basket, item) facts. The classic
  * retail shape (orders × parts), and, in a corpus pipeline, the
  * co-occurrence backbone for "docs citing both", "tokens sharing a
  * context", "entities mentioned together".
  *
  * The quadratic danger is per-basket pair expansion: a single
  * degenerate basket with 10^5 items emits 10^10 pairs. Two
  * defenses, both principled rather than silent:
  *
  *  - APRIORI PRUNE (Agrawal & Srikant, VLDB 1994, the downward-
  *    closure property): an item in fewer than `minSupport` baskets
  *    cannot appear in any frequent pair, so infrequent items are
  *    dropped BEFORE the self-join. On heavy-tailed corpora this
  *    removes most of the item universe and is the difference
  *    between feasible and not at 100 TB.
  *  - a loud per-basket cap AFTER the prune (`maxBasketItems`,
  *    the FuzzyJoin block-cap policy): a basket still quadratic
  *    after pruning fails the job with the basket named, instead of
  *    silently detonating a task.
  *  - a loud TOTAL pair-volume cap (`maxPairVolume`, the Adamic-Adar
  *    wedge-volume policy): Σ k·(k−1)/2 over post-prune baskets IS
  *    the self-join's exact output cardinality, computed from the
  *    same per-basket count frame before the join runs — many
  *    medium baskets can be quadratic in aggregate without any one
  *    tripping the per-basket cap.
  *
  * Plan shape: distinct (one shuffle on (basket, item)) → item
  * counts (shuffle on item) + semi-join prune → per-basket
  * self-join (shuffle on basket) → pair count (shuffle on the
  * pair). All keys are longs/narrow tuples; no driver collects.
  */
object Baskets {

  /** Distinct (basket, item) facts with the apriori prune and BOTH
    * loud caps applied — the shared front half. One aggregate over
    * the per-basket count frame answers the hottest basket AND the
    * exact total pair volume (single 1-row collect, no extra scan). */
  private def prunedFacts(df: DataFrame, basketCol: String, itemCol: String,
                          minSupport: Long, maxBasketItems: Int,
                          maxPairVolume: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketItems >= 2, s"maxBasketItems must be >= 2, got $maxBasketItems")
    require(maxPairVolume >= 1, s"maxPairVolume must be >= 1, got $maxPairVolume")
    val facts = df.select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .where(col("__basket").isNotNull && col("__item").isNotNull)
      .distinct()
    val frequent = facts.groupBy(col("__item")).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minSupport).select(col("__item"))
    // Materialize the pruned facts ONCE, hash-partitioned by basket
    // (r14 optimization): previously this lazy frame re-ran the
    // distinct + count + semi-join pipeline for EVERY consumer — the
    // volume probe below, the self-join's two sides, and the callers'
    // item-count aggregates (measured: 16-20 sequential jobs per
    // basket query, the same 1.6 MB distinct stage 2-3×). The
    // explicit basket-keyed repartition does double duty: the
    // checkpointed layout feeds BOTH self-join sides exchange-free
    // (they are projections of the same frame, guide §2.4), and the
    // explicit partition count opts out of AQE byte-based coalescing,
    // which sized this exchange for its ~MB input instead of its
    // quadratic per-basket pair expansion (guide §2.5; measured: the
    // pair stage ran on 3 tasks). Counts are order-free integers, so
    // results are bit-identical under the new partitioning.
    val pruned = graft.ops.Checkpoints.truncate(
      facts.join(frequent, Seq("__item"), "left_semi")
        .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
          col("__basket")))
    val probe = pruned.groupBy(col("__basket")).agg(count(lit(1)).as("__k"))
      .agg(max(col("__k")).as("kmax"),
        max_by(col("__basket"), col("__k")).as("hot"),
        sum(expr("__k * (__k - 1) div 2")).as("vol"))
      .head()
    if (!probe.isNullAt(0)) { // null ⇔ nothing survived the prune
      val (kmax, vol) = (probe.getLong(0), probe.getLong(2))
      require(kmax <= maxBasketItems,
        s"Baskets: basket ${probe.get(1)} still holds $kmax frequent items " +
          s"(cap $maxBasketItems) - its pair expansion is quadratic; raise " +
          "minSupport, cap the basket upstream, or raise maxBasketItems deliberately")
      require(vol <= maxPairVolume,
        s"Baskets: total pair volume $vol (= the self-join's exact output rows) " +
          s"exceeds maxPairVolume=$maxPairVolume - the aggregate expansion is " +
          "quadratic even though no single basket trips the per-basket cap; " +
          "raise minSupport or raise maxPairVolume deliberately")
    }
    pruned
  }

  private def pairsFrom(pruned: DataFrame, minSupport: Long): DataFrame = {
    val a = pruned.select(col("__basket"), col("__item").as("item_a"))
    val b = pruned.select(col("__basket"), col("__item").as("item_b"))
    a.join(b, Seq("__basket")).where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Frequent unordered item pairs: (item_a, item_b, support) with
    * item_a < item_b and support = #baskets containing BOTH, for
    * every pair at or above `minSupport`. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, maxBasketItems: Int = 10000,
                    maxPairVolume: Long = 1000000000L): DataFrame =
    pairsFrom(prunedFacts(df, basketCol, itemCol, minSupport, maxBasketItems,
      maxPairVolume), minSupport)

  /** Item-item cosine similarity over basket membership vectors:
    * cos(a,b) = support(a,b) / sqrt(count(a)·count(b)), reported in
    * integer NANO-UNITS. Every input is an exact integer and both
    * the sqrt and the division are correctly rounded under IEEE-754,
    * so `cos_e9` is bit-identical across engines — no float sums
    * anywhere (the co-occurrence counts do the accumulating).
    * Output: (item_a, item_b, support, cos_e9) for pairs at or
    * above `minSupport`, item_a < item_b. */
  /** Directed association rules from the frequent pairs: for every
    * frequent unordered pair, BOTH rules a→b and b→a with
    *
    *   confidence(a→b) = support(a,b) / count(a)          (direction-
    *     dependent — the asymmetric half of the report)
    *   lift(a→b) = support(a,b)·N / (count(a)·count(b))   (symmetric;
    *     >1 = attraction, <1 = repulsion)
    *
    * N = total distinct baskets in the ORIGINAL facts (pre-prune —
    * lift is relative to all transactions, not the pruned survivor
    * set; the prune only removes items that cannot form frequent
    * pairs, it must not inflate every lift). All inputs exact
    * integers; conf/lift are each one mirrored IEEE tree,
    * nano-rounded. Output: (antecedent, consequent, support,
    * conf_nano, lift_nano). */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long, maxBasketItems: Int = 10000,
            maxPairVolume: Long = 1000000000L): DataFrame = {
    val pruned = prunedFacts(df, basketCol, itemCol, minSupport, maxBasketItems,
      maxPairVolume)
    val counts = pruned.groupBy(col("__item")).agg(count(lit(1)).as("__cnt"))
    val nBaskets = df.select(col(basketCol).as("__basket"))
      .where(col("__basket").isNotNull)
      .agg(count_distinct(col("__basket")).as("__N"))
    val pairs = pairsFrom(pruned, minSupport)
    val directed = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("support"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("support")))
    directed
      .join(counts.select(col("__item").as("antecedent"), col("__cnt").as("__ca")),
        "antecedent")
      .join(counts.select(col("__item").as("consequent"), col("__cnt").as("__cb")),
        "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("support"),
        round(lit(1e9) * col("support").cast("double") / col("__ca").cast("double"))
          .cast("long").as("conf_nano"),
        round(lit(1e9) * (col("support") * col("__N")).cast("double") /
          (col("__ca") * col("__cb")).cast("double"))
          .cast("long").as("lift_nano"))
  }

  def cosinePairs(df: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long, maxBasketItems: Int = 10000,
                  maxPairVolume: Long = 1000000000L): DataFrame = {
    val pruned = prunedFacts(df, basketCol, itemCol, minSupport, maxBasketItems,
      maxPairVolume)
    val counts = pruned.groupBy(col("__item")).agg(count(lit(1)).as("__cnt"))
    val pairs = pairsFrom(pruned, minSupport)
    pairs
      .join(counts.select(col("__item").as("item_a"), col("__cnt").as("__ca")), "item_a")
      .join(counts.select(col("__item").as("item_b"), col("__cnt").as("__cb")), "item_b")
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support").cast("double") /
            sqrt((col("__ca") * col("__cb")).cast("double")) * lit(1.0e9))
          .cast("long").as("cos_e9"))
  }
}
