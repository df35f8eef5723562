package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the final
  * step of a dedup pipeline: pair edges → duplicate CLUSTERS → one
  * canonical representative per cluster (reference analogue: the
  * "keep first, drop the rest" dup handling of
  * dags/transform_raw_weather.py:91-101, lifted from key-equality
  * groups to similarity components).
  *
  * Algorithm: iterative min-label propagation — every node starts
  * labeled with itself; each round, every node takes the minimum
  * label among itself and its neighbors; fixpoint = components. The
  * label of a component is the minimum doc id in it (deterministic,
  * order-free). Rounds needed = graph diameter ≤ O(log n) for the
  * short, dense clusters near-dup graphs produce.
  *
  * Scale shape: each round is one join + one groupBy on the edge
  * list — the standard large-scale CC loop (the large-star/small-star
  * family refines exactly this shape to cut rounds on long paths;
  * dup clusters are near-cliques, so plain propagation converges in
  * 2-3 rounds). The driver loop only checks a convergence COUNT per
  * round; all data stays distributed.
  */
object Components {

  /** (id, component) for every node of the pair graph; component =
    * min doc id reachable. Pairs carry columns d1, d2. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .persist()
    edges.count() // materialize once; every round reuses it

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("neighbor_comp"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("neighbor_comp"), col("comp"))).as("comp"))
        .persist()
      val changed = next.as("n").join(labels.as("o"), Seq("id"))
        .where(col("n.comp") =!= col("o.comp")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist(blocking = false)
    labels
  }

  /** Components + canonical pick: every doc in a duplicate cluster,
    * its cluster id (min member), and whether it is the keeper. */
  def duplicateClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        (col("id") === col("comp")).as("is_canonical"))
}
