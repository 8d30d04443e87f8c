package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components for duplicate-cluster resolution
  * (north-star ext op: corpus-scale dedup needs TRANSITIVE clusters —
  * if A~B and B~C come out of LSH, all three are one duplicate group
  * even when A and C never share a bucket).
  *
  * Algorithm: hash-min label propagation. Every node starts labeled
  * with its own id; each round every node takes the min label among
  * itself and its neighbors; stop when no label changed. The fixpoint
  * labels each node with the smallest node id in its component —
  * deterministic, engine-independent.
  *
  * Scale posture: one round = one shuffle join (edges x labels) + one
  * shuffle aggregation (min per node) — all narrow-key hash shuffles,
  * no driver-side graph. Round count is bounded by the component
  * diameter. The LSH dedup graphs this feeds are unions of stars
  * (doc -> bucket representative), whose diameter stays tiny, so 2-4
  * rounds settle them. For adversarial long-path graphs at 100 TB,
  * swap the round body for alternating large-star/small-star (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14),
  * which converges in O(log n) rounds with the same per-round shape.
  */
object ConnectedComponents {

  /** `nodes`: one column `id`. `edges`: columns `a`, `b` (undirected,
    * need not be symmetric or deduplicated). Returns (`id`, `lbl`)
    * where `lbl` = min node id in the component. */
  def run(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // each neighbor of b offers b's current label to a; a keeps the min
      val next = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("lbl"))
        .union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      converged = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") < col("prev")).isEmpty
      labels.unpersist()
      labels = next
      round += 1
    }
    sym.unpersist()
    labels
  }
}
