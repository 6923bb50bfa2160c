package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components as pure DataFrame iteration (no RDD — input_hint asks
  * for Dataset/Catalyst throughout).
  *
  * Algorithm: iterated min-label propagation — each node adopts the smallest
  * component id among itself and its neighbors until fixpoint. Convergence is
  * O(component diameter) rounds; canonicalization components are surface-
  * variant clusters (star-like, diameter ≤ ~4), so this converges in a handful
  * of shuffles. For adversarially long chains the published alternating
  * large-star/small-star scheme (Kiveris et al., "Connected Components in
  * MapReduce", SOCC'14 — see PAPERS.md) drops rounds to O(log n); not needed
  * at this stage's cardinality (distinct surfaces ≪ corpus size).
  *
  * Each round is checkpointed via localCheckpoint to cut the growing lineage.
  */
object ConnectedComponents {

  /** nodes: single column `node` (string). edges: `node_a`, `node_b`.
    * Returns (node, canon_id) where canon_id is stable across runs
    * (min node string of the component, prefixed). */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("node_a").as("a"), col("node_b").as("b"))
      .union(edges.select(col("node_b").as("a"), col("node_a").as("b")))
      .distinct()

    var labels = nodes.select(col("node"), col("node").as("comp")).distinct()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym.join(labels, sym("b") === labels("node"))
        .groupBy(sym("a").as("node")).agg(min(col("comp")).as("ncomp"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          when(col("ncomp").isNotNull && col("ncomp") < col("comp"), col("ncomp"))
            .otherwise(col("comp")).as("comp"))
        .localCheckpoint()
      // convergence check every 2nd round — each check is a full job, and
      // label-propagation needs O(diameter) rounds anyway
      if (it % 2 == 1 || it == maxIter - 1) {
        val changes = updated.join(labels.withColumnRenamed("comp", "old"), "node")
          .filter(col("comp") =!= col("old")).limit(1).count()
        converged = changes == 0
      }
      labels = updated
      it += 1
    }
    labels.select(col("node"), concat(lit("C:"), col("comp")).as("canon_id"))
  }
}
