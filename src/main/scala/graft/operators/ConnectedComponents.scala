package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the operator that
  * turns a near-dup PAIR list into duplicate CLUSTERS (each doc mapped
  * to its cluster's smallest id, the canonical representative).
  *
  * Iterative by nature: each round every node adopts the minimum label
  * in its neighborhood; convergence takes at most the graph diameter
  * rounds (near-dup graphs are shallow — dup clusters are cliques or
  * short chains, so a handful of rounds in practice). Each round is one
  * shuffle join + one aggregation, and the label frontier is
  * `localCheckpoint`ed per round — MANDATORY for an iterative Spark
  * operator (unbounded lineage otherwise re-executes every prior round
  * per action and overflows the planner at scale).
  *
  * This is the plain-DataFrame version of the standard large-graph CC
  * recipe; at 100 TB-scale edge lists the same loop runs with the
  * frontier persisted to the lake per round instead of memory. */
object ConnectedComponents {

  /** `edges(a, b)` undirected; returns `(id, component)` for every id
    * appearing in an edge, `component` = min id reachable. Throws if
    * `maxIter` rounds don't converge (a graph with diameter beyond
    * `maxIter` needs a bigger budget — never silently wrong). */
  def apply(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .unionByName(edges.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // each node pulls the min label over its neighbors...
      val pulled = sym
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      // ...and keeps the smaller of (own, neighborhood min)
      val next = labels.join(pulled, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.select(col("id"), col("label").as("prev")), Seq("id"))
        .filter(col("label") =!= col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds — raise maxIter")
    labels.select(col("id"), col("label").as("component"))
  }
}
