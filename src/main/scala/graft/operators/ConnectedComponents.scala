package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label CONTRACTION — the operator that
  * turns a near-dup PAIR list into duplicate CLUSTERS (each doc mapped
  * to its cluster's smallest id, the canonical representative).
  *
  * Each round: every node takes the min id over its closed
  * neighborhood, pointer-jumps that label (label := label's label,
  * `jumpsPerRound` times), and then the graph is CONTRACTED — edges
  * rewritten to (label(src), label(dst)), self-loops dropped. Merged
  * nodes disappear, so the graph shrinks geometrically and the loop
  * ends when NO edges remain; a global (id → component) mapping is
  * composed incrementally per round. Contraction is what bounds the
  * round count: plain label propagation needs ~diameter rounds (the
  * sf0.1 near-dup chain took 37 even with jumps), contraction drains
  * the same graph in a handful.
  *
  * Two Spark-specific disciplines, both load-bearing at scale:
  *   - every per-round frontier is materialized (`localCheckpoint`) —
  *     unbounded lineage otherwise re-executes all prior rounds per
  *     action;
  *   - the checkpointed plan is re-wrapped as a fresh `LogicalRDD`:
  *     `localCheckpoint` PRESERVES the origin plan's cost statistics,
  *     and join-size estimates MULTIPLY — compounded over rounds the
  *     sizeInBytes BigInt doubles its bit-length every round until
  *     driver-side stats arithmetic (million-bit BigInteger Toom-Cook
  *     multiplications, found via thread dump) dwarfs the actual data
  *     work. Fresh leaves reset the estimate each round.
  */
object ConnectedComponents {

  /** `edges(a, b)` undirected; returns `(id, component)` for every id
    * appearing in an edge, `component` = min id reachable. Throws if
    * `maxIter` contraction rounds don't drain the edge set — never
    * silently wrong. `numPartitions` sizes the loop's shuffles — leave
    * 0 to inherit the session default for big edge lists, set small
    * (e.g. 2-8) when the graph is metadata-scale next to the corpus. */
  def apply(edges: DataFrame, maxIter: Int = 50, jumpsPerRound: Int = 3,
            numPartitions: Int = 0): DataFrame = {
    val part: DataFrame => DataFrame =
      if (numPartitions > 0) _.repartition(numPartitions) else identity
    def materialize(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
    // current contracted graph — kept SYMMETRIC throughout (relabeling
    // a symmetric edge set keeps it symmetric, so one relabel pass per
    // round suffices)
    var g = materialize(part(
      edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
        .unionByName(edges.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()))
    // global mapping id -> component-so-far; super-node ids are the min
    // of everything merged into them, so finished components carry the
    // component min by construction
    var mapping = materialize(g.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    var round = 0
    while (!g.isEmpty && round < maxIter) {
      // min over the closed neighborhood of each live super-node...
      val local = materialize(
        g.groupBy(col("src").as("id"))
          .agg(least(min(col("dst")), first(col("src"))).as("label")))
      // ...pointer-jumped so label chains shorten within the round
      val jumped = (1 to jumpsPerRound).foldLeft(local) { (cur, _) =>
        materialize(
          cur.join(cur.select(col("id").as("label"), col("label").as("ll")),
            Seq("label"), "left")
            .select(col("id"), coalesce(col("ll"), col("label")).as("label")))
      }
      // compose into the global mapping: label := jumped(label); nodes
      // whose super-node is absent this round are already finished
      mapping = materialize(
        mapping.join(jumped.select(col("id").as("label"), col("label").as("l2")),
          Seq("label"), "left")
          .select(col("id"), coalesce(col("l2"), col("label")).as("label")))
      // contract: rewrite edges through the new labels, drop self-loops
      g = materialize(
        g.join(jumped.select(col("id").as("src"), col("label").as("ls")), Seq("src"))
          .join(jumped.select(col("id").as("dst"), col("label").as("ld")), Seq("dst"))
          .filter(col("ls") =!= col("ld"))
          .select(col("ls").as("src"), col("ld").as("dst"))
          .distinct())
      round += 1
    }
    require(g.isEmpty,
      s"connected components did not converge in $maxIter rounds — raise maxIter")
    mapping.select(col("id"), col("label").as("component"))
  }
}
