package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label contraction — the operator that
  * turns a near-dup PAIR list into duplicate CLUSTERS (each doc mapped
  * to its cluster's smallest id, the canonical representative).
  *
  * Each round:
  *   1. every live node takes the min id over its closed neighborhood;
  *   2. the resulting label forest is pointer-jumped TO CLOSURE
  *      (label := label's label until nothing changes) — full pointer
  *      doubling, log(tree depth) jumps, so even a chain component
  *      collapses onto its root within the round (a FIXED jump count
  *      leaves chains shrinking by only a constant per round — linear,
  *      not logarithmic, rounds);
  *   3. finished rows (label no longer a live super-node) leave the
  *      loop for good — late rounds shuffle only the live graph;
  *   4. the graph is CONTRACTED: edges rewritten to (label(src),
  *      label(dst)), self-loops dropped. The loop ends when no edges
  *      remain, and a global (id → component) mapping accumulates the
  *      per-round merges.
  *
  * Two Spark-specific disciplines, both load-bearing at scale:
  *   - every per-round frontier is materialized (`localCheckpoint`) —
  *     unbounded lineage otherwise re-executes all prior rounds per
  *     action — and each round's scratch blocks are unpersisted at the
  *     round boundary, bounding BlockManager residency to ~two rounds'
  *     frontiers instead of leaving cleanup to nondeterministic GC;
  *   - each checkpointed plan is re-wrapped as a fresh `LogicalRDD`:
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
    * silently wrong. `numPartitions` lays out the EDGE LIST for the
    * loop (set small, e.g. 2-8, when the graph is metadata-scale next
    * to the corpus); in-loop shuffles follow
    * `spark.sql.shuffle.partitions` and rely on AQE coalescing. */
  def apply(edges: DataFrame, maxIter: Int = 50,
            numPartitions: Int = 0): DataFrame = {
    val part: DataFrame => DataFrame =
      if (numPartitions > 0) _.repartition(numPartitions) else identity

    // materialize = checkpoint + fresh-stats re-wrap; the caller files
    // the checkpoint under scratch (retired at the round boundary) or
    // pinned (backs a frame that outlives the round)
    var scratch = List.empty[DataFrame]
    var pinnedPrev = List.empty[DataFrame] // last round's g + mapping
    def materialize(df: DataFrame,
                    pin: Boolean = false): (DataFrame, DataFrame) = {
      val ck = df.localCheckpoint()
      if (!pin) scratch ::= ck
      (ck.sparkSession.createDataFrame(ck.rdd, ck.schema), ck)
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)

    var (g, gCk) = materialize(part(
      edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
        .unionByName(edges.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()), pin = true)
    // mapping rows still attached to a live super-node; finished rows
    // move to `done` and are never shuffled again (their checkpoints
    // stay pinned — the returned plan reads them). Seeded from the RAW
    // edge list, not g: a node whose only edges are self-loops (a,a)
    // has no row in g, but the contract promises every id appearing in
    // an edge — such nodes carry label=id and retire as singletons in
    // round 1 (their label joins nothing live).
    var (mapping, mappingCk) = materialize(
      edges.select(col("a").cast("long").as("id"))
        .unionByName(edges.select(col("b").cast("long").as("id")))
        .distinct().withColumn("label", col("id")),
      pin = true)
    var done = List.empty[DataFrame]
    var round = 0
    while (!g.isEmpty && round < maxIter) {
      // 1. min over the closed neighborhood of each live super-node
      val (local, _) = materialize(
        g.groupBy(col("src").as("id"))
          .agg(least(min(col("dst")), first(col("src"))).as("label")))
      // 2. pointer-jump to CLOSURE: each pass halves label-tree depth
      // (log(depth) passes); the label sum strictly decreases until the
      // forest is all stars
      var jumped = local
      var jSum = labelSum(jumped)
      var stable = false
      while (!stable) {
        val (j2, _) = materialize(
          jumped.join(jumped.select(col("id").as("label"), col("label").as("ll")),
            Seq("label"), "left")
            .select(col("id"), coalesce(col("ll"), col("label")).as("label")))
        val s2 = labelSum(j2)
        stable = s2.compareTo(jSum) == 0
        jSum = s2
        jumped = j2
      }
      // 3. compose into the global mapping; a label that is no longer a
      // live super-node id can never change again (contracted node sets
      // only shrink; components are id-disjoint), so those rows retire
      val (composed, _) = materialize(
        mapping.join(jumped.select(col("id").as("label"), col("label").as("l2")),
          Seq("label"), "left")
          .select(col("id"), col("l2"), col("label")))
      val (m2, m2Ck) = materialize(composed.filter(col("l2").isNotNull)
        .select(col("id"), col("l2").as("label")), pin = true)
      val (finished, _) = materialize(composed.filter(col("l2").isNull)
        .select(col("id"), col("label")), pin = true)
      if (!finished.isEmpty) done ::= finished
      // 4. contract: rewrite edges through the new labels, drop self-loops
      val (g2, g2Ck) = materialize(
        g.join(jumped.select(col("id").as("src"), col("label").as("ls")), Seq("src"))
          .join(jumped.select(col("id").as("dst"), col("label").as("ld")), Seq("dst"))
          .filter(col("ls") =!= col("ld"))
          .select(col("ls").as("src"), col("ld").as("dst"))
          .distinct(), pin = true)
      // retire this round's scratch and the superseded g/mapping
      (scratch ++ pinnedPrev).foreach(_.unpersist())
      scratch = Nil
      pinnedPrev = List(gCk, mappingCk)
      g = g2; gCk = g2Ck
      mapping = m2; mappingCk = m2Ck
      round += 1
    }
    require(g.isEmpty,
      s"connected components did not converge in $maxIter rounds — raise maxIter")
    (mapping :: done).reduce(_ unionByName _)
      .select(col("id"), col("label").as("component"))
  }
}
