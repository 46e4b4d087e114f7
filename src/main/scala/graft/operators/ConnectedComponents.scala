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
  * Three Spark-specific disciplines, all load-bearing at scale:
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
  *     work. Fresh leaves reset the estimate each round;
  *   - the loop runs in a CHILD SparkSession (same SparkContext, own
  *     SQLConf) with AQE off and a small fixed shuffle width: the loop
  *     is dozens of sub-100ms actions on a metadata-scale graph, and
  *     AQE turns each into one job PER QUERY STAGE plus a driver-side
  *     re-optimization per stage — measured 159 jobs / ~5s of driver
  *     latency for a 3-round run at sf0.1 versus ~40 jobs without.
  *     AQE earns its overhead on big one-shot shuffles, not on an
  *     iterative loop over frames the driver already knows are tiny;
  *     the caller's session (and its AQE) is untouched.
  */
object ConnectedComponents {

  /** `edges(a, b)` undirected; returns `(id, component)` for every id
    * appearing in an edge, `component` = min id reachable. Throws if
    * `maxIter` contraction rounds don't drain the edge set — never
    * silently wrong. `numPartitions` sizes the loop's frames AND its
    * shuffles (set small, e.g. 2-8, when the graph is metadata-scale
    * next to the corpus; 0 = inherit the session's shuffle width).
    *
    * `broadcastNodeLimit`: live-label frames at or below this row count
    * broadcast in the loop joins (g and mapping then never shuffle in a
    * round). `localSolveEdgeLimit`: once the contracted edge set fits
    * under it, the run finishes with a driver-side union-find (one
    * collect — the same volume a single broadcast ships — instead of
    * more rounds of job latency); 0 forces the fully distributed path
    * (the specs use it to exercise the loop). The default (1M edges)
    * collects ~1M Rows plus an endpoint map on the driver — order
    * 100 MB; raise it only with driver memory to match. */
  def apply(edges: DataFrame, maxIter: Int = 50,
            numPartitions: Int = 0,
            broadcastNodeLimit: Long = 4L << 20,
            localSolveEdgeLimit: Long = 1L << 20): DataFrame = {
    val part: DataFrame => DataFrame =
      if (numPartitions > 0) _.repartition(numPartitions) else identity
    // tuned child session for the loop body (see scaladoc)
    val sess = edges.sparkSession.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    if (numPartitions > 0)
      sess.conf.set("spark.sql.shuffle.partitions", numPartitions.toString)

    // materialize = checkpoint + fresh-stats re-wrap; the caller files
    // the checkpoint under scratch (retired at the round boundary) or
    // pinned (lives until the returned plan is done — the per-round
    // `composed` frames back both the live mapping and the retired
    // rows, so they are never safe to drop mid-run; total pinned rows
    // telescope to <= 2n across all rounds)
    var scratch = List.empty[DataFrame]
    var prevGCk: Option[DataFrame] = None
    def materialize(df: DataFrame,
                    pin: Boolean = false): (DataFrame, DataFrame) = {
      val ck = df.localCheckpoint()
      if (!pin) scratch ::= ck
      // fresh leaf in the TUNED session: the input edge plan executes
      // once under the caller's session (with its AQE), everything
      // downstream of a checkpoint under the loop conf
      (sess.createDataFrame(ck.rdd, ck.schema), ck)
    }
    // (label sum, row count) in ONE job: the sum drives jump-closure
    // detection, the count drives the broadcast decision below
    def labelStats(df: DataFrame): (java.math.BigDecimal, Long) = {
      val r = df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)), count(lit(1))).head()
      (r.getDecimal(0), r.getLong(1))
    }
    // Every loop join has the current label frame (`local`/`jumped`) on
    // one side — when the driver-known live-node count fits a broadcast,
    // hint it: g and mapping (the big frames) then never shuffle inside
    // a round. Above the limit the joins stay shuffled — correct at any
    // graph size; this is AQE's broadcast conversion, decided once per
    // round from loop-local knowledge instead of per-stage re-planning.
    var liveNodes = Long.MaxValue
    def bcast(df: DataFrame): DataFrame =
      if (liveNodes <= broadcastNodeLimit) broadcast(df) else df

    // ONE evaluation of the (often expensive) edge plan; g and the
    // initial mapping both derive from this checkpoint. Self-loops are
    // kept here and dropped only in g: a node whose only edges are
    // (a, a) must still appear in the output (as a singleton — it has
    // no row in any `jumped`, so it retires in round 1), per the
    // every-id-in-an-edge contract.
    val (raw, rawCk) = materialize(part(
      edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
        .unionByName(edges.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
        .distinct()), pin = true)
    var (g, gCk) = materialize(raw.filter(col("src") =!= col("dst")), pin = true)
    // mapping rows still attached to a live super-node; finished rows
    // move to `done` and are never shuffled again. Both are LAZY views
    // over the current round's pinned `composed` checkpoint — giving
    // them their own checkpoints would be two more jobs per round of
    // pure launch latency on a metadata-scale loop.
    var mapping = raw.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var done = List.empty[DataFrame]
    var round = 0
    var liveEdges = countEdges(g)
    while (liveEdges > localSolveEdgeLimit && round < maxIter) {
      // 1. min over the closed neighborhood of each live super-node
      val (local, _) = materialize(
        g.groupBy(col("src").as("id"))
          .agg(least(min(col("dst")), first(col("src"))).as("label")))
      // 2. pointer-jump to CLOSURE: each pass halves label-tree depth
      // (log(depth) passes); the label sum strictly decreases until the
      // forest is all stars
      var jumped = local
      var (jSum, n) = labelStats(jumped)
      liveNodes = n
      var stable = false
      while (!stable) {
        val (j2, _) = materialize(
          jumped.join(bcast(jumped.select(col("id").as("label"), col("label").as("ll"))),
            Seq("label"), "left")
            .select(col("id"), coalesce(col("ll"), col("label")).as("label")))
        val (s2, _) = labelStats(j2)
        stable = s2.compareTo(jSum) == 0
        jSum = s2
        jumped = j2
      }
      // 3. compose into the global mapping; a label that is no longer a
      // live super-node id can never change again (contracted node sets
      // only shrink; components are id-disjoint), so those rows retire
      // into `done` as a lazy filter of this round's checkpoint
      val (composed, _) = materialize(
        mapping.join(bcast(jumped.select(col("id").as("label"), col("label").as("l2"))),
          Seq("label"), "left")
          .select(col("id"), col("l2"), col("label")), pin = true)
      done ::= composed.filter(col("l2").isNull).select(col("id"), col("label"))
      // 4. contract: rewrite edges through the new labels, drop self-loops
      val (g2, g2Ck) = materialize(
        g.join(bcast(jumped.select(col("id").as("src"), col("label").as("ls"))), Seq("src"))
          .join(bcast(jumped.select(col("id").as("dst"), col("label").as("ld"))), Seq("dst"))
          .filter(col("ls") =!= col("ld"))
          .select(col("ls").as("src"), col("ld").as("dst"))
          .distinct(), pin = true)
      // retire this round's scratch, the superseded g, and (after the
      // first composed exists) the raw edge checkpoint
      if (round == 0) scratch ::= rawCk
      (scratch ++ prevGCk).foreach(_.unpersist())
      scratch = Nil
      prevGCk = Some(gCk)
      g = g2; gCk = g2Ck
      mapping = composed.filter(col("l2").isNotNull)
        .select(col("id"), col("l2").as("label"))
      round += 1
      liveEdges = countEdges(g)
    }
    require(liveEdges <= localSolveEdgeLimit,
      s"connected components did not converge in $maxIter rounds — raise maxIter")
    // END-GAME: the contracted graph fits the driver — finish with one
    // union-find instead of more O(log n) rounds of job latency. This
    // is the same data volume the broadcast joins above already ship to
    // the driver per round, condensed into one collect + one broadcast
    // join back onto the mapping. The contraction loop's job at corpus
    // scale is precisely to shrink the graph to this point.
    if (liveEdges > 0) {
      val sol = unionFindMin(g.select(col("src"), col("dst")).collect().iterator
        .map(r => (r.getLong(0), r.getLong(1))))
      val solDf = sess.createDataFrame(sol.toSeq).toDF("label", "l2")
      mapping = mapping.join(broadcast(solDf), Seq("label"), "left")
        .select(col("id"), coalesce(col("l2"), col("label")).as("label"))
    }
    (mapping :: done).reduce(_ unionByName _)
      .select(col("id"), col("label").as("component"))
  }

  private def countEdges(g: DataFrame): Long = g.count()

  /** Driver-side union-find with path compression; roots are the
    * minimum id of each set (union always attaches the larger root
    * under the smaller), so the returned (id -> component) matches the
    * distributed min-label semantics exactly. */
  private[operators] def unionFindMin(edges: Iterator[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(k => k -> find(k)).toMap
  }
}
