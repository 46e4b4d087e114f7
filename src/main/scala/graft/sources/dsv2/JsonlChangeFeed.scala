package graft.sources.dsv2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Row-level CHANGES between two snapshots of a `graft-jsonl` catalog
  * table — "what entered/left the corpus between tagged runs", the
  * question a training team asks of a versioned corpus — computed
  * from the MANIFEST DIFF, not a data diff:
  *
  *   - shards in `to` but not `from` → their live rows are INSERTS;
  *   - shards in `from` but not `to` → their rows (as `from` pinned
  *     them) are DELETES;
  *   - shards in both whose embedded delete-ordinal sets grew →
  *     exactly the rows AT the new ordinals are DELETES (merge-on-read
  *     deletes between the snapshots, recovered by position via the
  *     `_pos` metadata column — no row comparison anywhere).
  *
  * So the scan reads ONLY the shards that changed (the diff prunes at
  * the manifest, before any I/O — a one-batch day on a 100 TB corpus
  * reads one batch, not two full versions), and the ordinal-delta
  * rows are recovered with a broadcast semi-join on (`_shard`,
  * `_pos`) against the delta pairs the manifests already hold
  * (driver-held by the same O(deletes) contract as the manifest
  * itself).
  *
  * A COPY-ON-WRITE rewrite between the snapshots retires whole shards
  * and lands replacements, so shard-grain CDC honestly reports every
  * row of a rewritten group as delete + insert — `net = true`
  * cancels those pairs (`exceptAll` over just the changed-shard rows,
  * never the table), leaving the true row-level delta regardless of
  * the table's row-level mode.
  *
  * Output: the table's columns plus `_change` ('insert' | 'delete').
  * Reads go through the ordinary `VERSION AS OF` scans, so pinned
  * ordinals, retained-shard resolution, and the schema as of each
  * snapshot all apply; an ADD COLUMN between the snapshots surfaces
  * as nulls on the `from` side (`unionByName(allowMissingColumns)`).
  *
  * The metadata-only shard-grain summary of the same diff is
  * `CALL <cat>.system.table_changes('ns.t', from, to)`. */
object JsonlChangeFeed {

  /** The shard-grain manifest diff: (added, removed, common-shard
    * delta-delete pairs rel → GROWN ordinals, delta-restore pairs
    * rel → SHRUNK ordinals). A shrunk ordinal set means rows came
    * BACK — `CALL rollback_to_snapshot` rebuilds sidecars from an
    * older manifest's embedded ordinals — and the feed reports them
    * as inserts, or a CDC replay would lose the resurrection. */
  final case class Diff(added: Set[String], removed: Set[String],
                        deltaDeletes: Map[String, Array[Long]],
                        deltaRestores: Map[String, Array[Long]])

  def diff(m1: JsonlSnapshots.Manifest,
           m2: JsonlSnapshots.Manifest): Diff = {
    val added = m2.shards.keySet -- m1.shards.keySet
    val removed = m1.shards.keySet -- m2.shards.keySet
    val common = (m1.shards.keySet & m2.shards.keySet).toSeq
    val delta = common.iterator.flatMap { rel =>
      val d1 = m1.shards(rel).deletes.toSet
      val fresh = m2.shards(rel).deletes.filterNot(d1)
      if (fresh.isEmpty) None else Some(rel -> fresh)
    }.toMap
    val restores = common.iterator.flatMap { rel =>
      val d2 = m2.shards(rel).deletes.toSet
      val back = m1.shards(rel).deletes.filterNot(d2)
      if (back.isEmpty) None else Some(rel -> back)
    }.toMap
    Diff(added, removed, delta, restores)
  }

  /** Re-type a ONE-WINDOW change set (insert/delete rows from
    * [[between]], or one streaming micro-batch of
    * [[JsonlChangesSource]]) into Delta-CDF-style semantics using the
    * table's logical key — the transform that makes CDC-apply correct
    * over a COPY-ON-WRITE upstream:
    *
    *   - rewrite churn (an identical row on both sides — COW re-lands
    *     untouched rows of a rewritten group) CANCELS (multiset-exact
    *     `exceptAll`, over the window's rows only);
    *   - a key present on BOTH remaining sides is an update:
    *     `update_preimage` (the old values) + `update_postimage` (the
    *     new values);
    *   - the rest stay `insert` / `delete`.
    *
    * A keyed MERGE apply then feeds on `_change != 'update_preimage'`
    * and sees EXACTLY ONE source row per key — no cardinality
    * violation, no corrupted mirror. Requires the key to be unique
    * per side within the window (the same premise the MERGE itself
    * needs); a multi-version window nets intermediate states first
    * ([[between]] endpoints, or `maxVersionsPerBatch` netting). */
  def typeChanges(changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "typeChanges needs at least one key column")
    val cols = changes.columns.filterNot(_ == "_change").toSeq
    import org.apache.spark.sql.functions.{abs, array, explode, struct, sum, when}
    // ONE netting aggregate replaces the former pair of `exceptAll`s:
    // per row identity, net = inserts − deletes; |net| surviving copies
    // land on the winning side — exactly exceptAll's multiset
    // difference on each side (del.exceptAll(ins) keeps max(cd−ci, 0)
    // copies ⇔ net < 0 here; symmetric for inserts), but the window's
    // rows are scanned ONCE instead of once per exceptAll per side.
    val netted = changes.groupBy(cols.map(col): _*)
      .agg(sum(when(col("_change") === "insert", 1L).otherwise(0L)).as("__ci"),
        sum(when(col("_change") === "delete", 1L).otherwise(0L)).as("__cd"))
      .withColumn("__net", col("__ci") - col("__cd"))
      .where(col("__net") =!= 0L)
      // restore multiset multiplicity (a row net-inserted twice emits
      // twice); |net| is 1 in every keyed-window case but the generic
      // contract is bag-exact
      .withColumn("__rep", explode(
        org.apache.spark.sql.functions.sequence(lit(1L), abs(col("__net")))))
      .select((cols.map(col) :+ col("__net")): _*)
    val d = netted.where(col("__net") < 0L).drop("__net")
      .withColumn("_d", lit(1)).alias("d")
    val i = netted.where(col("__net") > 0L).drop("__net")
      .withColumn("_i", lit(1)).alias("i")
    val cond = keyCols.map(k => col(s"d.$k") <=> col(s"i.$k")).reduce(_ && _)
    val j = d.join(i, cond, "full_outer")
    val both = col("d._d") === 1 && col("i._i") === 1
    def side(p: String, change: String) = struct(
      (cols.map(c => col(s"$p.$c").as(c)) :+ lit(change).as("_change")): _*)
    // ONE explode emits the 1–2 output rows per joined row — the former
    // four filter branches each re-evaluated the join (and everything
    // under it: the change-feed scans ran 4x per side per invocation)
    j.select(explode(
      when(both, array(side("d", "update_preimage"), side("i", "update_postimage")))
        .when(col("d._d").isNull, array(side("i", "insert")))
        .otherwise(array(side("d", "delete")))).as("__r"))
      .select(col("__r.*"))
  }

  /** Rows inserted/deleted between snapshot `from` and snapshot `to`
    * (or the LIVE state when `to` is None). `net = true` cancels
    * rewrite-identical delete+insert pairs (COW churn); `keyCols`
    * additionally pairs cross-side keys into
    * update_preimage/update_postimage ([[typeChanges]]). */
  def between(spark: SparkSession, catalog: GraftCatalog, tableName: String,
              from: String, to: Option[String] = None,
              net: Boolean = false,
              keyCols: Seq[String] = Nil): DataFrame = {
    if (keyCols.nonEmpty)
      return typeChanges(
        between(spark, catalog, tableName, from, to, net = false), keyCols)
    val (fs, table) = catalog.resolveTableDir(tableName)
    // interpolated identifiers/literals are ESCAPED: a tag holding a
    // quote (or a table part holding a backtick) must stay data, not
    // become SQL
    def ident(p: String): String = "`" + p.replace("`", "``") + "`"
    def strLit(v: String): String = "'" + v.replace("'", "''") + "'"
    val ref = (catalog.name +: tableName.split("\\.").toSeq)
      .map(ident).mkString(".")
    val m2 = to.map(JsonlSnapshots.load(fs, table, _)).getOrElse {
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
        tableName.split("\\.").init, tableName.split("\\.").last)
      JsonlSnapshots.current(fs, table, catalog.loadTable(ident).schema())
    }
    // from = "0" is the EMPTY pre-history endpoint (the streaming
    // source's fromVersion=0): the whole `to` content replays as
    // inserts — the window chain 0→v1→…→vN then reconstructs any
    // version by replay
    val m1 =
      if (from == "0")
        JsonlSnapshots.Manifest(0L, None, 0L, m2.schemaJson, Map.empty)
      else JsonlSnapshots.load(fs, table, from)
    require(m2.id < 0 || m1.id <= m2.id,
      s"table_changes: from=v${m1.id} is newer than to=v${m2.id} — " +
        "swap the endpoints (the feed is forward-only)")
    val d = diff(m1, m2)
    // the _shard value a reader injects is the RESOLVED location
    // (live, or _snapshots/retained/ for shards a rewrite retired)
    def qualify(rel: String): String =
      fs.makeQualified(JsonlSnapshots.resolve(fs, table, rel)).toString
    def read(version: Option[String]): DataFrame = version match {
      case Some(v) =>
        spark.sql(s"SELECT _shard, _pos, * FROM $ref VERSION AS OF ${strLit(v)}")
      case None => spark.sql(s"SELECT _shard, _pos, * FROM $ref")
    }
    val toRead = read(to)
    val fromRead =
      if (m1.id == 0L) toRead.where(lit(false)) // empty pre-history
      else read(Some(from))
    // ordinal-delta RESTORES (rollback shrank a sidecar): the rows at
    // the shrunk ordinals are live again — present exactly once in the
    // to-side read, recovered positionally like the deletes below
    val restoredRows =
      if (d.deltaRestores.isEmpty) toRead.where(lit(false))
      else {
        val pairs = d.deltaRestores.toSeq.flatMap { case (rel, ords) =>
          val q = qualify(rel); ords.map(o => (q, o))
        }
        import spark.implicits._
        toRead.join(broadcast(pairs.toDF("_shard", "_pos")),
          Seq("_shard", "_pos"), "left_semi")
      }
    val inserted = toRead
      .where(col("_shard").isin(d.added.toSeq.map(qualify): _*))
      .unionByName(restoredRows)
    val removedRows = fromRead
      .where(col("_shard").isin(d.removed.toSeq.map(qualify): _*))
    val deltaRows =
      if (d.deltaDeletes.isEmpty)
        fromRead.where(lit(false))
      else {
        // the from-side read EXCLUDES m1's ordinals, so the rows at
        // the delta ordinals are present exactly once — a broadcast
        // semi-join on the row id recovers them without comparing rows
        val pairs = d.deltaDeletes.toSeq.flatMap { case (rel, ords) =>
          val q = qualify(rel); ords.map(o => (q, o))
        }
        import spark.implicits._
        fromRead.join(
          broadcast(pairs.toDF("_shard", "_pos")),
          Seq("_shard", "_pos"), "left_semi")
      }
    // equality-delete windows ([[JsonlEqDeletes]]): rows the window's
    // NEW waves hid are the upsert's delete records (the preimage
    // side). Recovered from the from-side read — which is already
    // m1-equality-aware, so pre-window-hidden rows can't re-emit — by
    // a broadcast join against the fresh key files' keys, restricted
    // to COMMON shards whose stamp the fresh sequences outrank. The
    // key set is driver-small by the eq-tier's contract (bounded by
    // compaction cadence); the join broadcasts it, never the corpus.
    val eqNewNames = m2.eqFiles.filterNot(m1.eqFiles.toSet)
    val eqCommon = (m1.shards.keySet & m2.shards.keySet).toSeq
    val eqDeltaRows =
      if (eqNewNames.isEmpty || eqCommon.isEmpty) fromRead.where(lit(false))
      else {
        import org.apache.spark.sql.functions.{coalesce, regexp_extract}
        val (freshMap, _, eqCols) = JsonlEqDeletes.indexFiles(fs,
          eqNewNames.map(JsonlSnapshots.resolveEq(fs, table, _)))
        val dts = eqCols.map(c => m2.schema(c).dataType)
        val keyRows = freshMap.toSeq.map { case (k, sq) =>
          org.apache.spark.sql.Row.fromSeq(
            JsonlEqDeletes.parseRendered(k, dts) :+ sq)
        }
        val keySchema = org.apache.spark.sql.types.StructType(
          eqCols.zip(dts).map { case (c, dt) =>
            org.apache.spark.sql.types.StructField(s"_eqk_$c", dt) } :+
            org.apache.spark.sql.types.StructField("_eqseq",
              org.apache.spark.sql.types.LongType, nullable = false))
        val keysDf = spark.createDataFrame(
          new java.util.ArrayList(
            scala.jdk.CollectionConverters.SeqHasAsJava(keyRows).asJava),
          keySchema)
        val stampCol = coalesce(
          regexp_extract(col("_shard"), "-eqs(\\d+)\\.(?:jsonl|parquet)", 1)
            .cast("long"), lit(0L))
        val cond = eqCols.map(c => col(c) <=> col(s"_eqk_$c")).reduce(_ && _)
        // rows MOR-deleted IN-WINDOW already emit through deltaRows —
        // exclude their (shard, pos) ids here or a key both
        // positionally deleted and re-upserted in one window would
        // emit its delete twice (the partition path passes both
        // endpoints' ordinals to its emit partitions for the same
        // reason)
        val fromCommon0 = fromRead
          .where(col("_shard").isin(eqCommon.map(qualify): _*))
        val fromCommon =
          if (d.deltaDeletes.isEmpty) fromCommon0
          else {
            val exPairs = d.deltaDeletes.toSeq.flatMap { case (rel, ords) =>
              val q = qualify(rel); ords.map(o => (q, o))
            }
            import spark.implicits._
            fromCommon0.join(broadcast(exPairs.toDF("_shard", "_pos")),
              Seq("_shard", "_pos"), "left_anti")
          }
        fromCommon
          .join(broadcast(keysDf), cond, "inner")
          .where(stampCol < col("_eqseq"))
          .drop(keySchema.fieldNames.toSeq: _*)
      }
    val ins = inserted.drop("_shard", "_pos")
    val del = removedRows.drop("_shard", "_pos")
      .unionByName(deltaRows.drop("_shard", "_pos"))
      .unionByName(eqDeltaRows.drop("_shard", "_pos"))
    val (insOut, delOut) =
      if (!net) (ins, del)
      else {
        // COW rewrites produce identical rows on both sides; exceptAll
        // is multiset-exact, and it runs over changed-shard rows only.
        // Project the delete side through the to-side schema first
        // (an ADD COLUMN between snapshots otherwise defeats the match
        // by arity).
        val delAligned = del.unionByName(ins.where(lit(false)),
          allowMissingColumns = true).select(ins.columns.map(col): _*)
        (ins.exceptAll(delAligned), delAligned.exceptAll(ins))
      }
    insOut.withColumn("_change", lit("insert"))
      .unionByName(delOut.withColumn("_change", lit("delete")),
        allowMissingColumns = true)
  }

  /** The STREAMING face: tail the table's snapshots — each micro-batch
    * is one (or more) snapshot's manifest diff, `CALL snapshot` is the
    * publish point. `startVersion` = resume point (0 replays full
    * history). See [[JsonlChangesSource]]. */
  def stream(spark: SparkSession, catalog: GraftCatalog, tableName: String,
             startVersion: Long = 0L): DataFrame = {
    val (_, table) = catalog.resolveTableDir(tableName)
    spark.readStream.format("graft-jsonl-changes")
      .option("startVersion", startVersion)
      .load(table.toString)
  }
}
