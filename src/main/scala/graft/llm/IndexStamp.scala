package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.CatalogStats
import graft.sources.dsv2.{JsonlLayout, JsonlTable}

/** STALENESS DEFENSE for persisted ANN / LSH index tables.
  *
  * `writeIvfIndex` / `writeIvfPqIndex` / `writeLshIndex` persist
  * bucketed derivations of a corpus; an upsert wave or re-crawl on
  * that corpus would otherwise leave `ivfTopKIndexed` / `ivfPqTopK` /
  * `dedupAgainstIndex` silently answering from an index that no
  * longer describes the data. The fix is the discipline the engine
  * already applies to CBO stats and the z-order certificate: stamp
  * the CORPUS content fingerprint on the index table at build, verify
  * it at read, and REFUSE LOUDLY on mismatch — a wrong answer is
  * worse than an error naming the rebuild.
  *
  * The fingerprint is derived from the corpus frame's LEAF relations:
  *   - path-based file relations: file-set identity (name + length +
  *     mtime — [[CatalogStats.filesFingerprint]], the same channel the
  *     external-uniqueness registry uses);
  *   - graft catalog tables: [[JsonlLayout.statsFingerprint]] (shards
  *     + delete sidecars + pending equality keys — sidecar-content
  *     aware);
  *   - anything else (in-memory frames, views over literals): NO
  *     fingerprint — the index is stamped unverifiable and reads
  *     proceed as before (the caller owns the lifecycle of a corpus
  *     the engine cannot identify at rest).
  * Verification is metadata-scale: one listing per read, zero data
  * I/O. */
object IndexStamp {

  /** Table property carrying the corpus fingerprint. */
  val Prop = "graft.corpus.fingerprint"

  /** Content fingerprint of `corpus`'s at-rest sources; None when any
    * leaf is not an identifiable file-backed relation. */
  def corpusFingerprint(spark: SparkSession,
                        corpus: DataFrame): Option[String] = {
    // the ANALYZED plan (not optimized): V2ScanRelationPushDown turns
    // catalog relations into scan nodes whose table identity is gone
    val leaves = corpus.queryExecution.analyzed.collectLeaves()
    val perLeaf: Seq[Option[Seq[String]]] = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.rootPaths.map(_.toString))
        case _ => None
      }
      case r: DataSourceV2Relation => r.table match {
        case t: JsonlTable => Some(Seq("graft:" + t.tableDir))
        case _ => None
      }
      case _ => None
    }
    if (perLeaf.isEmpty || perLeaf.exists(_.isEmpty)) return None
    val conf = spark.sessionState.newHadoopConf()
    val parts = perLeaf.flatten.flatten.distinct.sorted.map { root =>
      if (root.startsWith("graft:")) {
        val p = new org.apache.hadoop.fs.Path(root.stripPrefix("graft:"))
        "g:" + JsonlLayout.statsFingerprint(p.getFileSystem(conf), p)
      } else "f:" + CatalogStats.filesFingerprint(spark, Seq(root))
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(s => md.update(s.getBytes("UTF-8")))
    Some(md.digest().map("%02x".format(_)).mkString)
  }

  /** Stamp `table` with the corpus fingerprint derived from the frame
    * that was (or is about to be) written. A fingerprint-less corpus
    * stamps nothing — reads then skip verification. */
  def stamp(spark: SparkSession, table: String, written: DataFrame): Unit =
    corpusFingerprint(spark, written).foreach { fp =>
      spark.sql(
        s"ALTER TABLE $table SET TBLPROPERTIES ('$Prop' = '$fp')")
    }

  /** Refuse loudly when `table` carries a stamp and the CURRENT corpus
    * fingerprint differs. Unverifiable sides (no stamp on the table,
    * or a corpus with no at-rest identity) pass through — back-compat
    * with indexes built before stamping and with in-memory corpora. */
  def verify(spark: SparkSession, table: String, corpus: DataFrame,
             what: String): Unit = {
    val stamped = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .find(_.getString(0) == Prop).map(_.getString(1))
    for {
      st <- stamped
      cur <- corpusFingerprint(spark, corpus)
      if st != cur
    } throw new IllegalStateException(
      s"$what: index table '$table' is STALE — the corpus content " +
        "fingerprint moved since the index was built (an upsert wave, " +
        "re-crawl, compaction, or overwrite changed the at-rest data). " +
        "Answering from this index would silently miss or misrank the " +
        "changed documents. Rebuild it (writeIvfIndex / writeIvfPqIndex " +
        "/ writeLshIndex over the current corpus) or probe the corpus " +
        "version the index covers.")
  }
}
