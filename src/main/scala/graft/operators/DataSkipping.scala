package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** File-level min/max data skipping — the metadata half of the
  * [[ZOrder]] story (Delta calls the pair OPTIMIZE ZORDER + data
  * skipping): a tiny per-file stats index, consulted before the scan,
  * so a selective predicate reads only the files whose [min, max]
  * ranges can match.
  *
  * Parquet row-group pruning already skips WITHIN each opened file;
  * this skips the file OPEN itself. At 100 TB with object storage
  * that difference is the query: a day-range probe over a
  * time-clustered table touches the handful of files whose ranges
  * overlap, not every footer of a million-object prefix.
  *
  * The index is file-count-sized (metadata scale) and is built with
  * one aggregation over the `_metadata.file_path` pseudo-column — no
  * extra scan column, no footer round-trips at query time.
  *
  * Staleness is handled conservatively: files present in the table
  * but ABSENT from the index are always read (a compaction or append
  * since the last [[writeIndex]] can only cost skipping, never
  * correctness). Files in the index but gone from the table are
  * ignored.
  */
object DataSkipping {

  /** Per-file stats for `cols` of the parquet table at `path`:
    * (file, n_rows, <c>_min, <c>_max per col). One scan, one
    * file-count-sized aggregate. */
  def buildIndex(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val t = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    t.select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize the index beside the table (`<path>__stats`),
    * atomically via [[graft.warehouse.VersionedTable]] so readers
    * never see a half-written index. */
  def writeIndex(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    graft.warehouse.VersionedTable.publish(spark, indexPath(path),
      buildIndex(spark, path, cols).coalesce(1))
    ()
  }

  /** Scan `path` reading ONLY files whose [`col`_min, `col`_max] range
    * overlaps [lo, hi] — plus any file the index has never seen
    * (conservative on staleness). The returned frame still carries
    * the `col BETWEEN lo AND hi` filter, so results are exactly a
    * filtered full scan; the index only prunes I/O. */
  def readPruned(spark: SparkSession, path: String, c: String,
                 lo: Any, hi: Any): DataFrame = {
    val idx = graft.warehouse.VersionedTable.read(spark, indexPath(path))
    val all = spark.read.parquet(path)
    // live file set from the DRIVER-side file index (no Spark job, no
    // footer opens — enumerating via a _metadata scan would cost the
    // very footer round-trips this operator exists to skip); index
    // entries came from _metadata.file_path which spells an empty
    // authority as "file:/x" while inputFiles spells it "file:///x" —
    // compare on (scheme, authority, path), not the raw string
    def norm(s: String): String = {
      val u = new Path(s).toUri
      Seq(Option(u.getScheme).getOrElse(""),
        Option(u.getAuthority).getOrElse(""), u.getPath).mkString("|")
    }
    val current = all.inputFiles.toSeq
    val indexed = idx.select(col("file")).collect()
      .map(r => norm(r.getString(0))).toSet
    val matching = idx
      .filter(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
      .select(col("file")).collect().map(r => norm(r.getString(0))).toSet
    val files = current.filter(f => !indexed.contains(norm(f)) || matching.contains(norm(f)))
    val pruned =
      if (files.isEmpty)
        // empty relation with the right schema
        all.filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(files.toSeq: _*)
    pruned.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  private def indexPath(path: String): String = path + "__stats"
}
