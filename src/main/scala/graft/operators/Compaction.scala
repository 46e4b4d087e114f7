package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Small-file compaction for partitioned parquet tables.
  *
  * Incremental micro-batch publishing (the reference's 5-minute cron)
  * accretes many small files per partition; at 100 TB the scan's task
  * scheduling and footer reads start to dominate. Compaction rewrites
  * each affected partition into ceil(bytes / targetBytes) files and
  * swaps it atomically — content identical, file count bounded.
  */
object Compaction {

  /** File count + bytes per partition directory (the decision input). */
  def partitionStats(spark: SparkSession, path: String,
                     partitionCol: String): Seq[(String, Int, Long)] = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .map { d =>
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        (d.getPath.getName, files.length, files.map(_.getLen).sum)
      }
  }

  /** Compact every partition whose file count exceeds `maxFiles`.
    * Returns the partitions rewritten. */
  def compact(spark: SparkSession, path: String, partitionCol: String,
              maxFiles: Int = 8, targetBytes: Long = 128L << 20): Seq[String] = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val todo = partitionStats(spark, path, partitionCol)
      .filter(_._2 > maxFiles)
    val staging = new Path(path + "__compact_staging")
    val trash = new Path(path + "__compact_trash")
    // leftovers mean a previous run crashed mid-swap and the trash may
    // hold the ONLY copy of a partition — never auto-delete; demand
    // manual recovery first
    require(!fs.exists(trash) && !fs.exists(staging),
      s"$trash or $staging exists: a previous compaction crashed mid-swap; " +
        "recover (move trash contents back) before compacting again")
    def renameOrFail(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"rename $from -> $to failed")
    todo.foreach { case (dirName, _, bytes) =>
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val src = new Path(path, dirName)
      // staging lives OUTSIDE the table root: a reader scanning the
      // table mid-compaction must never discover the staged copy as an
      // extra partition
      val tmp = new Path(staging, dirName)
      // partition dirs don't carry the partition column in the files;
      // rewrite the directory contents only — content-identical swap
      spark.read.parquet(src.toString)
        .repartition(nOut)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.listStatus(tmp).filter(_.getPath.getName.startsWith("_"))
        .foreach(s => fs.delete(s.getPath, false))
      // swap = two renames, never a delete of live data: a crash
      // between them leaves the original recoverable under
      // __compact_trash (and the staged copy under __compact_staging —
      // both cleaned only at the END of a SUCCESSFUL run)
      fs.mkdirs(trash)
      renameOrFail(src, new Path(trash, dirName))
      renameOrFail(tmp, src)
    }
    fs.delete(staging, true)
    fs.delete(trash, true)
    todo.map(_._1)
  }
}
