package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileContext, Options, Path}
import java.nio.charset.StandardCharsets

/** Versioned table with a pointer-file commit — the metadata-pointer
  * idea of Delta/Iceberg reduced to its smallest useful form.
  *
  * Layout: `<root>/v=N/` holds an immutable complete snapshot;
  * `<root>/_LATEST` holds the digits of the current version. A publish
  * writes the NEW snapshot directory in full (pure addition — no live
  * data is touched), then commits by swapping the one small pointer
  * file. Readers resolve the pointer first and then only ever read an
  * immutable directory, so they get snapshot isolation for free: a
  * reader that resolved v=3 keeps a consistent view while v=4 lands.
  *
  * This closes the gap [[graft.operators.MergeUpsert]] documents for
  * raw object stores: directory RENAME is copy-then-delete on S3/GCS
  * (a crash mid-rename exposes a torn partition), but this scheme
  * renames no data at all — data writes only CREATE new objects, and
  * the commit is a single small-object swap (atomic-visibility PUT on
  * object stores; `FileContext.rename(OVERWRITE)` = atomic POSIX
  * rename on HDFS/local). A crash before the pointer swap leaves
  * invisible garbage, never a torn table; [[vacuum]] retires it.
  *
  * Single writer at a time (as with the reference's BigQuery load
  * jobs); readers are unlimited and never locked out.
  *
  * At 100 TB a full-snapshot version suits dimension/config tables
  * and periodic gold publishes; for fact MERGE at scale, partition
  * swap ([[graft.operators.MergeUpsert.intoPartitionedPath]]) remains
  * the write path — on HDFS-like stores directly, or fronted by this
  * pointer when the store lacks atomic rename.
  *
  * Merge-on-read boundary: a `graft-jsonl` table in merge-on-read
  * mode ([[graft.sources.dsv2.JsonlDeletes]]) keeps live mutable
  * delete sidecars — that state is NOT versioned here and never ships
  * into a snapshot. To version a MOR table, materialize a READ of it
  * (deletes applied) through [[publish]]; the snapshot is then
  * self-contained parquet with no sidecar dependency.
  *
  * Reference behavior mirrored: the reference replaces whole BigQuery
  * tables per load (dags/utils/common/data_helper.py:60-74,
  * WRITE_TRUNCATE) with no history; this keeps the replace semantics
  * and adds readable history + crash-safety.
  */
object VersionedTable {

  private val Latest = "_LATEST"

  /** Publish `df` as the next version; returns the committed version.
    * The snapshot directory is fully written (and its _SUCCESS marker
    * with it) BEFORE the pointer moves — the commit point is the
    * pointer swap alone. */
  def publish(spark: SparkSession, root: String, df: DataFrame,
              partitionCols: Seq[String] = Nil): Long = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = currentVersion(spark, root).getOrElse(-1L) + 1L
    val dir = versionDir(root, next)
    require(!fs.exists(dir), s"version directory $dir already exists " +
      "(concurrent writer? vacuum the orphan first)")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir.toString)
    commitPointer(spark, root, next)
    next
  }

  /** Current committed version, if any table exists at `root`. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, Latest)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 256, false)
        out.toByteArray
      } finally in.close()
      Some(new String(bytes, StandardCharsets.UTF_8).trim.toLong)
    }
  }

  /** Read the current snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root,
      currentVersion(spark, root).getOrElse(
        throw new IllegalArgumentException(s"no committed version under $root")))

  /** Time travel: read snapshot `v` (must not have been vacuumed). */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = versionDir(root, v)
    require(fs.exists(dir), s"version $v of $root does not exist (vacuumed?)")
    spark.read.parquet(dir.toString)
  }

  /** All committed (readable) versions, ascending: version directories
    * at or below the pointer. Directories above the pointer are
    * in-flight or dead writes, not history. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentVersion(spark, root)
    if (!fs.exists(new Path(root)) || cur.isEmpty) Nil
    else fs.listStatus(new Path(root))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case VersionDir(d) => d.toLong }
      .filter(_ <= cur.get)
      .sorted.toSeq
  }

  /** CDC between two snapshots keyed by `pks`: one row per changed
    * key with op ∈ insert | update | delete. A single full-outer
    * equi-join on the key — shuffles both snapshots once; at scale
    * the snapshots share a partitioned layout so AQE keeps it
    * local. `update` compares the non-key columns structurally
    * (null-safe). */
  def diff(spark: SparkSession, root: String, fromV: Long, toV: Long,
           pks: Seq[String]): DataFrame = {
    val before = readVersion(spark, root, fromV)
    val after = readVersion(spark, root, toV)
    val rest = before.columns.filterNot(pks.contains).toSeq
    val b = before.select(
      pks.map(col) :+ struct(rest.map(col): _*).as("__b"): _*)
    val a = after.select(
      pks.map(col) :+ struct(rest.map(col): _*).as("__a"): _*)
    b.join(a, pks, "full_outer")
      .withColumn("op",
        when(col("__b").isNull, lit("insert"))
          .when(col("__a").isNull, lit("delete"))
          .when(!(col("__b") <=> col("__a")), lit("update")))
      .filter(col("op").isNotNull)
      .select(pks.map(col) :+ col("op"): _*)
  }

  /** Retire history: keep the newest `keep` committed versions (the
    * current one always survives) and delete everything else —
    * including orphaned directories ABOVE the pointer (dead writes
    * from a crashed publish). Do not vacuum while a writer is
    * publishing. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Unit = {
    require(keep >= 1, s"keep ($keep) must retain at least the current version")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentVersion(spark, root).getOrElse(return)
    val keepSet = versions(spark, root).takeRight(keep).toSet + cur
    fs.listStatus(new Path(root))
      .filter(_.isDirectory)
      .foreach { st =>
        st.getPath.getName match {
          case VersionDir(d) if !keepSet.contains(d.toLong) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
  }

  private val VersionDir = "v=(\\d+)".r

  private def versionDir(root: String, v: Long) = new Path(root, s"v=$v")

  /** The commit point: write the pointer beside its target then move
    * it over `_LATEST` in one atomic metadata operation. */
  private def commitPointer(spark: SparkSession, root: String, v: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val tmp = new Path(root, s"$Latest.tmp")
    val os = fs.create(tmp, true)
    try os.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally os.close()
    // FileSystem.rename refuses an existing destination; FileContext
    // exposes the POSIX/HDFS overwrite rename, which is atomic
    FileContext.getFileContext(tmp.toUri, conf)
      .rename(tmp, new Path(root, Latest), Options.Rename.OVERWRITE)
  }
}
