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

  /** Index entries came from `_metadata.file_path`, which spells an
    * empty authority as "file:/x" while `inputFiles` spells it
    * "file:///x" — compare on (scheme, authority, path), never the
    * raw string. */
  private def normFile(s: String): String = {
    val u = new Path(s).toUri
    Seq(Option(u.getScheme).getOrElse(""),
      Option(u.getAuthority).getOrElse(""), u.getPath).mkString("|")
  }

  /** The DISTRIBUTED index consult: the live file listing LEFT-joined
    * to the stats index, filtered to files that can match `[lo, hi]`
    * on `c` — unseen files (no index row) and files with null stats
    * are kept conservatively. One-column output (`file`); callers
    * collect only THIS — the pruned, selective result — never the
    * full index. (The live listing itself comes from Spark's own
    * driver-side FileIndex, which exists for any scan of the table;
    * the consult adds no second driver copy of the file set.) */
  def prunedFiles(spark: SparkSession, path: String, c: String,
                  lo: Any, hi: Any): DataFrame =
    prunedFiles(spark, spark.read.parquet(path), path, c, lo, hi)

  private def prunedFiles(spark: SparkSession, all: DataFrame, path: String,
                          c: String, lo: Any, hi: Any): DataFrame = {
    import spark.implicits._
    val idx = graft.warehouse.VersionedTable.read(spark, indexPath(path))
    val live = spark.createDataset(all.inputFiles.toSeq)
      .map(f => (f, normFile(f))).toDF("file", "key")
    val idxKeyed = idx
      .select(col("file"),
        // null stats (all-null column in a file) -> unknown -> read it
        coalesce(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi),
          lit(true)).as("matches"))
      .as[(String, Boolean)].map { case (f, m) => (normFile(f), m) }
      .toDF("key", "matches")
    live.join(idxKeyed, Seq("key"), "left_outer")
      .filter(col("matches").isNull || col("matches"))
      .select(col("file"))
  }

  /** Scan `path` reading ONLY files whose [`col`_min, `col`_max] range
    * overlaps [lo, hi] — plus any file the index has never seen
    * (conservative on staleness). The returned frame still carries
    * the `col BETWEEN lo AND hi` filter, so results are exactly a
    * filtered full scan; the index only prunes I/O. The consult runs
    * as a distributed join ([[prunedFiles]]); only its pruned output
    * lands on the driver, as the path list the scan needs anyway. */
  def readPruned(spark: SparkSession, path: String, c: String,
                 lo: Any, hi: Any): DataFrame = {
    import spark.implicits._
    // ONE relation build: its driver-side FileIndex serves both the
    // live listing the consult joins against and the empty-result
    // schema below — not two copies of the same listing work
    val all = spark.read.parquet(path)
    val files = prunedFiles(spark, all, path, c, lo, hi).as[String].collect().toSeq
    val pruned =
      if (files.isEmpty)
        // empty relation with the right schema
        all.filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(files: _*)
    pruned.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  private def indexPath(path: String): String = path + "__stats"

  // ------------------------------------------------------- bloom tier
  //
  // Min/max ranges prune RANGE predicates on clustered layouts; they
  // are useless for point lookups on a high-cardinality key scattered
  // across files (every file's [min, max] spans the key space). The
  // bloom tier stores one bloom filter per file over the key column —
  // Spark's own runtime-filter sketch (BloomFilterAggregate over
  // xxhash64), built in one partial-aggregable pass — and answers
  // `key = v` probes: a file whose filter rejects the hash CANNOT
  // contain the key (no false negatives), so at 100 TB a point lookup
  // opens ~|files containing the key| + fpp·|files| objects instead of
  // every one. Same staleness contract as the stats index: unseen
  // files are always read; absent keys cost zero file opens.

  /** Per-file bloom index for point lookups on `c`: (file, n_rows,
    * bloom BINARY). Size `expectedItems` at the per-FILE row count
    * (the fpp blows up past it) and `numBits` ≈ 10–16 bits/item for
    * ~1% fpp. One scan, one file-count-sized aggregate. */
  def buildBloomIndex(spark: SparkSession, path: String, c: String,
                      expectedItems: Long, numBits: Long): DataFrame =
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), col(c))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Native.bloomAgg(col(c), expectedItems, numBits)
          .as("bloom"))

  /** Materialize the bloom index beside the table
    * (`<path>__bloom_<c>`), atomically via VersionedTable. */
  def writeBloomIndex(spark: SparkSession, path: String, c: String,
                      expectedItems: Long = 1L << 20,
                      numBits: Long = 1L << 23): Unit = {
    graft.warehouse.VersionedTable.publish(spark, bloomIndexPath(path, c),
      buildBloomIndex(spark, path, c, expectedItems, numBits).coalesce(1))
    ()
  }

  /** Distributed bloom consult for `c = key`: live listing LEFT-joined
    * to the bloom index; a file survives if the index has never seen
    * it, its bloom is null (all-null column), or the filter admits the
    * key's hash. The deserialization + probe runs WHERE THE INDEX ROWS
    * ARE (a typed filter over file-count grain — not a hot path), and
    * only the pruned file list reaches the driver. */
  def prunedFilesByKey(spark: SparkSession, path: String, c: String,
                       key: Any): DataFrame =
    prunedFilesByKey(spark, spark.read.parquet(path), path, c, key)

  private def prunedFilesByKey(spark: SparkSession, all: DataFrame,
                               path: String, c: String, key: Any): DataFrame = {
    import spark.implicits._
    val h = graft.functions.Native.xxhash64Of(key, all.schema(c).dataType)
    val idx = graft.warehouse.VersionedTable.read(spark, bloomIndexPath(path, c))
    val live = spark.createDataset(all.inputFiles.toSeq)
      .map(f => (f, normFile(f))).toDF("file", "key")
    val idxKeyed = idx.select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .map { case (f, b) =>
        val matches = b == null || org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(b)).mightContainLong(h)
        (normFile(f), matches)
      }.toDF("key", "matches")
    live.join(idxKeyed, Seq("key"), "left_outer")
      .filter(col("matches").isNull || col("matches"))
      .select(col("file"))
  }

  /** Point lookup `c = key` reading ONLY files whose bloom admits the
    * key (plus index-unseen files). The exact equality filter stays on
    * the pruned scan, so results are exactly a filtered full scan —
    * false positives cost I/O, never correctness. */
  def readPrunedByKey(spark: SparkSession, path: String, c: String,
                      key: Any): DataFrame = {
    import spark.implicits._
    val all = spark.read.parquet(path)
    val files = prunedFilesByKey(spark, all, path, c, key)
      .as[String].collect().toSeq
    val pruned =
      if (files.isEmpty) all.filter(lit(false))
      else spark.read.option("basePath", path).parquet(files: _*)
    pruned.filter(col(c) === lit(key))
  }

  private def bloomIndexPath(path: String, c: String): String =
    s"${path}__bloom_$c"
}
