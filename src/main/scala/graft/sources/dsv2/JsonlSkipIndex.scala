package graft.sources.dsv2

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, max, min}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-skipping index for `graft-jsonl` catalog tables — the
  * connector-native sibling of [[graft.operators.DataSkipping]]'s
  * parquet helpers, CONSULTED BY THE SCAN PLANNER itself: after
  * partition pruning, [[JsonlScan]] drops every shard whose indexed
  * per-column [min, max] range (and, for point predicates, per-shard
  * bloom filter) proves the pushed filters can't match. Parquet gets
  * row-group pruning from its footers; a line-oriented layout has no
  * footers, so without this tier a selective probe on an indexed
  * column opens every post-partition-prune shard.
  *
  * Layout: ONE JSON file `<table>/_skip/index.json` (underscore dir —
  * invisible to data discovery), holding per-shard entries keyed by
  * table-relative shard path: row count, null count + min/max per
  * indexed column (JSON scalars, interpreted against the table
  * schema), and an optional base64 bloom filter per bloom column
  * (Spark's own BloomFilter sketch over `xxhash64(col)`, the
  * [[graft.functions.Native.bloomAgg]] / `xxhash64Of` pair). The
  * index is shard-count-sized — the same metadata grain as the
  * directory listing the driver already holds for planning — and is
  * built by ONE distributed aggregate over the table grouped on the
  * `_shard` metadata column (`CALL wh.system.build_skip_index(...)`),
  * published atomically (tmp + rename).
  *
  * Staleness is conservative in every direction, so the index can
  * only ever cost skipping, never correctness:
  *   - shards ABSENT from the index (appended, or compaction outputs,
  *     since the last build) are always read;
  *   - index entries for shards no longer in the layout are ignored;
  *   - merge-on-read deletes only REMOVE rows, so a shard's true
  *     range is a subset of its indexed range — admits stay sound;
  *   - filters on non-indexed columns, null stats, and filter shapes
  *     the index doesn't understand admit unconditionally.
  */
object JsonlSkipIndex {
  val DirName = "_skip"
  val FileName = "index.json"

  /** Table property listing columns whose per-shard min/max/null stats
    * are maintained BY THE WRITERS at write time (Iceberg's
    * per-data-file stats, re-expressed): with
    * `graft.skip.columns = 'k,ts'` set, every batch INSERT, streaming
    * epoch, and merge-on-read insert tracks the listed columns as rows
    * stream through (an O(cols) compare per row, zero extra passes)
    * and the job commit folds the new shards' entries into
    * `_skip/index.json` — appended data is skippable IMMEDIATELY, no
    * `CALL build_skip_index` staleness window. Bloom filters stay
    * CALL-built (a per-writer sketch would put megabytes on every
    * commit message). Concurrent writers race the index
    * read-modify-write benignly: a lost entry is an index-unseen
    * shard, which scans conservatively. */
  val ColumnsProperty = "graft.skip.columns"

  def skipColsOf(props: Map[String, String]): Seq[String] =
    props.get(ColumnsProperty).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def indexFile(table: Path): Path = new Path(new Path(table, DirName), FileName)

  /** One shard's index entry. `stats` maps column → (min, max, nulls)
    * with min/max already decoded to the column's runtime type;
    * `blooms` maps column → deserialized filter. */
  final case class ShardEntry(nRows: Long,
      stats: Map[String, (Any, Any, Long)],
      blooms: Map[String, org.apache.spark.util.sketch.BloomFilter])

  // ------------------------------------------------------------ build

  /** Build + atomically publish the index: one distributed aggregate
    * over the catalog table `tableRef` (a `cat.ns.t` SQL reference),
    * grouped by the `_shard` metadata column. `cols` get min/max/null
    * stats; `bloomCols` additionally get a per-shard bloom filter
    * (sized `bloomBits`). Returns the number of indexed shards. */
  def build(spark: SparkSession, fs: FileSystem, table: Path,
            tableRef: String, cols: Seq[String], bloomCols: Seq[String],
            bloomItems: Long, bloomBits: Long): Int = {
    val df = spark.table(tableRef)
    val schema = df.schema
    val all = (cols ++ bloomCols).distinct
    all.foreach(c => require(schema.fieldNames.contains(c),
      s"skip index: no column $c in $tableRef"))
    val aggs =
      (count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(min(col(c)).as(s"__min_$c"),
          max(col(c)).as(s"__max_$c"),
          count(lit(1)).minus(count(col(c))).as(s"__nn_$c")))) ++
        bloomCols.map(c => graft.functions.Native
          .bloomAgg(col(c), bloomItems, bloomBits).as(s"__bloom_$c"))
    val rows = df.select(col("_shard") +: all.map(col): _*)
      .groupBy(col("_shard")).agg(aggs.head, aggs.tail: _*)
      .collect() // shard-count grain: metadata scale, same as a listing
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val shardsNode = root.putObject("shards")
    val qualified = fs.makeQualified(table)
    def rel(p: String): String = {
      val r = qualified.toUri.relativize(
        fs.makeQualified(new Path(p)).toUri).getPath
      require(!r.startsWith("/"), s"shard $p outside table $table")
      r
    }
    rows.foreach { r =>
      val e = shardsNode.putObject(rel(r.getAs[String]("_shard")))
      e.put("n", r.getAs[Long]("__n"))
      val st = e.putObject("stats")
      cols.foreach { c =>
        val cn = st.putObject(c)
        cn.put("nn", r.getAs[Long](s"__nn_$c"))
        putScalar(cn, "min", r.getAs[Any](s"__min_$c"))
        putScalar(cn, "max", r.getAs[Any](s"__max_$c"))
      }
      if (bloomCols.nonEmpty) {
        val bl = e.putObject("bloom")
        bloomCols.foreach { c =>
          val bytes = r.getAs[Array[Byte]](s"__bloom_$c")
          if (bytes != null)
            bl.put(c, java.util.Base64.getEncoder.encodeToString(bytes))
        }
      }
    }
    val mf = indexFile(table)
    fs.mkdirs(mf.getParent)
    val tmp = new Path(mf.getParent, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, fs.getConf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(mf),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(mf, false)
        if (!fs.rename(tmp, mf))
          throw new java.io.IOException(s"skip index publish failed for $mf")
    }
    rows.length
  }

  // -------------------------------------------------- write-time stats

  /** One staged file's writer-computed stats: row count plus
    * (min, max, nulls) per tracked column — min/max already as plain
    * JVM values (UTF8Strings converted), so the message serializes. */
  final case class ShardWriteStats(nRows: Long,
      cols: Map[String, (Any, Any, Long)]) extends Serializable

  /** Streams per-row updates into per-file min/max/null counters for
    * the tracked columns (those of `skipCols` present in the write
    * schema with an indexable type). One instance per writer; for
    * rolling writers, [[snapshot]] + [[reset]] at each file boundary.
    * String min/max compare as UTF8String (Spark's aggregate order)
    * and are CLONED on retention — an InternalRow's UTF8String may
    * point into a reused buffer. */
  final class ShardStatsTracker(schema: StructType, skipCols: Seq[String])
      extends Serializable {
    private val tracked: Array[(String, Int, DataType)] = skipCols.flatMap { c =>
      schema.fields.zipWithIndex.collectFirst {
        case (f, i) if f.name == c && indexable(f.dataType) =>
          (c, i, f.dataType)
      }
    }.toArray
    def active: Boolean = tracked.nonEmpty
    private var n = 0L
    private val mins = Array.fill[Any](tracked.length)(null)
    private val maxs = Array.fill[Any](tracked.length)(null)
    private val nulls = Array.fill[Long](tracked.length)(0L)

    def update(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      n += 1
      var j = 0
      while (j < tracked.length) {
        val (_, i, dt) = tracked(j)
        if (row.isNullAt(i)) nulls(j) += 1
        else {
          val v: Any = dt match {
            case LongType => row.getLong(i)
            case IntegerType => row.getInt(i)
            case DoubleType => row.getDouble(i)
            case BooleanType => row.getBoolean(i)
            case StringType => row.getUTF8String(i).clone()
            case _ => null
          }
          if (v != null) {
            if (mins(j) == null || lt(v, mins(j), dt)) mins(j) = v
            if (maxs(j) == null || lt(maxs(j), v, dt)) maxs(j) = v
          }
        }
        j += 1
      }
    }

    private def lt(a: Any, b: Any, dt: DataType): Boolean = dt match {
      case StringType => a.asInstanceOf[UTF8String]
        .compareTo(b.asInstanceOf[UTF8String]) < 0
      case LongType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case IntegerType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
      // Double.compare, not `<`: NaN must order GREATEST (Spark's
      // aggregate ordering) or a NaN row silently vanishes from max
      case DoubleType => java.lang.Double.compare(
        a.asInstanceOf[Double], b.asInstanceOf[Double]) < 0
      case BooleanType => !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
      case _ => false
    }

    private def plain(v: Any): Any = v match {
      case u: UTF8String => u.toString
      case other => other
    }

    def snapshot(): ShardWriteStats =
      ShardWriteStats(n, tracked.indices.map { j =>
        tracked(j)._1 -> ((plain(mins(j)), plain(maxs(j)), nulls(j)))
      }.toMap)

    def reset(): Unit = {
      n = 0L
      var j = 0
      while (j < tracked.length) {
        mins(j) = null; maxs(j) = null; nulls(j) = 0L; j += 1
      }
    }
  }

  private def indexable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType => true
    case _ => false
  }

  /** Fold writer-computed entries (keyed by table-RELATIVE shard path)
    * into the index, creating it if absent — same atomic publish as
    * [[build]]. A read-modify-write: safe under the single-writer-per
    * -commit contract, and a racing loss only un-indexes a shard
    * (conservative). */
  def mergeEntries(fs: FileSystem, table: Path,
                   entries: Seq[(String, ShardWriteStats)]): Unit = {
    if (entries.isEmpty) return
    val mf = indexFile(table)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root: com.fasterxml.jackson.databind.node.ObjectNode =
      if (fs.exists(mf)) {
        val in = fs.open(mf)
        val bytes = try in.readAllBytes() finally in.close()
        mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      } else mapper.createObjectNode()
    val shardsNode =
      if (root.has("shards"))
        root.get("shards").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else root.putObject("shards")
    entries.foreach { case (rel, st) =>
      val e = shardsNode.putObject(rel)
      e.put("n", st.nRows)
      val sn = e.putObject("stats")
      st.cols.foreach { case (c, (mn, mx, nn)) =>
        val cn = sn.putObject(c)
        cn.put("nn", nn)
        putScalar(cn, "min", mn)
        putScalar(cn, "max", mx)
      }
    }
    fs.mkdirs(mf.getParent)
    val tmp = new Path(mf.getParent, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, fs.getConf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(mf),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(mf, false)
        if (!fs.rename(tmp, mf))
          throw new java.io.IOException(s"skip index publish failed for $mf")
    }
  }

  private def putScalar(n: com.fasterxml.jackson.databind.node.ObjectNode,
                        field: String, v: Any): Unit = v match {
    case null => n.putNull(field)
    case b: Boolean => n.put(field, b)
    case i: Int => n.put(field, i)
    case l: Long => n.put(field, l)
    case f: Float => n.put(field, f)
    case d: Double => n.put(field, d)
    case s: String => n.put(field, s)
    case other => n.put(field, other.toString)
  }

  // ------------------------------------------------------------- load

  /** Load the index for `table`, keyed by QUALIFIED shard path string
    * (the form [[JsonlScan]]'s layout uses). Returns empty when no
    * index exists — the no-index fast path is one existence probe. */
  def load(fs: FileSystem, table: Path, schema: StructType)
      : Map[String, ShardEntry] = {
    val mf = indexFile(table)
    if (!fs.exists(mf)) return Map.empty
    val in = fs.open(mf)
    val bytes = try in.readAllBytes() finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, StandardCharsets.UTF_8))
    val shards = root.get("shards")
    if (shards == null) return Map.empty
    val out = Map.newBuilder[String, ShardEntry]
    shards.properties().forEach { e =>
      val node = e.getValue
      val stats = Map.newBuilder[String, (Any, Any, Long)]
      val st = node.get("stats")
      if (st != null) st.properties().forEach { ce =>
        val c = ce.getKey
        schema.fields.find(_.name == c).foreach { f =>
          val cn = ce.getValue
          stats += c -> (decode(cn.get("min"), f.dataType),
            decode(cn.get("max"), f.dataType),
            if (cn.has("nn")) cn.get("nn").asLong else 0L)
        }
      }
      val blooms = Map.newBuilder[String, org.apache.spark.util.sketch.BloomFilter]
      val bl = node.get("bloom")
      if (bl != null) bl.properties().forEach { be =>
        val bytes = java.util.Base64.getDecoder.decode(be.getValue.asText)
        blooms += be.getKey -> org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
      }
      out += fs.makeQualified(new Path(table, e.getKey)).toString ->
        ShardEntry(if (node.has("n")) node.get("n").asLong else 0L,
          stats.result(), blooms.result())
    }
    out.result()
  }

  private def decode(n: com.fasterxml.jackson.databind.JsonNode,
                     dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case LongType => n.asLong
      case IntegerType => n.asInt
      case DoubleType => n.asDouble
      case FloatType => n.asDouble.toFloat
      case BooleanType => n.asBoolean
      case StringType => n.asText
      case _ => null // unindexable type: stats treated as unknown
    }

  // ------------------------------------------------------------ admit

  /** Can `shard` (qualified path) contain a row matching ALL of
    * `filters`? Conservative: anything unknown admits. The caller
    * intersects this with partition pruning. */
  def admits(index: Map[String, ShardEntry], shard: String,
             filters: Seq[Filter], schema: StructType): Boolean =
    index.get(shard) match {
      case None => true // appended / compacted since the build
      case Some(e) => filters.forall(admitsOne(e, _, schema))
    }

  private def cmp(a: Any, b: Any, dt: DataType): Int = dt match {
    // string ordering MUST match Spark's min/max aggregate ordering
    // (UTF8String binary order, not UTF-16 code-unit order — they
    // differ beyond the BMP)
    case StringType => UTF8String.fromString(a.asInstanceOf[String])
      .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
    case LongType => java.lang.Long.compare(longOf(a), longOf(b))
    case IntegerType => java.lang.Long.compare(longOf(a), longOf(b))
    case DoubleType | FloatType =>
      java.lang.Double.compare(dblOf(a), dblOf(b))
    case BooleanType => java.lang.Boolean.compare(
      a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _ => 0
  }
  private def longOf(a: Any): Long = a match {
    case l: Long => l; case i: Int => i.toLong
    case s: Short => s.toLong; case b: Byte => b.toLong
    case other => other.toString.toLong
  }
  private def dblOf(a: Any): Double = a match {
    case d: Double => d; case f: Float => f.toDouble
    case l: Long => l.toDouble; case i: Int => i.toDouble
    case other => other.toString.toDouble
  }

  private def comparable(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (null, _) => false
    case (_: String, StringType) => true
    case (_: Long | _: Int | _: Short | _: Byte,
      LongType | IntegerType) => true
    case (_: Double | _: Float | _: Long | _: Int,
      DoubleType | FloatType) => true
    case (_: Boolean, BooleanType) => true
    case _ => false
  }

  private def admitsOne(e: ShardEntry, f: Filter, schema: StructType): Boolean = {
    def statsOf(c: String): Option[((Any, Any, Long), DataType)] =
      e.stats.get(c).flatMap(s =>
        schema.fields.find(_.name == c).map(fd => (s, fd.dataType)))
    def rangeAdmits(c: String, v: Any)(ok: (Int, Int) => Boolean): Boolean =
      statsOf(c) match {
        case Some(((mn, mx, _), dt))
            if mn != null && mx != null && comparable(v, dt) =>
          ok(cmp(v, mn, dt), cmp(v, mx, dt)) // (v vs min, v vs max)
        case _ => true
      }
    def bloomAdmits(c: String, v: Any): Boolean =
      (e.blooms.get(c), schema.fields.find(_.name == c)) match {
        case (Some(b), Some(fd)) if v != null && comparable(v, fd.dataType) =>
          b.mightContainLong(
            graft.functions.Native.xxhash64Of(castFor(v, fd.dataType), fd.dataType))
        case _ => true
      }
    f match {
      case EqualTo(c, v) =>
        rangeAdmits(c, v)((vsMin, vsMax) => vsMin >= 0 && vsMax <= 0) &&
          bloomAdmits(c, v)
      case In(c, vs) =>
        vs.exists(v => rangeAdmits(c, v)((a, b) => a >= 0 && b <= 0) &&
          bloomAdmits(c, v))
      case GreaterThan(c, v) => rangeAdmits(c, v)((_, vsMax) => vsMax < 0)
      case GreaterThanOrEqual(c, v) => rangeAdmits(c, v)((_, vsMax) => vsMax <= 0)
      case LessThan(c, v) => rangeAdmits(c, v)((vsMin, _) => vsMin > 0)
      case LessThanOrEqual(c, v) => rangeAdmits(c, v)((vsMin, _) => vsMin >= 0)
      case IsNull(c) => statsOf(c) match {
        case Some(((_, _, nn), _)) => nn > 0
        case None => true
      }
      case IsNotNull(c) => statsOf(c) match {
        // all-null shard for c: no non-null row can match
        case Some(((_, _, nn), _)) => nn < e.nRows
        case None => true
      }
      case _ => true
    }
  }

  /** The bloom insert hashed the COLUMN's type; a probe literal of a
    * narrower runtime class must widen first or it hashes differently
    * (xxhash64Of's documented contract). */
  private def castFor(v: Any, dt: DataType): Any = dt match {
    case LongType => longOf(v)
    case IntegerType => v match { case i: Int => i; case other => longOf(other).toInt }
    case DoubleType => dblOf(v)
    case FloatType => dblOf(v).toFloat
    case _ => v
  }
}
