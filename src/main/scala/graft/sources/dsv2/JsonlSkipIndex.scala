package graft.sources.dsv2

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
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
  * Layout (Iceberg's split-manifest shape, re-expressed): under
  * `<table>/_skip/` (underscore dir — invisible to data discovery),
  *   - `manifests.json` — the manifest LIST: partition-relative dir
  *     ("" for root shards) → manifest file name. Tiny: one line per
  *     partition, no per-shard data.
  *   - `m_<hash>.json` — one manifest PER PARTITION DIR, holding that
  *     partition's per-shard entries keyed by table-relative shard
  *     path: row count, null count + min/max per indexed column (JSON
  *     scalars, interpreted against the table schema), and an
  *     optional base64 bloom filter per bloom column (Spark's own
  *     BloomFilter sketch over `xxhash64(col)`, the
  *     [[graft.functions.Native.bloomAgg]] / `xxhash64Of` pair).
  *
  * Why split: a monolithic file made every scan parse EVERY shard's
  * entry (driver-hostile with per-shard blooms at 100 TB-class shard
  * counts) and serialized commits touching disjoint partitions
  * through one read-modify-write. Split, scan planning parses the
  * list plus only the manifests of partitions that SURVIVE partition
  * pruning ([[Index]] loads lazily per dir), and a commit touching
  * one partition rewrites one manifest. The list is rewritten only
  * when a NEW partition appears; a lost list update is self-healing —
  * the manifest file name is deterministic per dir, so the next write
  * to that dir re-merges into the same file and re-lists it.
  *
  * Staleness is conservative in every direction, so the index can
  * only ever cost skipping, never correctness:
  *   - shards ABSENT from the index (appended, or compaction outputs,
  *     since the last build) are always read;
  *   - index entries for shards no longer in the layout are ignored
  *     for admission (and PRUNED by the destructive commit paths via
  *     [[removeEntries]]/[[removeDirs]], so the index tracks the live
  *     layout instead of growing O(shards-ever));
  *   - merge-on-read deletes only REMOVE rows, so a shard's true
  *     range is a subset of its indexed range — admits stay sound;
  *   - filters on non-indexed columns, null stats, and filter shapes
  *     the index doesn't understand admit unconditionally.
  *
  * A pre-split single-file `_skip/index.json` is migrated into the
  * split layout by the first write that touches the index, and read
  * as-is (whole) until then.
  */
object JsonlSkipIndex {
  val DirName = "_skip"
  val ListFileName = "manifests.json"
  /** Pre-split single-file layout; read-compatible, migrated on write. */
  val FileName = "index.json"

  /** Table property listing columns whose per-shard min/max/null stats
    * are maintained BY THE WRITERS at write time (Iceberg's
    * per-data-file stats, re-expressed): with
    * `graft.skip.columns = 'k,ts'` set, every batch INSERT, streaming
    * epoch, and merge-on-read insert tracks the listed columns as rows
    * stream through (an O(cols) compare per row, zero extra passes)
    * and the job commit folds the new shards' entries into their
    * partition's manifest — appended data is skippable IMMEDIATELY, no
    * `CALL build_skip_index` staleness window. Bloom filters stay
    * CALL-built (a per-writer sketch would put megabytes on every
    * commit message). Concurrent writers race a manifest
    * read-modify-write benignly: a lost entry is an index-unseen
    * shard, which scans conservatively. */
  val ColumnsProperty = "graft.skip.columns"

  def skipColsOf(props: Map[String, String]): Seq[String] =
    props.get(ColumnsProperty).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Resolve a skip column that may be a DOTTED STRUCT LEAF
    * (`meta.source`): a literal top-level field of that name wins
    * (JSON keys can contain dots); otherwise the path walks nested
    * StructTypes to the leaf. None when the path doesn't resolve. */
  def leafField(schema: StructType, name: String)
      : Option[StructField] =
    schema.fields.find(_.name == name).orElse {
      val parts = name.split("\\.")
      if (parts.length < 2) None
      else {
        var cur: DataType = schema
        var f: Option[StructField] = None
        parts.foreach { p =>
          f = cur match {
            case st: StructType => st.fields.find(_.name == p)
            case _ => None
          }
          cur = f.map(_.dataType).getOrElse(NullType)
        }
        f
      }
    }

  /** The key an entry's stats are stored under: the PHYSICAL key for a
    * top-level column (see [[JsonlTable.PhysicalKeyMeta]]); for a
    * dotted leaf, the top segment's physical key + the nested path
    * (nested fields are never re-keyed). */
  def storageKeyOf(schema: StructType, name: String): String =
    schema.fields.find(_.name == name) match {
      case Some(f) => JsonlTable.physicalKeyOf(f)
      case None =>
        val i = name.indexOf('.')
        if (i < 0) name
        else JsonlTable.physicalKeyOf(schema, name.substring(0, i)) +
          name.substring(i)
    }

  def indexDir(table: Path): Path = new Path(table, DirName)
  def listFile(table: Path): Path = new Path(indexDir(table), ListFileName)
  def legacyFile(table: Path): Path = new Path(indexDir(table), FileName)

  /** Partition-relative dir of a table-relative shard path:
    * `lang=en/part-1.jsonl.gz` → `lang=en`; root shards → "". */
  def dirOf(rel: String): String = {
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }

  /** Deterministic manifest file name for a partition dir — content
    * hash of the KEY, not the data, so every writer that touches the
    * dir converges on the same file (the self-healing list property).
    * 16 hex chars of SHA-1: collision needs ~2^32 distinct partition
    * dirs in one table. */
  def manifestFileName(dirKey: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(dirKey.getBytes(StandardCharsets.UTF_8))
    "m_" + d.take(8).map(b => f"$b%02x").mkString + ".json"
  }

  /** One shard's index entry. `stats` maps column → (min, max, nulls)
    * with min/max already decoded to the column's runtime type;
    * `blooms` maps column → deserialized filter. `exact = false`
    * marks an entry SYNTHESIZED by compaction from inputs that
    * carried position deletes: its row count is exact and its
    * [min, max] ranges are sound SUPERSETS of the truth (deletes only
    * remove rows), but min/max/null-count must not be served as
    * ANSWERS — range admission only. */
  final case class ShardEntry(nRows: Long,
      stats: Map[String, (Any, Any, Long)],
      blooms: Map[String, org.apache.spark.util.sketch.BloomFilter],
      exact: Boolean = true,
      sorted: Seq[String] = Nil)

  // --------------------------------------------------------- json io

  private def mapper = new ObjectMapper()

  /** A manifest that doesn't exist OR doesn't parse reads as absent:
    * the index is advisory (an unseen shard scans conservatively), so
    * a torn/truncated file — e.g. a crash mid-publish on a filesystem
    * without atomic overwrite-rename — must cost skipping for its
    * partition, never fail every scan of the table at planning. */
  private def readNode(fs: FileSystem, p: Path): Option[ObjectNode] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      try Some(mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
        .asInstanceOf[ObjectNode])
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Atomic publish: tmp + rename-overwrite (FileContext where the
    * filesystem offers it, delete+rename where not). The tmp name is
    * attempt-unique: two lockless appenders to the SAME manifest (the
    * documented benign race) must never interleave create/write/rename
    * on one tmp path — a shared name can publish a torn file. */
  private def publish(fs: FileSystem, target: Path, root: JsonNode): Unit = {
    fs.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, fs.getConf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(target),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(target, false)
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(s"skip index publish failed for $target")
    }
  }

  private def loadList(fs: FileSystem, table: Path): Map[String, String] =
    readNode(fs, listFile(table)).map { root =>
      val dirs = root.get("dirs")
      if (dirs == null) Map.empty[String, String]
      else {
        val b = Map.newBuilder[String, String]
        dirs.properties().forEach(e => b += e.getKey -> e.getValue.asText)
        b.result()
      }
    }.getOrElse(Map.empty)

  private def publishList(fs: FileSystem, table: Path,
                          list: Map[String, String]): Unit = {
    val root = mapper.createObjectNode()
    val dirs = root.putObject("dirs")
    list.toSeq.sortBy(_._1).foreach { case (k, v) => dirs.put(k, v) }
    publish(fs, listFile(table), root)
  }

  /** `shards` object of a manifest (or legacy index) file. */
  private def shardsNodeOf(root: ObjectNode): ObjectNode =
    if (root.has("shards")) root.get("shards").asInstanceOf[ObjectNode]
    else root.putObject("shards")

  /** Fold a pre-split `index.json` into the split layout; idempotent,
    * called by every write path before it touches manifests. The
    * single-writer-per-commit lock contract covers the multi-file
    * rewrite the same way it covers the data swap. */
  private def migrateLegacy(fs: FileSystem, table: Path): Unit = {
    val legacy = legacyFile(table)
    readNode(fs, legacy).foreach { root =>
      val shards = root.get("shards")
      if (shards != null) {
        val byDir = scala.collection.mutable.Map.empty[String, ObjectNode]
        shards.properties().forEach { e =>
          val node = byDir.getOrElseUpdate(dirOf(e.getKey),
            mapper.createObjectNode())
          shardsNodeOf(node).set(e.getKey, e.getValue)
          ()
        }
        var list = loadList(fs, table)
        byDir.foreach { case (key, fresh) =>
          val file = list.getOrElse(key, manifestFileName(key))
          val target = new Path(indexDir(table), file)
          val merged = readNode(fs, target).getOrElse(mapper.createObjectNode())
          val into = shardsNodeOf(merged)
          shardsNodeOf(fresh).properties().forEach(e =>
            into.set[JsonNode](e.getKey, e.getValue))
          merged.put("dir", key)
          publish(fs, target, merged)
          list += key -> file
        }
        publishList(fs, table, list)
      }
      fs.delete(legacy, false)
    }
  }

  // ------------------------------------------------------------ build

  /** Build + atomically publish the index: one distributed aggregate
    * over the catalog table `tableRef` (a `cat.ns.t` SQL reference),
    * grouped by the `_shard` metadata column. `cols` get min/max/null
    * stats; `bloomCols` additionally get a per-shard bloom filter
    * (sized `bloomBits`). Every partition's manifest is rewritten
    * fresh and orphaned manifest files dropped — a full rebuild, the
    * one index operation that is table-scale by definition. Returns
    * the number of indexed shards. */
  def build(spark: SparkSession, fs: FileSystem, table: Path,
            tableRef: String, cols: Seq[String], bloomCols: Seq[String],
            bloomItems: Long, bloomBits: Long): Int = {
    val df = spark.table(tableRef)
    val schema = df.schema
    val all = (cols ++ bloomCols).distinct
    all.foreach(c => require(leafField(schema, c).isDefined,
      s"skip index: no column (or struct leaf) $c in $tableRef"))
    bloomCols.foreach(c => require(
      leafField(schema, c).forall(f => scalarBloomType(f.dataType)),
      s"skip index: bloom_columns supports scalar types only, $c is not — " +
        "temporal columns get [min, max] range skipping (the useful tier " +
        "for time); list it under columns instead"))
    // project every (possibly dotted) column under a positional alias
    // FIRST — selecting `meta.uid` yields a column named `uid`, so the
    // aggregates must reference the alias, not re-resolve the path
    val aliasOf: Map[String, String] =
      all.zipWithIndex.map { case (c, i) => c -> s"__c$i" }.toMap
    val aggs =
      (count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(min(col(aliasOf(c))).as(s"__min_$c"),
          max(col(aliasOf(c))).as(s"__max_$c"),
          count(lit(1)).minus(count(col(aliasOf(c)))).as(s"__nn_$c")))) ++
        bloomCols.map(c => graft.functions.Native
          .bloomAgg(col(aliasOf(c)), bloomItems, bloomBits).as(s"__bloom_$c"))
    val rows = df
      .select(col("_shard") +: all.map(c => col(c).as(aliasOf(c))): _*)
      .groupBy(col("_shard")).agg(aggs.head, aggs.tail: _*)
      .collect() // shard-count grain: metadata scale, same as a listing
    val qualified = fs.makeQualified(table)
    def rel(p: String): String = {
      val r = qualified.toUri.relativize(
        fs.makeQualified(new Path(p)).toUri).getPath
      require(!r.startsWith("/"), s"shard $p outside table $table")
      r
    }
    val byDir = rows.groupBy(r => dirOf(rel(r.getAs[String]("_shard"))))
    val list = byDir.keys.map(k => k -> manifestFileName(k)).toMap
    byDir.foreach { case (key, dirRows) =>
      val root = mapper.createObjectNode()
      root.put("dir", key)
      val shardsNode = root.putObject("shards")
      dirRows.foreach { r =>
        val e = shardsNode.putObject(rel(r.getAs[String]("_shard")))
        e.put("n", r.getAs[Long]("__n"))
        val st = e.putObject("stats")
        cols.foreach { c =>
          val cn = st.putObject(storageKeyOf(schema, c))
          cn.put("nn", r.getAs[Long](s"__nn_$c"))
          // temporal aggregates come back as external java.sql /
          // java.time objects — store the Catalyst integer the
          // write-time tracker also uses
          val norm: Any => Any =
            leafField(schema, c).map(_.dataType) match {
              case Some(TimestampType | TimestampNTZType) =>
                v => if (v == null) null else microsOf(v)
              case Some(DateType) =>
                v => if (v == null) null else daysOf(v).toInt
              case _ => identity
            }
          putScalar(cn, "min", norm(r.getAs[Any](s"__min_$c")))
          putScalar(cn, "max", norm(r.getAs[Any](s"__max_$c")))
        }
        if (bloomCols.nonEmpty) {
          val bl = e.putObject("bloom")
          bloomCols.foreach { c =>
            val bytes = r.getAs[Array[Byte]](s"__bloom_$c")
            if (bytes != null)
              bl.put(storageKeyOf(schema, c),
                java.util.Base64.getEncoder.encodeToString(bytes))
          }
        }
      }
      publish(fs, new Path(indexDir(table), list(key)), root)
    }
    publishList(fs, table, list)
    // a rebuild supersedes everything: pre-split file and manifests of
    // partitions that no longer exist (crash before this sweep leaves
    // unlisted files — ignored by readers, swept by the next build)
    val keep = list.values.toSet + ListFileName
    if (fs.exists(indexDir(table)))
      fs.listStatus(indexDir(table))
        .filter(st => st.isFile && !keep.contains(st.getPath.getName) &&
          !st.getPath.getName.startsWith("."))
        .foreach(st => fs.delete(st.getPath, false))
    rows.length
  }

  // -------------------------------------------------- write-time stats

  /** One staged file's writer-computed stats: row count plus
    * (min, max, nulls) per tracked column — min/max already as plain
    * JVM values (UTF8Strings converted), so the message serializes.
    * `exact = false` only on compaction-synthesized entries (see
    * [[ShardEntry.exact]]). */
  final case class ShardWriteStats(nRows: Long,
      cols: Map[String, (Any, Any, Long)],
      exact: Boolean = true,
      sorted: Seq[String] = Nil) extends Serializable

  /** Streams per-row updates into per-file min/max/null counters for
    * the tracked columns (those of `skipCols` present in the write
    * schema with an indexable type). One instance per writer; for
    * rolling writers, [[snapshot]] + [[reset]] at each file boundary.
    * String min/max compare as UTF8String (Spark's aggregate order)
    * and are CLONED on retention — an InternalRow's UTF8String may
    * point into a reused buffer. */
  final class ShardStatsTracker(schema: StructType, skipCols: Seq[String],
                                orderCols: Seq[String] = Nil)
      extends Serializable {
    // VERIFIED write-order sortedness: as rows stream through, compare
    // each against the previous on the requested order tuple
    // (lexicographic, per-column ASC NULLS FIRST — Spark's default
    // sort) and keep the longest leading prefix that never decreased.
    // The flag is MEASURED, not assumed from the requested sort: a
    // writer fed out-of-order rows (a path write, a changed plan)
    // records exactly what held. Top-level indexable columns only.
    private val orderTracked: Array[(String, Int, DataType)] =
      orderCols.iterator.map(c => schema.fields.zipWithIndex.collectFirst {
        case (f, i) if f.name == c && indexable(f.dataType) =>
          (JsonlTable.physicalKeyOf(f), i, f.dataType)
      }).takeWhile(_.isDefined).map(_.get).toArray
    private var sortedPrefix = orderTracked.length
    private val prevVals = Array.fill[Any](orderTracked.length)(null)
    private var havePrev = false

    private def orderUpdate(
        row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      var j = 0
      var decided = false // first non-equal column decides the compare
      while (j < sortedPrefix) {
        val (_, i, dt) = orderTracked(j)
        val v: Any =
          if (row.isNullAt(i)) null
          else dt match {
            case LongType | TimestampType | TimestampNTZType => row.getLong(i)
            case IntegerType | DateType => row.getInt(i)
            case DoubleType => row.getDouble(i)
            case BooleanType => row.getBoolean(i)
            case StringType => row.getUTF8String(i).clone()
            case _ => null
          }
        if (havePrev && !decided) {
          val p = prevVals(j)
          val c =
            if (p == null && v == null) 0
            else if (p == null) -1 // nulls first: prev null <= any
            else if (v == null) 1
            else dt match { // catalyst-typed values (see update())
              case StringType => p.asInstanceOf[UTF8String]
                .compareTo(v.asInstanceOf[UTF8String])
              case LongType | TimestampType | TimestampNTZType =>
                java.lang.Long.compare(
                  p.asInstanceOf[Long], v.asInstanceOf[Long])
              case IntegerType | DateType => java.lang.Integer.compare(
                p.asInstanceOf[Int], v.asInstanceOf[Int])
              case DoubleType => java.lang.Double.compare(
                p.asInstanceOf[Double], v.asInstanceOf[Double])
              case BooleanType => java.lang.Boolean.compare(
                p.asInstanceOf[Boolean], v.asInstanceOf[Boolean])
              case _ => 0
            }
          if (c < 0) decided = true // strictly increasing: rest free
          else if (c > 0) {
            // decreased at column j: the verified prefix ends before it
            sortedPrefix = j
            // prevVals beyond j are stale but never read again
          }
          // c == 0: tie — the next column decides
        }
        if (j < sortedPrefix) prevVals(j) = v
        j += 1
      }
      havePrev = true
    }
    // entries are keyed by the column's PHYSICAL key (its JSON key):
    // stats of a column dropped and re-added under the same display
    // name must never answer for the new one. A dotted name tracks a
    // STRUCT LEAF: the access path walks (ordinal, struct width)
    // steps; a null at ANY level counts as a null leaf.
    private val tracked: Array[(String, Int, Array[(Int, Int)], DataType)] =
      skipCols.flatMap { c =>
        val topName = schema.fields.find(_.name == c)
          .map(_.name).getOrElse(c.split("\\.")(0))
        schema.fields.zipWithIndex.collectFirst {
          case (f, i) if f.name == topName &&
              (f.name == c || c.startsWith(f.name + ".")) =>
            if (f.name == c) {
              if (indexable(f.dataType))
                Some((JsonlTable.physicalKeyOf(f), i,
                  Array.empty[(Int, Int)], f.dataType))
              else None
            } else {
              // nested leaf: resolve the remaining path inside structs
              val rest = c.substring(f.name.length + 1).split("\\.")
              var cur = f.dataType
              val steps = Array.newBuilder[(Int, Int)]
              var ok = true
              rest.foreach { p =>
                cur match {
                  case st: StructType =>
                    val j = st.fields.indexWhere(_.name == p)
                    if (j < 0) ok = false
                    else { steps += ((j, st.length)); cur = st.fields(j).dataType }
                  case _ => ok = false
                }
              }
              if (ok && indexable(cur))
                Some((storageKeyOf(schema, c), i, steps.result(), cur))
              else None
            }
        }.flatten
      }.toArray
    def active: Boolean = tracked.nonEmpty || orderTracked.nonEmpty
    private var n = 0L
    private val mins = Array.fill[Any](tracked.length)(null)
    private val maxs = Array.fill[Any](tracked.length)(null)
    private val nulls = Array.fill[Long](tracked.length)(0L)

    def update(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      n += 1
      if (orderTracked.nonEmpty) orderUpdate(row)
      var j = 0
      while (j < tracked.length) {
        val (_, top, steps, dt) = tracked(j)
        var g: org.apache.spark.sql.catalyst.expressions.SpecializedGetters = row
        var i = top
        var k = 0
        var isNull = g.isNullAt(i)
        while (!isNull && k < steps.length) {
          // descend one struct level; width rides in the step
          val prevWidth = steps(k)._2
          g = g.getStruct(i, prevWidth)
          i = steps(k)._1
          isNull = g.isNullAt(i)
          k += 1
        }
        if (isNull) nulls(j) += 1
        else {
          val v: Any = dt match {
            case LongType | TimestampType | TimestampNTZType => g.getLong(i)
            case IntegerType | DateType => g.getInt(i)
            case DoubleType => g.getDouble(i)
            case BooleanType => g.getBoolean(i)
            case StringType => g.getUTF8String(i).clone()
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
      case LongType | TimestampType | TimestampNTZType =>
        a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case IntegerType | DateType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
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
      }.toMap,
        sorted = orderTracked.take(sortedPrefix).map(_._1).toSeq)

    def reset(): Unit = {
      n = 0L
      var j = 0
      while (j < tracked.length) {
        mins(j) = null; maxs(j) = null; nulls(j) = 0L; j += 1
      }
      sortedPrefix = orderTracked.length
      java.util.Arrays.fill(prevVals.asInstanceOf[Array[AnyRef]], null)
      havePrev = false
    }
  }

  private[dsv2] def indexable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType => true
    // temporal columns index by their Catalyst integers (epoch micros
    // / epoch days) — `WHERE ts >= X` is THE canonical skipping
    // predicate on an event corpus
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** Fold writer-computed entries (keyed by table-RELATIVE shard path)
    * into their partitions' manifests, creating manifests (and list
    * entries) as partitions appear. Touches ONLY the manifests of the
    * partitions the commit wrote — a one-partition append rewrites one
    * manifest, not the table's index. A read-modify-write per
    * manifest: safe under the single-writer-per-commit contract, and a
    * racing loss only un-indexes a shard (conservative). */
  def mergeEntries(fs: FileSystem, table: Path,
                   entries: Seq[(String, ShardWriteStats)]): Unit = {
    if (entries.isEmpty) return
    migrateLegacy(fs, table)
    var list = loadList(fs, table)
    var listChanged = false
    entries.groupBy { case (rel, _) => dirOf(rel) }.foreach {
      case (key, dirEntries) =>
        val file = list.getOrElse(key, {
          listChanged = true
          manifestFileName(key)
        })
        val target = new Path(indexDir(table), file)
        val root = readNode(fs, target).getOrElse(mapper.createObjectNode())
        root.put("dir", key)
        val shardsNode = shardsNodeOf(root)
        dirEntries.foreach { case (rel, st) =>
          val e = shardsNode.putObject(rel)
          e.put("n", st.nRows)
          if (!st.exact) e.put("approx", true)
          if (st.sorted.nonEmpty) {
            val so = e.putArray("sorted")
            st.sorted.foreach(so.add)
          }
          val sn = e.putObject("stats")
          st.cols.foreach { case (c, (mn, mx, nn)) =>
            val cn = sn.putObject(c)
            cn.put("nn", nn)
            putScalar(cn, "min", mn)
            putScalar(cn, "max", mx)
          }
        }
        publish(fs, target, root)
        list += key -> file
    }
    if (listChanged) publishList(fs, table, list)
  }

  /** Fold the index entries of shards a compaction CONCATENATES into
    * the entry of the output shard — metadata only, no re-scan: the
    * output's range is the union of the inputs' ranges, its row count
    * is Σ inputs − the position-deleted lines the rewrite dropped
    * (exact: graft writers emit one line per row and `_pos` counts
    * physical lines). With any deletes the min/max may be WIDER than
    * the surviving rows — still sound for range admission, never for
    * answers — so the folded entry is marked approx; with none it is
    * exact and full-powered. Returns None when any input lacks an
    * entry or carries no foldable column (the output simply stays
    * unindexed — conservative). Blooms don't fold (sketch params may
    * differ); `CALL build_skip_index` re-covers them. */
  def foldForConcat(inputs: Seq[ShardEntry], deletedRows: Long,
                    schema: StructType): Option[ShardWriteStats] = {
    if (inputs.isEmpty) return None
    val cols = inputs.map(_.stats.keySet).reduce(_ & _)
    if (cols.isEmpty) return None
    val stats = cols.iterator.flatMap { c =>
      fieldByStorageKey(schema, c).map(_.dataType).map { dt =>
        val mins = inputs.flatMap(e => Option(e.stats(c)._1))
        val maxs = inputs.flatMap(e => Option(e.stats(c)._2))
        val mn = if (mins.isEmpty) null
                 else mins.reduce((a, b) => if (cmp(a, b, dt) <= 0) a else b)
        val mx = if (maxs.isEmpty) null
                 else maxs.reduce((a, b) => if (cmp(a, b, dt) >= 0) a else b)
        c -> ((mn, mx, inputs.map(_.stats(c)._3).sum))
      }
    }.toMap
    Some(ShardWriteStats(
      inputs.map(_.nRows).sum - deletedRows, stats,
      exact = deletedRows == 0 && inputs.forall(_.exact)))
  }

  /** Drop the entries of retired shards (keyed by table-RELATIVE
    * path) — called by the destructive commit paths (COW swap,
    * static/dynamic overwrite, compact) with the exact shard set they
    * discarded, so the index tracks the live layout instead of
    * growing without bound on churny tables. A manifest left empty is
    * deleted and unlisted. */
  def removeEntries(fs: FileSystem, table: Path, rels: Seq[String]): Unit = {
    if (rels.isEmpty) return
    migrateLegacy(fs, table)
    var list = loadList(fs, table)
    var listChanged = false
    rels.groupBy(dirOf).foreach { case (key, dirRels) =>
      list.get(key).foreach { file =>
        val target = new Path(indexDir(table), file)
        readNode(fs, target).foreach { root =>
          val shardsNode = shardsNodeOf(root)
          dirRels.foreach(shardsNode.remove)
          if (shardsNode.isEmpty) {
            fs.delete(target, false)
            list -= key
            listChanged = true
          } else publish(fs, target, root)
        }
      }
    }
    if (listChanged) publishList(fs, table, list)
  }

  /** Re-key entries for shards renamed IN PLACE (equality-delete
    * re-stamping: same bytes, new name) — the stats stay valid, only
    * the key changes, so the dir keeps pruning without a re-scan. */
  def renameEntries(fs: FileSystem, table: Path,
                    renames: Seq[(String, String)]): Unit = {
    if (renames.isEmpty) return
    migrateLegacy(fs, table)
    val list = loadList(fs, table)
    renames.groupBy(r => dirOf(r._1)).foreach { case (key, rs) =>
      list.get(key).foreach { file =>
        val target = new Path(indexDir(table), file)
        readNode(fs, target).foreach { root =>
          val shardsNode = shardsNodeOf(root)
          var changed = false
          rs.foreach { case (o, n) =>
            val v = shardsNode.get(o)
            if (v != null) {
              shardsNode.remove(o)
              shardsNode.set[JsonNode](n, v)
              changed = true
            }
          }
          if (changed) publish(fs, target, root)
        }
      }
    }
  }

  /** Drop one column's BLOOM sketches from every manifest, keeping
    * its min/max/null stats — called by type-widening evolution:
    * blooms hash by TYPE (`xxhash64Of(int) != xxhash64Of(long)` for
    * the same value), so a probe through the widened type would miss
    * present values and prune wrongly; the min/max scalars re-decode
    * through the widened type on the next read (JSON numbers
    * reparse). `key` is the column's STORAGE key. */
  def dropBlooms(fs: FileSystem, table: Path, key: String): Unit = {
    migrateLegacy(fs, table)
    loadList(fs, table).foreach { case (_, file) =>
      val target = new Path(indexDir(table), file)
      readNode(fs, target).foreach { root =>
        var changed = false
        shardsNodeOf(root).properties().forEach { e =>
          val bl = e.getValue.get("bloom")
          if (bl != null && bl.has(key)) {
            bl.asInstanceOf[ObjectNode].remove(key)
            changed = true
          }
        }
        if (changed) publish(fs, target, root)
      }
    }
  }

  /** Drop whole partitions' manifests — the O(1)-per-partition form
    * of [[removeEntries]] for partition-grain deletes (TRUNCATE
    * PARTITION, partition-dir DELETE WHERE). */
  def removeDirs(fs: FileSystem, table: Path, dirs: Seq[String]): Unit = {
    if (dirs.isEmpty) return
    migrateLegacy(fs, table)
    val list = loadList(fs, table)
    val hit = dirs.filter(list.contains)
    if (hit.isEmpty) return
    hit.foreach(k => fs.delete(new Path(indexDir(table), list(k)), false))
    publishList(fs, table, list -- hit)
  }

  /** Drop the whole index — TRUNCATE-class wipes. */
  def dropAll(fs: FileSystem, table: Path): Unit = {
    fs.delete(indexDir(table), true)
    ()
  }

  // ------------------------------------------------- cluster spec
  //
  // `_skip/cluster.json`: the layout certificate `CALL cluster_table`
  // writes after a successful rewrite — the cluster spec (columns +
  // zorder flag + target shard count) plus a FINGERPRINT of the live
  // shard set it produced (sha-256 over the sorted table-relative
  // paths). A re-CALL with the same spec whose current live set still
  // matches the fingerprint (and no sidecars / pending equality
  // deletes) is provably a no-op: shard names are attempt-unique, so
  // ANY append, upsert wave, compaction, or re-stamp since the rewrite
  // changes the set and fails the match. This is what lets Z-ORDER
  // layouts — whose multi-column interleave the leading-range check
  // can't certify — join the idempotent-maintenance contract instead
  // of re-sorting the table every cadence.

  final case class ClusterSpec(cols: Seq[String], zorder: Boolean,
                               nShards: Int, fingerprint: String)

  private def clusterSpecFile(table: Path): Path =
    new Path(indexDir(table), "cluster.json")

  def layoutFingerprint(rels: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rels.sorted.foreach { r =>
      md.update(r.getBytes(StandardCharsets.UTF_8)); md.update('\n'.toByte)
    }
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  def writeClusterSpec(fs: FileSystem, table: Path,
                       spec: ClusterSpec): Unit = {
    val root = mapper.createObjectNode()
    val ca = root.putArray("cols"); spec.cols.foreach(ca.add)
    root.put("zorder", spec.zorder)
    root.put("nShards", spec.nShards)
    root.put("fingerprint", spec.fingerprint)
    publish(fs, clusterSpecFile(table), root)
  }

  def readClusterSpec(fs: FileSystem, table: Path): Option[ClusterSpec] =
    readNode(fs, clusterSpecFile(table)).flatMap { root =>
      try {
        val cols = (0 until root.get("cols").size)
          .map(root.get("cols").get(_).asText)
        Some(ClusterSpec(cols, root.get("zorder").asBoolean,
          root.get("nShards").asInt, root.get("fingerprint").asText))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private def putScalar(n: ObjectNode, field: String, v: Any): Unit = v match {
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

  /** Lazily loading view of the index: the manifest list is read
    * up-front (one small file — or the whole pre-split file, for a
    * table not yet migrated); each partition's manifest parses only
    * when the FIRST shard of that partition is actually probed. Scan
    * planning consults entries after partition pruning, so a
    * partition-pruned probe never parses the other partitions'
    * manifests — planning cost follows the pruned partition count,
    * not the table's shard count. */
  final class Index private[JsonlSkipIndex] (
      fs: FileSystem, table: Path, schema: StructType,
      list: Map[String, String], legacy: Map[String, ShardEntry]) {
    private lazy val tableUri = fs.makeQualified(table).toUri
    private val cache =
      scala.collection.mutable.Map.empty[String, Map[String, ShardEntry]]

    def isEmpty: Boolean = list.isEmpty && legacy.isEmpty
    def nonEmpty: Boolean = !isEmpty

    /** Manifests parsed so far — spec instrumentation for the
      * "pruned probe touches one manifest" contract. */
    private[graft] def manifestsTouched: Int = cache.size

    /** Entry for a QUALIFIED shard path (the form [[JsonlScan]]'s
      * layout carries), loading at most the one manifest of the
      * shard's partition dir. */
    def get(shard: String): Option[ShardEntry] = {
      if (isEmpty) return None
      if (legacy.nonEmpty) return legacy.get(shard)
      val rel = tableUri.relativize(new Path(shard).toUri).getPath
      if (rel.startsWith("/")) return None // outside the table
      val key = dirOf(rel)
      list.get(key).flatMap { file =>
        cache.getOrElseUpdate(key,
          loadManifest(fs, table, file, schema)).get(shard)
      }
    }

    def contains(shard: String): Boolean = get(shard).isDefined
  }

  /** The no-index index — snapshot scans use it (live stats describe
    * live shards only). */
  def empty: Index = new Index(null, null, null, Map.empty, Map.empty)

  /** Open the index for `table`. One existence probe + one small list
    * read when the table has an index; entries load per-partition on
    * demand (see [[Index]]). */
  /** Every entry under `root`'s index as (table-relative path →
    * write-stats), ready to [[mergeEntries]] into ANOTHER root's index
    * — how `CALL cluster_table` transplants its staging write's
    * measured stats (incl. the verified-sorted prefix, which a
    * scan-rebuild cannot recover: aggregation is order-blind) onto the
    * swapped-in shards. Rel paths transfer because staging mirrors the
    * table-relative layout. */
  def entriesOf(fs: FileSystem, root: Path, schema: StructType)
      : Seq[(String, ShardWriteStats)] = {
    val list = loadList(fs, root)
    val qualified = fs.makeQualified(root).toUri
    list.valuesIterator.flatMap { file =>
      loadManifest(fs, root, file, schema).iterator.map { case (q, e) =>
        val rel = qualified.relativize(new Path(q).toUri).getPath
        rel -> ShardWriteStats(e.nRows, e.stats, e.exact, e.sorted)
      }
    }.toSeq
  }

  def open(fs: FileSystem, table: Path, schema: StructType): Index = {
    val list = loadList(fs, table)
    val legacy =
      if (list.nonEmpty) Map.empty[String, ShardEntry]
      else readNode(fs, legacyFile(table))
        .map(parseShards(_, fs, table, schema)).getOrElse(Map.empty)
    new Index(fs, table, schema, list, legacy)
  }

  private def loadManifest(fs: FileSystem, table: Path, file: String,
                           schema: StructType): Map[String, ShardEntry] =
    readNode(fs, new Path(indexDir(table), file))
      .map(parseShards(_, fs, table, schema)).getOrElse(Map.empty)

  /** Parse a manifest (or pre-split index) root into entries keyed by
    * QUALIFIED shard path string. */
  private def parseShards(root: ObjectNode, fs: FileSystem, table: Path,
                          schema: StructType): Map[String, ShardEntry] = {
    val shards = root.get("shards")
    if (shards == null) return Map.empty
    val out = Map.newBuilder[String, ShardEntry]
    shards.properties().forEach { e =>
      val node = e.getValue
      val stats = Map.newBuilder[String, (Any, Any, Long)]
      val st = node.get("stats")
      if (st != null) st.properties().forEach { ce =>
        val c = ce.getKey // the PHYSICAL (storage) key, possibly dotted
        fieldByStorageKey(schema, c).foreach { f =>
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
      val sorted =
        if (!node.has("sorted")) Nil
        else {
          val b = Seq.newBuilder[String]
          node.get("sorted").forEach(n => b += n.asText)
          b.result()
        }
      out += fs.makeQualified(new Path(table, e.getKey)).toString ->
        ShardEntry(if (node.has("n")) node.get("n").asLong else 0L,
          stats.result(), blooms.result(),
          exact = !(node.has("approx") && node.get("approx").asBoolean),
          sorted = sorted)
    }
    out.result()
  }

  /** Inverse of [[storageKeyOf]]: the LEAF field a stored stats key
    * describes — a top-level field whose physical key matches, else a
    * dotted walk whose top segment matches by physical key. */
  private def fieldByStorageKey(schema: StructType,
                                key: String): Option[StructField] =
    schema.fields.find(f => JsonlTable.physicalKeyOf(f) == key).orElse {
      val i = key.indexOf('.')
      if (i < 0) None
      else schema.fields
        .find(f => JsonlTable.physicalKeyOf(f) == key.substring(0, i))
        .map(f => f.name + key.substring(i))
        .flatMap(leafField(schema, _))
    }

  private def decode(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case LongType | TimestampType | TimestampNTZType => n.asLong
      case IntegerType | DateType => n.asInt
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
  def admits(index: Index, shard: String,
             filters: Seq[Filter], schema: StructType): Boolean =
    index.get(shard) match {
      case None => true // appended / compacted since the build
      case Some(e) => filters.forall(admitsOne(e, _, schema))
    }

  private[dsv2] def cmp(a: Any, b: Any, dt: DataType): Int = dt match {
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
    // stats hold Catalyst integers; a probe literal arrives as the
    // external java.sql/java.time object — normalize both sides
    case TimestampType | TimestampNTZType =>
      java.lang.Long.compare(microsOf(a), microsOf(b))
    case DateType => java.lang.Long.compare(daysOf(a), daysOf(b))
    case _ => 0
  }
  private def longOf(a: Any): Long = a match {
    case l: Long => l; case i: Int => i.toLong
    case s: Short => s.toLong; case b: Byte => b.toLong
    case other => other.toString.toLong
  }
  /** Epoch micros of a timestamp in ANY of its external runtime
    * forms (datetime-java8-API flag decides which one filters carry)
    * or its Catalyst long. */
  private[dsv2] def microsOf(a: Any): Long = a match {
    case l: Long => l
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case ldt: java.time.LocalDateTime =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(ldt)
    case other => other.toString.toLong
  }
  /** Epoch days of a date in any external runtime form or its
    * Catalyst int. */
  private[dsv2] def daysOf(a: Any): Long = a match {
    case i: Int => i.toLong
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case ld: java.time.LocalDate => ld.toEpochDay
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
    case (_: java.sql.Timestamp | _: java.time.Instant |
          _: java.time.LocalDateTime | _: Long,
      TimestampType | TimestampNTZType) => true
    case (_: java.sql.Date | _: java.time.LocalDate | _: Int,
      DateType) => true
    case _ => false
  }

  private def admitsOne(e: ShardEntry, f: Filter, schema: StructType): Boolean = {
    // filters name columns by DISPLAY name (possibly a dotted struct
    // leaf); entries key stats/blooms by the PHYSICAL key — resolve
    // through the schema field
    def statsOf(c: String): Option[((Any, Any, Long), DataType)] =
      leafField(schema, c).flatMap(fd =>
        e.stats.get(storageKeyOf(schema, c)).map(st => (st, fd.dataType)))
    def rangeAdmits(c: String, v: Any)(ok: (Int, Int) => Boolean): Boolean =
      statsOf(c) match {
        case Some(((mn, mx, _), dt))
            if mn != null && mx != null && comparable(v, dt) =>
          ok(cmp(v, mn, dt), cmp(v, mx, dt)) // (v vs min, v vs max)
        case _ => true
      }
    def bloomAdmits(c: String, v: Any): Boolean =
      (leafField(schema, c).flatMap(_ => e.blooms.get(storageKeyOf(schema, c))),
       leafField(schema, c)) match {
        // bloom probing stays scalar-only: xxhash64Of's contract
        // covers the five scalar types; temporal probes fall through
        // to range admission (which is the useful tier for time)
        case (Some(b), Some(fd)) if v != null && comparable(v, fd.dataType) &&
            scalarBloomType(fd.dataType) =>
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
      // IsNull stays sound on approx entries: folded nn == 0 means no
      // INPUT ever held a null and deletes cannot add one; nn > 0
      // merely admits. IsNotNull's all-null claim is the unsound one
      // — deletes may have removed exactly the non-null rows, so a
      // folded nn ≥ nRows proves nothing; approx entries admit.
      case IsNull(c) => statsOf(c) match {
        case Some(((_, _, nn), _)) => nn > 0
        case None => true
      }
      case IsNotNull(c) => !e.exact || (statsOf(c) match {
        // all-null shard for c: no non-null row can match
        case Some(((_, _, nn), _)) => nn < e.nRows
        case None => true
      })
      case _ => true
    }
  }

  private def scalarBloomType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType => true
    case _ => false
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
