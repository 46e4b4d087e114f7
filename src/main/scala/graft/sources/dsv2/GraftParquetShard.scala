package graft.sources.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.graftbridge.ParquetShardIO
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Columnar at-rest shard tier: `graft.format = 'parquet'` tables
  * store their shards as zstd parquet files instead of gzip line-JSON,
  * sharing EVERY layer of the connector's metadata unchanged — the
  * `_graft_table.json` spec, hive `k=v` dirs, `_skip` manifests,
  * `_snapshots` pins/CDC, `_eq_deletes` upsert waves, `_deletes`
  * position sidecars, and the staged-rename commit protocol are all
  * keyed by shard PATHS and row ORDINALS, never by bytes. Readers
  * dispatch PER FILE on the extension, so a table converted mid-life
  * (ALTER ... SET TBLPROPERTIES('graft.format'='parquet') + compact)
  * reads correctly while both populations coexist.
  *
  * Scale note: this is the 100 TB posture for numeric-heavy tables —
  * real columnar pruning (nested included), no per-row JSON parse, no
  * gzip-member decompression on pruned columns — while the JSONL tier
  * remains the append-friendly, human-debuggable default.
  */
object GraftParquetShard {
  val Suffix = ".parquet"

  /** Table-property value check: the format names the WRITE side only
    * (reads always dispatch per file). */
  def isParquetName(name: String): Boolean = name.endsWith(Suffix)

  /** Physical (storage-key-named) view of `schema` at `indices` — the
    * columns a shard file actually stores. */
  def fileSchema(schema: StructType, indices: Seq[Int]): StructType =
    StructType(indices.map { i =>
      val f = schema.fields(i)
      StructField(JsonlTable.physicalKeyOf(f), f.dataType, nullable = true)
    })
}

/** Filter → parquet row-group predicate translation, shared by the row
  * and the vectorized shard readers. Statistics-only (dictionary pages
  * included): whole row groups whose footer stats prove the predicate
  * can't match are skipped before any data page decodes; record-level
  * assembly filtering stays OFF, so surviving groups emit every row and
  * the engine-side filter (pushed evaluation on the row path, FilterExec
  * above batches on the vectorized path) stays the single source of
  * row-level truth. Conservative by construction: a shape, type, or
  * column the translator can't prove skippable simply doesn't
  * translate. */
object ParquetRowGroupFilter {
  import org.apache.parquet.filter2.predicate.FilterPredicate

  def attrOf(f: Filter): Option[String] = f match {
    case EqualTo(a, _) => Some(a)
    case In(a, _) => Some(a)
    case IsNull(a) => Some(a)
    case IsNotNull(a) => Some(a)
    case GreaterThan(a, _) => Some(a)
    case GreaterThanOrEqual(a, _) => Some(a)
    case LessThan(a, _) => Some(a)
    case LessThanOrEqual(a, _) => Some(a)
    case _ => None
  }

  /** Conjoin every translatable filter; None when nothing translates.
    * `injected` names columns not stored in the file (partition dirs,
    * metadata); `resolvedName` maps a declared field to the name the
    * footer actually carries (rename aliases); `footerType` is the
    * file's primitive type by name — the predicate is typed for the
    * DECLARED Catalyst type, and parquet's validation would reject it
    * on a shard written before a widening ALTER, so translation
    * requires an exact primitive match. */
  def build(filters: Seq[Filter], injected: String => Boolean,
            dataSchema: StructType, resolvedName: StructField => String,
            footerType: String => Option[String]): Option[FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.io.api.Binary
    def pred(f: Filter): Option[FilterPredicate] = {
      val a = attrOf(f).getOrElse(return None)
      if (injected(a)) return None // injected, not in file
      val fl = dataSchema.fields.find(_.name == a).getOrElse(return None)
      val name = resolvedName(fl)
      val want = fl.dataType match {
        case LongType => "INT64"
        case IntegerType => "INT32"
        case DoubleType => "DOUBLE"
        case StringType => "BINARY"
        case BooleanType => "BOOLEAN"
        case _ => return None
      }
      if (!footerType(name).contains(want)) return None
      def whenNonNull[T](v: Any)(mk: Any => T): Option[T] =
        if (v == null) None else Some(mk(v)) // SQL: null never matches
      fl.dataType match {
        case LongType =>
          val c = FilterApi.longColumn(name)
          def l(v: Any) = java.lang.Long.valueOf(
            v.asInstanceOf[Number].longValue)
          f match {
            case EqualTo(_, v) => whenNonNull(v)(x => FilterApi.eq(c, l(x)))
            case In(_, vs) if vs.length <= 16 =>
              vs.flatMap(v => whenNonNull(v)(x => FilterApi.eq(c, l(x))
                : FilterPredicate)).reduceOption(FilterApi.or)
            case GreaterThan(_, v) => whenNonNull(v)(x => FilterApi.gt(c, l(x)))
            case GreaterThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.gtEq(c, l(x)))
            case LessThan(_, v) => whenNonNull(v)(x => FilterApi.lt(c, l(x)))
            case LessThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.ltEq(c, l(x)))
            case IsNull(_) => Some(FilterApi.eq(c, null.asInstanceOf[java.lang.Long]))
            case IsNotNull(_) => Some(FilterApi.notEq(c, null.asInstanceOf[java.lang.Long]))
            case _ => None
          }
        case IntegerType =>
          val c = FilterApi.intColumn(name)
          def i(v: Any) = java.lang.Integer.valueOf(
            v.asInstanceOf[Number].intValue)
          f match {
            case EqualTo(_, v) => whenNonNull(v)(x => FilterApi.eq(c, i(x)))
            case In(_, vs) if vs.length <= 16 =>
              vs.flatMap(v => whenNonNull(v)(x => FilterApi.eq(c, i(x))
                : FilterPredicate)).reduceOption(FilterApi.or)
            case GreaterThan(_, v) => whenNonNull(v)(x => FilterApi.gt(c, i(x)))
            case GreaterThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.gtEq(c, i(x)))
            case LessThan(_, v) => whenNonNull(v)(x => FilterApi.lt(c, i(x)))
            case LessThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.ltEq(c, i(x)))
            case IsNull(_) => Some(FilterApi.eq(c, null.asInstanceOf[java.lang.Integer]))
            case IsNotNull(_) => Some(FilterApi.notEq(c, null.asInstanceOf[java.lang.Integer]))
            case _ => None
          }
        case DoubleType =>
          val c = FilterApi.doubleColumn(name)
          def d(v: Any) = java.lang.Double.valueOf(
            v.asInstanceOf[Number].doubleValue)
          f match {
            case EqualTo(_, v) => whenNonNull(v)(x => FilterApi.eq(c, d(x)))
            case GreaterThan(_, v) => whenNonNull(v)(x => FilterApi.gt(c, d(x)))
            case GreaterThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.gtEq(c, d(x)))
            case LessThan(_, v) => whenNonNull(v)(x => FilterApi.lt(c, d(x)))
            case LessThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.ltEq(c, d(x)))
            case IsNull(_) => Some(FilterApi.eq(c, null.asInstanceOf[java.lang.Double]))
            case IsNotNull(_) => Some(FilterApi.notEq(c, null.asInstanceOf[java.lang.Double]))
            case _ => None
          }
        case StringType =>
          val c = FilterApi.binaryColumn(name)
          def b(v: Any) = Binary.fromString(v.asInstanceOf[String])
          f match {
            case EqualTo(_, v) => whenNonNull(v)(x => FilterApi.eq(c, b(x)))
            case In(_, vs) if vs.length <= 16 =>
              vs.flatMap(v => whenNonNull(v)(x => FilterApi.eq(c, b(x))
                : FilterPredicate)).reduceOption(FilterApi.or)
            case GreaterThan(_, v) => whenNonNull(v)(x => FilterApi.gt(c, b(x)))
            case GreaterThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.gtEq(c, b(x)))
            case LessThan(_, v) => whenNonNull(v)(x => FilterApi.lt(c, b(x)))
            case LessThanOrEqual(_, v) =>
              whenNonNull(v)(x => FilterApi.ltEq(c, b(x)))
            case IsNull(_) => Some(FilterApi.eq(c, null.asInstanceOf[Binary]))
            case IsNotNull(_) => Some(FilterApi.notEq(c, null.asInstanceOf[Binary]))
            case _ => None
          }
        case BooleanType =>
          val c = FilterApi.booleanColumn(name)
          f match {
            case EqualTo(_, v) => whenNonNull(v)(x => FilterApi.eq(c,
              java.lang.Boolean.valueOf(x.asInstanceOf[java.lang.Boolean])))
            case IsNull(_) => Some(FilterApi.eq(c, null.asInstanceOf[java.lang.Boolean]))
            case IsNotNull(_) => Some(FilterApi.notEq(c, null.asInstanceOf[java.lang.Boolean]))
            case _ => None
          }
        case _ => None
      }
    }
    try filters.flatMap(pred(_)).reduceOption(FilterApi.and)
    catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** Shared surviving-ordinal mask for one batch: `map(0 until n)` are
  * the batch-relative row ids that survive the position-delete / keep
  * bitsets. One holder per reader, referenced by every
  * [[MaskedColumnVector]] wrapping that reader's vectors, refilled in
  * place per batch (the array is allocated once at batch capacity). */
final class GraftColumnMask(capacity: Int) {
  val map: Array[Int] = new Array[Int](capacity)
  var n: Int = 0
}

/** Read-only [[ColumnVector]] view remapping row ids through a shared
  * [[GraftColumnMask]] — how position deletes (and CDC keep sets) apply
  * on the VECTORIZED path: instead of disarming columnar reads, the
  * batch keeps its decoded vectors and deleted ordinals are simply
  * absent from the mask (the Iceberg/Delta deletion-vector pattern).
  * Struct children share the parent's mask; array/map reads delegate
  * whole (element storage is flat — offsets inside the base vector stay
  * absolute). `numNulls`/`hasNull` are conservative upper bounds from
  * the base vector, which is safe for every consumer (they specialize
  * the null path, never assume non-null from a zero). */
final class MaskedColumnVector(base: org.apache.spark.sql.vectorized.ColumnVector,
                               mask: GraftColumnMask)
    extends org.apache.spark.sql.vectorized.ColumnVector(base.dataType) {
  import org.apache.spark.sql.vectorized.ColumnVector
  override def close(): Unit = () // base is owned by the parquet reader
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = base.numNulls
  override def isNullAt(i: Int): Boolean = base.isNullAt(mask.map(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(mask.map(i))
  override def getByte(i: Int): Byte = base.getByte(mask.map(i))
  override def getShort(i: Int): Short = base.getShort(mask.map(i))
  override def getInt(i: Int): Int = base.getInt(mask.map(i))
  override def getLong(i: Int): Long = base.getLong(mask.map(i))
  override def getFloat(i: Int): Float = base.getFloat(mask.map(i))
  override def getDouble(i: Int): Double = base.getDouble(mask.map(i))
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    base.getArray(mask.map(i))
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    base.getMap(mask.map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    base.getDecimal(mask.map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String =
    base.getUTF8String(mask.map(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(mask.map(i))
  private lazy val kids = new java.util.concurrent.ConcurrentHashMap[
    Integer, ColumnVector]()
  override def getChild(ordinal: Int): ColumnVector =
    kids.computeIfAbsent(ordinal,
      o => new MaskedColumnVector(base.getChild(o), mask))
}

/** VECTORIZED parquet shard scan: [[org.apache.spark.sql.vectorized.ColumnarBatch]]es
  * straight from Spark's own vectorized column readers — the default
  * for parquet partitions emitting rows verbatim-or-masked (no claimed
  * row filters, no reachable equality state, no metadata columns),
  * which covers the full-scan / aggregate shape that dominates at
  * 100 TB AND — since round 16 — both of the shapes that used to
  * disarm it:
  *
  *  - FILTERED scans: parquet-format tables DECLINE row-filter
  *    pushdown ([[JsonlScanBuilder.pushFilters]]), so FilterExec runs
  *    above the batch stream while the same predicates arrive here as
  *    `prune` and skip whole row groups via footer statistics
  *    ([[ParquetRowGroupFilter]]) — pruning without row
  *    materialization.
  *  - MUTATED shards: position-delete sidecars / pinned ordinals /
  *    CDC keep sets apply as a per-batch SELECTION MASK
  *    ([[MaskedColumnVector]]) instead of falling back to the row
  *    reader — per-row-group offset bookkeeping is unnecessary because
  *    masking disables group skipping, keeping batch ordinals exactly
  *    file-sequential (the `_pos` contract the sidecars are keyed by).
  *
  * Partition-directory values ride as constant vectors; the batch view
  * is permuted once to the projection's column order (the underlying
  * reader appends partition columns last). Anything still conditional
  * (equality-delete hiding, `_pos`/`_shard`/`_change` projections,
  * pushed LIMIT) takes [[ParquetShardReader]]'s row path instead. */
final class ParquetVectorizedShardReader(file: String, required: StructType,
                                         partValues: Map[String, Option[String]],
                                         dataSchema: StructType,
                                         conf: JsonlHadoopConf,
                                         prune: Array[Filter] = Array.empty,
                                         deletesPath: String = null,
                                         deletePositions: Array[Long] = null,
                                         keepPositions: Array[Long] = null)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val fileFields: Seq[StructField] =
    required.fields.toSeq.filterNot(f => partValues.contains(f.name))
  private val partFields: Seq[StructField] =
    required.fields.toSeq.filter(f => partValues.contains(f.name))

  private lazy val footerTypes: Map[String, String] =
    ParquetShardIO.footerFieldTypes(new Path(file), conf.value)
  private val needFooter: Boolean =
    fileFields.exists(f => JsonlTable.aliasesOf(f).nonEmpty)
  private def resolvedName(f: StructField): String = {
    val phys = JsonlTable.physicalKeyOf(f)
    if (JsonlTable.aliasesOf(f).isEmpty || footerTypes.contains(phys)) phys
    else JsonlTable.aliasesOf(f).find(footerTypes.contains).getOrElse(phys)
  }
  private val readSchema: StructType = StructType(fileFields.map { f =>
    val phys = JsonlTable.physicalKeyOf(f)
    val name =
      if (!needFooter || footerTypes.contains(phys)) phys
      else JsonlTable.aliasesOf(f).find(footerTypes.contains).getOrElse(phys)
    StructField(name, f.dataType, nullable = true)
  })

  // ---- position-delete / keep-set mask state (merge-on-read,
  // snapshot-pinned ordinals, CDC keep pieces)
  // ordinal-range guard matches JsonlDeletes.readBitSet: a pinned
  // ordinal above Int.MaxValue would wrap negative in toInt and set a
  // wrong bit (or throw inside BitSet) — refuse loudly instead
  private def toBitSet(positions: Array[Long],
                       what: String): java.util.BitSet = {
    val bs = new java.util.BitSet()
    positions.foreach { pos =>
      require(pos >= 0 && pos <= Int.MaxValue,
        s"$what ordinal $pos out of int range for $file")
      bs.set(pos.toInt)
    }
    bs
  }
  private val deleted: java.util.BitSet =
    if (deletePositions != null) toBitSet(deletePositions, "delete")
    else if (deletesPath == null) null
    else JsonlDeletes.readBitSet(conf, deletesPath)
  private val kept: java.util.BitSet =
    if (keepPositions == null) null
    else toBitSet(keepPositions, "keep")
  private val masking: Boolean = deleted != null || kept != null

  // row-group pruning from the DECLINED filters: footer statistics skip
  // whole groups before any page decodes. Group skipping shifts batch
  // ordinals, so it arms only when NOT masking (masks are keyed by
  // file-sequential ordinals); `_pos` projections never reach this
  // reader (they disarm vectorization at the scan).
  private val rowGroupFilter
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] =
    if (prune.isEmpty || masking) None
    else ParquetRowGroupFilter.build(prune.toSeq, partValues.contains,
      dataSchema, resolvedName, footerTypes.get)

  private val partRow: InternalRow = {
    val vals = partFields.map { f =>
      partValues(f.name) match {
        case None => null
        case Some(s) => try f.dataType match {
          case LongType => java.lang.Long.valueOf(s.toLong)
          case IntegerType => java.lang.Integer.valueOf(s.toInt)
          case DoubleType => java.lang.Double.valueOf(s.toDouble)
          case BooleanType => java.lang.Boolean.valueOf(s.toBoolean)
          case _ => org.apache.spark.unsafe.types.UTF8String.fromString(s)
        } catch { case _: Exception => null }
      }
    }
    new GenericInternalRow(vals.toArray[Any])
  }

  private val Capacity = 4096
  private val reader = ParquetShardIO.openVectorizedReader(
    new Path(file), readSchema, conf.value,
    StructType(partFields), partRow, Capacity, rowGroupFilter)

  // the underlying batch lays out file columns then partition columns;
  // permute ONCE into the projection's order (vectors are stable
  // across batches — the reader reuses them). When masking, each
  // permuted vector is additionally wrapped in a MaskedColumnVector
  // sharing ONE mask holder, refilled in place per batch.
  private val mask: GraftColumnMask = if (masking) new GraftColumnMask(Capacity) else null
  private var view: ColumnarBatch = _
  private def buildView(b: ColumnarBatch): ColumnarBatch = {
    val byName = fileFields.map(_.name).zipWithIndex.toMap
    val partByName = partFields.map(_.name).zipWithIndex.toMap
    val cols: Array[ColumnVector] = required.fields.map { f =>
      val base = byName.get(f.name) match {
        case Some(i) => b.column(i)
        case None => b.column(fileFields.length + partByName(f.name))
      }
      if (masking) new MaskedColumnVector(base, mask) else base
    }
    new ColumnarBatch(cols)
  }

  private var posBase: Long = 0L // file ordinal of the current batch's first row

  override def next(): Boolean = {
    val has = reader.nextKeyValue()
    if (has) {
      val b = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      if (view == null) view = buildView(b)
      val n = b.numRows()
      if (!masking) view.setNumRows(n)
      else {
        // surviving batch-relative ordinals under the delete/keep
        // bitsets — same drop rule as the row reader
        var m = 0
        var i = 0
        while (i < n) {
          val pos = posBase + i
          val dropped = (deleted != null && pos <= Int.MaxValue &&
            deleted.get(pos.toInt)) ||
            (kept != null && (pos > Int.MaxValue || !kept.get(pos.toInt)))
          if (!dropped) { mask.map(m) = i; m += 1 }
          i += 1
        }
        posBase += n
        mask.n = m
        view.setNumRows(m)
      }
    }
    has
  }
  override def get(): ColumnarBatch = view
  override def close(): Unit = reader.close()
}

/** One parquet shard as a [[PartitionReader]] with the SAME emission
  * semantics as [[JsonlPartitionReader]] — partition-directory value
  * injection, `_shard`/`_pos`/`_change` metadata columns, pushed-filter
  * evaluation (typed, exact — the file stores real types, so no JSON
  * coercion lattice), equality-delete hiding / change-feed preimage
  * emission, merge-on-read position-delete and keep bitsets, and the
  * pushed LIMIT. Row ordinals are the sequential whole-file read
  * positions, stable because shards are immutable once published —
  * the `_pos` contract position deletes are keyed by. */
final class ParquetShardReader(file: String, required: StructType,
                               pushed: Array[Filter],
                               partValues: Map[String, Option[String]],
                               dataSchema: StructType,
                               conf: JsonlHadoopConf,
                               limit: Int = -1,
                               deletesPath: String = null,
                               deletePositions: Array[Long] = null,
                               changeKind: String = null,
                               keepPositions: Array[Long] = null,
                               eqDeletes: Map[String, Long] = Map.empty,
                               eqCols: Seq[String] = Nil,
                               eqEmit: Map[String, Long] = Map.empty,
                               // DECLINED filters (prune-only channel):
                               // row-group skipping only, never
                               // row-evaluated — FilterExec re-checks
                               // above the scan
                               prune: Array[Filter] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val eqShardSeq: Long =
    JsonlEqDeletes.shardSeqOf(new Path(file).getName)
  private val eqActive: Boolean = eqCols.nonEmpty && eqDeletes.nonEmpty &&
    eqDeletes.valuesIterator.max > eqShardSeq
  private val eqEmitActive: Boolean = eqCols.nonEmpty && eqEmit.nonEmpty

  // ordinal-range guard matches JsonlDeletes.readBitSet: a pinned
  // ordinal above Int.MaxValue would wrap negative in toInt and set a
  // wrong bit (or throw inside BitSet) — refuse loudly instead
  private def toBitSet(positions: Array[Long],
                       what: String): java.util.BitSet = {
    val bs = new java.util.BitSet()
    positions.foreach { pos =>
      require(pos >= 0 && pos <= Int.MaxValue,
        s"$what ordinal $pos out of int range for $file")
      bs.set(pos.toInt)
    }
    bs
  }
  private val deleted: java.util.BitSet =
    if (deletePositions != null) toBitSet(deletePositions, "delete")
    else if (deletesPath == null) null
    else JsonlDeletes.readBitSet(conf, deletesPath)
  private val kept: java.util.BitSet =
    if (keepPositions == null) null
    else toBitSet(keepPositions, "keep")

  // ---- the columns the FILE must supply: required data columns plus
  // filter/eq-key columns outside the projection. Partition-directory
  // columns and metadata columns are injected, never read.
  private val metaNames = Set("_pos", "_shard", "_change")
  private def isInjected(name: String): Boolean =
    metaNames.contains(name) || partValues.contains(name)

  private def attrOf(f: Filter): Option[String] = ParquetRowGroupFilter.attrOf(f)
  private val filterAttrs: Seq[String] =
    pushed.toSeq.flatMap(attrOf(_)).distinct
  private val wantedNames: Seq[String] =
    (required.fields.map(_.name).toSeq ++ filterAttrs ++ eqCols)
      .distinct.filterNot(isInjected)
      .filter(n => dataSchema.fieldNames.contains(n))

  // rename-alias resolution: a shard written BEFORE a rename stores
  // the old key — resolve each wanted field to the name the FOOTER
  // actually carries (one footer read, paid only when aliases exist
  // or when row-group pruning wants column presence confirmed)
  private val fields: Seq[StructField] =
    wantedNames.map(n => dataSchema(dataSchema.fieldIndex(n)))
  private lazy val footerTypes: Map[String, String] =
    ParquetShardIO.footerFieldTypes(new Path(file), conf.value)
  private lazy val footerNames: Set[String] = footerTypes.keySet
  private val needFooter: Boolean =
    fields.exists(f => JsonlTable.aliasesOf(f).nonEmpty)
  private def resolvedName(f: StructField): String = {
    val phys = JsonlTable.physicalKeyOf(f)
    if (!needFooter || footerNames.contains(phys)) phys
    else JsonlTable.aliasesOf(f).find(footerNames.contains).getOrElse(phys)
  }
  private val readSchema: StructType = StructType(fields.map { f =>
    StructField(resolvedName(f), f.dataType, nullable = true)
  })
  // display name -> position in the read row
  private val readIdx: Map[String, Int] =
    wantedNames.zipWithIndex.toMap

  // ROW-GROUP pruning — footer statistics skip whole groups before
  // any page decodes ([[ParquetRowGroupFilter]]). Skipping shifts row
  // ordinals, so this arms ONLY when nothing position-sensitive is in
  // play: no delete/keep ordinals (live sidecar or snapshot-pinned),
  // no CDC kind, and `_pos` not projected. Equality-delete hiding is
  // VALUE-based and composes fine. PUSHED filters (claimed, jsonl-
  // format tables reading parquet shards) and DECLINED prune-only
  // filters (parquet-format tables) both feed it; untranslated shapes
  // still evaluate row-level below for `pushed`, and FilterExec
  // re-checks `prune` — pruning is an overlay, never the answer.
  private val rowGroupFilter
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] =
    if ((pushed.isEmpty && prune.isEmpty) || deletesPath != null ||
        deletePositions != null || keepPositions != null ||
        changeKind != null || required.fieldNames.contains("_pos")) None
    else ParquetRowGroupFilter.build((pushed ++ prune).toSeq.distinct,
      partValues.contains, dataSchema, resolvedName, footerTypes.get)

  private val reader =
    ParquetShardIO.openReader(new Path(file), readSchema, conf.value,
      rowGroupFilter)

  // ---- typed partition constants (declared type; unparseable -> null,
  // the JSONL readers' mismatch posture). A null partition value (the
  // __HIVE_DEFAULT_PARTITION__ dir) masks the column to SQL null.
  private val partConst: Map[String, Any] = partValues.map { case (k, v) =>
    k -> (v match {
      case None => null
      case Some(s) =>
        val dt = dataSchema.fields.find(_.name == k).map(_.dataType)
          .getOrElse(StringType)
        try dt match {
          case LongType => java.lang.Long.valueOf(s.toLong)
          case IntegerType => java.lang.Integer.valueOf(s.toInt)
          case DoubleType => java.lang.Double.valueOf(s.toDouble)
          case BooleanType => java.lang.Boolean.valueOf(s.toBoolean)
          case _ => UTF8String.fromString(s)
        } catch { case _: Exception => null }
    })
  }

  private var row: InternalRow = _ // the reader's reused buffer row
  private var currentPos: Long = -1L
  private var emittedRows = 0L

  private def declaredType(name: String): DataType =
    dataSchema.fields.find(_.name == name).map(_.dataType)
      .getOrElse(StringType)

  /** Current value of display column `name`: injected constant first
    * (partition dirs mask the file, as in the JSONL reader), then the
    * read row. */
  private def valueOf(name: String): Any =
    if (partValues.contains(name)) partConst(name)
    else readIdx.get(name) match {
      case Some(i) =>
        if (row.isNullAt(i)) null
        else row.get(i, readSchema.fields(i).dataType)
      case None => null
    }

  // ---- equality-delete key rendering: the same writer-side renderer
  // ([[JsonlEqDeletes.renderRow]]) over a tuple row of the key columns
  // in their DECLARED types — identical strings to the published keys.
  private lazy val eqSchema: StructType =
    StructType(eqCols.map(c => StructField(c, declaredType(c))))
  private lazy val eqIdx: Seq[Int] = eqCols.indices
  private lazy val eqRow = new GenericInternalRow(eqCols.length)
  private def eqKeyOf(): String = {
    var i = 0
    while (i < eqCols.length) {
      eqRow.update(i, valueOf(eqCols(i)))
      i += 1
    }
    JsonlEqDeletes.renderRow(eqRow, eqSchema, eqIdx)
  }
  private def eqHidden(): Boolean =
    if (!eqActive && !eqEmitActive) false
    else {
      val key = eqKeyOf()
      (eqActive && eqDeletes.get(key).exists(_ > eqShardSeq)) ||
        (eqEmitActive && !eqEmit.get(key).exists(_ > eqShardSeq))
    }

  // ---- pushed-filter evaluation: typed three-valued compare collapsed
  // to match/no-match. Values are exact (real column types), so only
  // the five pushable scalar shapes need handling.
  private def cmp(attr: String, value: Any): Option[Int] = {
    val v = valueOf(attr)
    if (v == null || value == null) None
    else (v, value) match {
      case (l: java.lang.Long, n: Number) =>
        numCmp(l.longValue.toDouble, isIntegral = true, l.longValue, n)
      case (i: java.lang.Integer, n: Number) =>
        numCmp(i.intValue.toDouble, isIntegral = true, i.longValue, n)
      case (d: java.lang.Double, n: Number) =>
        numCmp(d.doubleValue, isIntegral = false, 0L, n)
      // UTF8 BYTE order — Spark's own string comparison (UTF8String)
      // and DuckDB's agree on it; java.lang.String.compareTo is UTF-16
      // code-unit order, which diverges for supplementary characters
      case (s: UTF8String, t: String) =>
        Some(s.compareTo(UTF8String.fromString(t)))
      case (b: java.lang.Boolean, t: java.lang.Boolean) =>
        Some(java.lang.Boolean.compare(b, t))
      case _ => None
    }
  }
  private def numCmp(lhsD: Double, isIntegral: Boolean, lhsL: Long,
                     rhs: Number): Option[Int] = {
    val rhsIntegral = rhs.isInstanceOf[java.lang.Long] ||
      rhs.isInstanceOf[java.lang.Integer] || rhs.isInstanceOf[java.lang.Short]
    if (isIntegral && rhsIntegral)
      Some(java.lang.Long.compare(lhsL, rhs.longValue))
    else Some(java.lang.Double.compare(lhsD, rhs.doubleValue))
  }
  private def matches(f: Filter): Boolean = f match {
    case EqualTo(a, v) => cmp(a, v).contains(0)
    case In(a, vs) => vs.exists(v => cmp(a, v).contains(0))
    case IsNull(a) => valueOf(a) == null
    case IsNotNull(a) => valueOf(a) != null
    case GreaterThan(a, v) => cmp(a, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
    case LessThan(a, v) => cmp(a, v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, v).exists(_ <= 0)
    case _ => true // unsupported shapes were returned as residual
  }

  // ---- materialization into the REQUIRED schema. Values leaving the
  // reader outlive the converter's reused row buffer: deep-copy
  // object types ([[ParquetShardIO.copyValue]]).
  private def materialize(): InternalRow = {
    val r = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      f.name match {
        case "_pos" => r.setLong(i, currentPos)
        case "_shard" => r.update(i, UTF8String.fromString(file))
        case "_change" =>
          if (changeKind == null) r.setNullAt(i)
          else r.update(i, UTF8String.fromString(changeKind))
        case n =>
          val v = valueOf(n)
          if (v == null) r.setNullAt(i)
          else r.update(i, v match {
            case b: Array[Byte] => b.clone()
            case other => ParquetShardIO.copyValue(other)
          })
      }
      i += 1
    }
    r
  }

  private var out: InternalRow = _

  override def next(): Boolean = {
    if (limit >= 0 && emittedRows >= limit) return false
    while (reader.nextKeyValue()) {
      currentPos += 1
      row = reader.getCurrentValue
      val dropped = (deleted != null && currentPos <= Int.MaxValue &&
        deleted.get(currentPos.toInt)) ||
        (kept != null && (currentPos > Int.MaxValue ||
          !kept.get(currentPos.toInt)))
      if (!dropped && !eqHidden() && pushed.forall(matches)) {
        out = materialize()
        emittedRows += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = out
  override def close(): Unit = reader.close()
}
