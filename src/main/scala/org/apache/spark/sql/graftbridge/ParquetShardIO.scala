package org.apache.spark.sql.graftbridge

import java.time.ZoneId

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetRecordReader, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.RebaseDateTime.RebaseSpec
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
import org.apache.spark.sql.internal.LegacyBehaviorPolicy
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's own parquet <-> `InternalRow` machinery
  * (`ParquetWriteSupport` / `ParquetReadSupport`, the classes behind
  * `spark.read.parquet`) for the graft connector's columnar at-rest
  * shard format. Lives under `org.apache.spark.sql` solely for
  * access-proofing against `private[sql]` tightening, the same pattern
  * as [[ColumnBridge]]; the graft-facing surface is
  * `graft.sources.dsv2.GraftParquetShard`.
  *
  * One shard = one parquet file, written and read WHOLE (the
  * connector's parallelism unit is the shard, and sequential
  * whole-file reads keep row ordinals stable — the same `_pos`
  * contract the JSONL line reader provides, which the merge-on-read
  * position deletes depend on). Timestamps are written as annotated
  * MICROS with rebase mode CORRECTED on both paths — modern files,
  * no Julian-era ambiguity.
  */
object ParquetShardIO {

  /** All write-path conf the `ParquetWriteSupport.init` contract
    * asserts on, pinned explicitly (the shard writer runs outside any
    * SQLConf): standard non-legacy layout, annotated int64 MICROS
    * timestamps, CORRECTED rebase, no field ids. */
  private def writeConf(base: Configuration, schema: StructType)
      : Configuration = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = new Configuration(base)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    conf
  }

  private class RowBuilder(out: HadoopOutputFile)
      extends ParquetWriter.Builder[InternalRow, RowBuilder](out) {
    override def self(): RowBuilder = this
    override def getWriteSupport(conf: Configuration)
        : WriteSupport[InternalRow] = new ParquetWriteSupport
  }

  /** Writer for one shard file: `fileSchema` names are the PHYSICAL
    * storage keys (rename/drop indirection is resolved by the caller);
    * rows must match it positionally. */
  def createWriter(file: Path, fileSchema: StructType, base: Configuration,
                   codec: String): ParquetWriter[InternalRow] = {
    val conf = writeConf(base, fileSchema)
    new RowBuilder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withCompressionCodec(
        CompressionCodecName.fromConf(codec.toUpperCase(java.util.Locale.ROOT)))
      .build()
  }

  /** Whole-file row reader: yields rows positionally matching
    * `readSchema` (names must be storage keys as present in the file —
    * a requested column ABSENT from the file reads as null, Spark's
    * own schema-evolution posture, which also covers widened numeric
    * types via the converter's type-promotion support). */
  def openReader(file: Path, readSchema: StructType, base: Configuration)
      : ParquetRecordReader[InternalRow] = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = new Configuration(base)
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      readSchema.json)
    // every key ParquetToSparkSchemaConverter(conf) reads, pinned —
    // the shard reader runs on bare executors with no SQLConf to
    // supply defaults, and several entries are read unguarded
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key, "false")
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, "true")
    conf.set(SQLConf.PARQUET_IGNORE_VARIANT_ANNOTATION.key, "false")
    conf.set(SQLConf.CASE_SENSITIVE.key, "false")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, "false")
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    conf.set(SQLConf.PARQUET_READER_RESPECT_UNKNOWN_TYPE_ANNOTATION.key,
      "false")
    conf.set(SQLConf.VARIANT_ALLOW_READING_SHREDDED.key, "false")
    val support = new ParquetReadSupport(
      None, // convertTz: files carry UTC-normalized annotated micros
      false,
      RebaseSpec(LegacyBehaviorPolicy.CORRECTED),
      RebaseSpec(LegacyBehaviorPolicy.CORRECTED))
    val reader = new ParquetRecordReader[InternalRow](support)
    val fs = file.getFileSystem(conf)
    val split = new org.apache.hadoop.mapreduce.lib.input.FileSplit(
      file, 0, fs.getFileStatus(file).getLen, Array.empty[String])
    val context = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    reader.initialize(split, context)
    reader
  }

  /** Top-level field names present in a shard's footer — the
    * rename-alias resolution probe (one footer read; only paid when
    * the schema carries aliases). */
  def footerFieldNames(file: Path, conf: Configuration): Set[String] = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val fields = r.getFileMetaData.getSchema.getFields
      val out = Set.newBuilder[String]
      var i = 0
      while (i < fields.size()) { out += fields.get(i).getName; i += 1 }
      out.result()
    } finally r.close()
  }

  /** Footer row count — lets COUNT(*)-only aggregate pushdown answer
    * without decoding a single page. */
  def footerRowCount(file: Path, conf: Configuration): Long = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try r.getRecordCount finally r.close()
  }

  /** Copy a value out of a converter-owned row: parquet's record
    * materializer reuses buffers across `nextKeyValue`, so anything
    * referenced beyond the current row must be deep-copied. */
  def copyValue(v: Any): Any = InternalRow.copyValue(v)

  val utcZone: ZoneId = java.time.ZoneOffset.UTC
}
