package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) corpus source/sink — the standard
  * interchange format for LLM training corpora (one doc per line,
  * directory of `.jsonl[.gz]` shards, optionally partitioned by a
  * metadata column).
  *
  * Read is SCHEMA-DECLARED, never inferred: inference reads the data
  * twice and silently widens types from whatever the first files
  * contain — at corpus scale both are failure modes, not conveniences.
  * Malformed lines land in a `_corrupt` column (PERMISSIVE mode)
  * rather than killing the job or disappearing: a training pipeline
  * must be able to COUNT what it dropped ([[readStats]]).
  *
  * Shape at 100 TB: both read and write are narrow (no shuffle); the
  * sink partitions by a low-cardinality metadata column (`lang`) so
  * downstream per-language processing partition-prunes, and shard
  * count follows the upstream partitioning (one file per task — size
  * with repartition at the call site or compact after with
  * [[graft.operators.Compaction]]).
  */
object JsonlCorpus {

  /** The documents-table schema, shared by read and write. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private[graft] val CorruptCol = "_corrupt"

  /** Read a JSONL corpus with the declared schema; rows that fail to
    * parse keep their raw line in `_corrupt` and null elsewhere. */
  def read(spark: SparkSession, path: String,
           schema: StructType = docSchema): DataFrame = {
    val withCorrupt = schema.add(StructField(CorruptCol, StringType))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Streaming twin of [[readClean]]: a file-source stream over a
    * JSONL drop directory, clean rows only, same declared-schema
    * contract (PERMISSIVE + corrupt-column here rather than
    * DROPMALFORMED: the streaming source rejects parser-dropped rows
    * counting against the declared schema, and downstream consumers
    * reference data columns so the corrupt-only-scan restriction never
    * applies). */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType = docSchema): DataFrame =
    spark.readStream
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .filter(col(CorruptCol).isNull)
      .drop(CorruptCol)

  /** Clean rows only (the ingest contract: a malformed line must never
    * surface as a null-text "document"). DROPMALFORMED rather than a
    * filter on the corrupt column: Spark rejects scans whose only
    * referenced column is the corrupt-record column (e.g. a count() on
    * the filtered frame), and dropping malformed lines in the parser
    * is the semantics wanted here anyway. */
  def readClean(spark: SparkSession, path: String,
                schema: StructType = docSchema): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** (clean, corrupt) counts for ingest observability — one pass.
    * A data column rides along in the aggregate because Spark rejects
    * queries whose only referenced JSON column is the corrupt-record
    * column (the parser would have nothing to fail on). */
  def readStats(spark: SparkSession, path: String,
                schema: StructType = docSchema): (Long, Long) = {
    val probe = schema.fields.head.name
    val r = read(spark, path, schema)
      .agg(count(lit(1)).as("total"),
        count(col(CorruptCol)).as("corrupt"),
        count(col(probe)).as("probe")).head()
    (r.getLong(0) - r.getLong(1), r.getLong(1))
  }

  /** Write a corpus as JSONL shards partitioned by `partitionCol`
    * (empty = unpartitioned), gzip-compressed. */
  def write(docs: DataFrame, path: String,
            partitionCol: Option[String] = Some("lang"),
            compression: String = "gzip"): Unit = {
    val w = docs.write.mode("overwrite")
      .option("compression", compression)
    partitionCol.fold(w)(c => w.partitionBy(c)).json(path)
  }
}
