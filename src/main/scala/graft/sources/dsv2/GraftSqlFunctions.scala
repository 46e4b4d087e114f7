package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CoerceNumeric, PyLiteral, SimHashFingerprint, WordNgrams}

/** The graft native scalar functions as Spark DSv2 CATALOG functions —
  * `SELECT wh.system.py_to_json(...)`, the FunctionCatalog face of the
  * same implementations the session extensions register by bare name
  * ([[graft.sql.GraftExtensions]]). Unlike views, the v2 function path
  * IS fully wired in vanilla Spark: the analyzer resolves
  * `catalog.namespace.fn`, binds against the input schema, and plans
  * the MAGIC-METHOD `invoke` overload (each function below carries
  * one) as a direct codegen'd call — no UDF envelope, same
  * whole-stage-codegen class as the session-registered expressions.
  *
  * Each function delegates to the SAME static `compute` entry points
  * the Catalyst expressions use, so catalog-path and expression-path
  * results are identical by construction. */
object GraftSqlFunctions {

  val names: Seq[String] =
    Seq("py_to_json", "coerce_numeric", "word_ngrams", "simhash_fingerprint")

  def load(name: String): UnboundFunction = name match {
    case "py_to_json" => unbound("py_to_json",
      "Python-literal text to canonical JSON (null on parse failure)",
      Array(StringType), PyToJsonFn)
    case "coerce_numeric" => unbound("coerce_numeric",
      "defensive numeric coercion: number text, or first numeric of a " +
        "Python-literal list/dict (null when nothing numeric)",
      Array(StringType), CoerceNumericFn)
    case "word_ngrams" => unbound("word_ngrams",
      "sliding word n-grams of a space-tokenized string",
      Array(StringType, IntegerType), WordNgramsFn)
    case "simhash_fingerprint" => unbound("simhash_fingerprint",
      "per-word md5 sign-vote simhash as a hex string",
      Array(StringType, IntegerType), SimHashFn)
    case other => throw new IllegalArgumentException(
      s"unknown graft function $other")
  }

  private def unbound(fnName: String, doc: String,
                      expected: Array[DataType],
                      bound: BoundFunction): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fnName
      override def description(): String = s"graft $fnName: $doc"
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.fields.length == expected.length,
          s"$fnName expects ${expected.length} argument(s), " +
            s"got ${inputType.fields.length}")
        inputType.fields.zip(expected).foreach { case (f, dt) =>
          require(f.dataType == dt,
            s"$fnName: argument ${f.name} must be $dt, got ${f.dataType}")
        }
        bound
      }
    }

  private object PyToJsonFn extends ScalarFunction[UTF8String] {
    override def name(): String = "py_to_json"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def isResultNullable: Boolean = true
    // the MAGIC method: resolved reflectively by name+signature and
    // planned as a codegen'd Invoke
    def invoke(s: UTF8String): UTF8String =
      if (s == null) null
      else Option(PyLiteral.toJson(s.toString))
        .map(UTF8String.fromString).orNull
    override def produceResult(input: InternalRow): UTF8String =
      invoke(input.getUTF8String(0))
  }

  private object CoerceNumericFn extends ScalarFunction[java.lang.Double] {
    override def name(): String = "coerce_numeric"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = DoubleType
    override def isResultNullable: Boolean = true
    def invoke(s: UTF8String): java.lang.Double = CoerceNumeric.coerce(s)
    override def produceResult(input: InternalRow): java.lang.Double =
      invoke(input.getUTF8String(0))
  }

  private object WordNgramsFn extends ScalarFunction[ArrayData] {
    override def name(): String = "word_ngrams"
    override def inputTypes(): Array[DataType] =
      Array(StringType, IntegerType)
    override def resultType(): DataType = ArrayType(StringType, false)
    override def isResultNullable: Boolean = true
    def invoke(s: UTF8String, n: Int): ArrayData =
      if (s == null) null else WordNgrams.compute(s, n)
    override def produceResult(input: InternalRow): ArrayData =
      invoke(input.getUTF8String(0), input.getInt(1))
  }

  private object SimHashFn extends ScalarFunction[UTF8String] {
    override def name(): String = "simhash_fingerprint"
    override def inputTypes(): Array[DataType] =
      Array(StringType, IntegerType)
    override def resultType(): DataType = StringType
    override def isResultNullable: Boolean = true
    def invoke(s: UTF8String, bits: Int): UTF8String =
      if (s == null) null else SimHashFingerprint.compute(s, bits)
    override def produceResult(input: InternalRow): UTF8String =
      invoke(input.getUTF8String(0), input.getInt(1))
  }
}
