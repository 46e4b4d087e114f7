package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String



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
    Seq("py_to_json", "coerce_numeric", "word_ngrams", "simhash_fingerprint",
      "kmv_sketch", "hdr_histogram")

  def load(name: String): UnboundFunction = name match {
    case "kmv_sketch" => unbound("kmv_sketch",
      "k minimum distinct hash values of a BIGINT column (KMV distinct " +
        "sketch; AGGREGATE — Spark plans it as a V2Aggregator with " +
        "map-side partials)",
      Array(LongType, IntegerType), KmvSketchAggFn)
    case "hdr_histogram" => unbound("hdr_histogram",
      "HDR-style log-bucketed histogram of a non-negative BIGINT column " +
        "(AGGREGATE; array<struct<bucket,hi,cnt>>)",
      Array(LongType), HdrHistogramAggFn)
    case "py_to_json" => unbound("py_to_json",
      "Python-literal text to canonical JSON (null on parse failure)",
      Array(StringType), PyToJsonJavaFn.INSTANCE)
    case "coerce_numeric" => unbound("coerce_numeric",
      "defensive numeric coercion: number text, or first numeric of a " +
        "Python-literal list/dict (null when nothing numeric)",
      Array(StringType), CoerceNumericJavaFn.INSTANCE)
    case "word_ngrams" => unbound("word_ngrams",
      "sliding word n-grams of a space-tokenized string",
      // Java impl: its STATIC magic method plans as a codegen'd
      // StaticInvoke; the Scala object's instance `invoke` made Janino
      // refuse the generated call and every MutableProjection holding
      // it fell back to interpreter mode (see WordNgramsJavaFn docs)
      Array(StringType, IntegerType), WordNgramsJavaFn.INSTANCE)
    case "simhash_fingerprint" => unbound("simhash_fingerprint",
      "per-word md5 sign-vote simhash as a hex string",
      Array(StringType, IntegerType), SimHashJavaFn.INSTANCE)
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

  // The scalar functions live in Java ([[WordNgramsJavaFn]],
  // [[PyToJsonJavaFn]], [[CoerceNumericJavaFn]], [[SimHashJavaFn]]):
  // their STATIC magic methods plan as codegen'd StaticInvoke calls,
  // where the former Scala objects' instance `invoke`s failed Janino
  // compilation ("no applicable method" for the exact declared
  // signature on the nested module class) and every MutableProjection
  // holding one fell back to interpreter mode per task — paying the
  // failed compile AND row-at-a-time interpretation on a corpus-scale
  // scan. Each delegates to the same kernel as the session-registered
  // Catalyst expression, so results are unchanged by construction.

  // ------------------------------------------------- aggregate functions
  //
  // The FunctionCatalog's AGGREGATE face ([[AggregateFunction]]): Spark
  // wraps a bound V2 aggregate in a V2Aggregator (a
  // TypedImperativeAggregate over the java-serialized state), so the
  // catalog path gets the same partial-aggregation shape — map-side
  // update, shuffle of serialized states, reduce-side merge — as the
  // session-registered TypedImperativeAggregate expressions. Results
  // are identical by construction: both paths share [[graft.functions
  // .KmvSketch]]'s offer discipline / [[graft.functions.HdrHistogram]]'s
  // bucket function, pinned by the parity spec.

  /** KMV state: the k smallest DISTINCT values seen. `k` rides in the
    * state (0 = not yet seen a row) because the function's second
    * argument — a literal — only reaches update() per-row. */
  final class KmvAggState(var k: Int) extends java.io.Serializable {
    val set = new java.util.TreeSet[java.lang.Long]()
  }

  private object KmvSketchAggFn
      extends org.apache.spark.sql.connector.catalog.functions.AggregateFunction[
        KmvAggState, ArrayData] {
    override def name(): String = "kmv_sketch"
    override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
    override def resultType(): DataType = ArrayType(LongType, containsNull = false)
    override def isResultNullable: Boolean = false
    override def newAggregationState(): KmvAggState = new KmvAggState(0)

    private def offer(s: KmvAggState, v: Long): Unit =
      if (s.set.size < s.k) { s.set.add(v); () }
      else if (v < s.set.last) { if (s.set.add(v)) { s.set.remove(s.set.last); () } }

    override def update(s: KmvAggState, input: InternalRow): KmvAggState = {
      if (s.k == 0) {
        val k = input.getInt(1)
        require(k >= 2, s"kmv_sketch k ($k) must be >= 2")
        s.k = k
      }
      if (!input.isNullAt(0)) offer(s, input.getLong(0))
      s
    }

    override def merge(a: KmvAggState, b: KmvAggState): KmvAggState = {
      if (a.k == 0) a.k = b.k
      val it = b.set.iterator()
      while (it.hasNext) offer(a, it.next())
      a
    }

    override def produceResult(s: KmvAggState): ArrayData = {
      val out = new Array[Long](s.set.size)
      val it = s.set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  private object HdrHistogramAggFn
      extends org.apache.spark.sql.connector.catalog.functions.AggregateFunction[
        java.util.HashMap[Integer, java.lang.Long], ArrayData] {
    override def name(): String = "hdr_histogram"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = ArrayType(StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("hi", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
    override def isResultNullable: Boolean = false
    override def newAggregationState(): java.util.HashMap[Integer, java.lang.Long] =
      new java.util.HashMap[Integer, java.lang.Long]()

    override def update(buf: java.util.HashMap[Integer, java.lang.Long],
                        input: InternalRow): java.util.HashMap[Integer, java.lang.Long] = {
      if (!input.isNullAt(0)) {
        val x = input.getLong(0)
        require(x >= 0L, s"hdr_histogram input must be non-negative, got $x")
        val b = graft.functions.HdrHistogram.bucketOf(x)
        val cur = buf.get(b)
        buf.put(b, if (cur == null) 1L else cur + 1L)
      }
      buf
    }

    override def merge(a: java.util.HashMap[Integer, java.lang.Long],
                       b: java.util.HashMap[Integer, java.lang.Long])
        : java.util.HashMap[Integer, java.lang.Long] = {
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = a.get(e.getKey)
        a.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
      }
      a
    }

    override def produceResult(buf: java.util.HashMap[Integer, java.lang.Long])
        : ArrayData = {
      val buckets = new Array[Integer](buf.size)
      buf.keySet().toArray(buckets)
      java.util.Arrays.sort(buckets, java.util.Comparator.naturalOrder[Integer]())
      val out = new Array[Any](buckets.length)
      var i = 0
      while (i < buckets.length) {
        val b = buckets(i).intValue
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](b.toLong, graft.functions.HdrHistogram.upperEdge(b),
            buf.get(b).longValue))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

}
