package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Direct `Column` constructors for the native graft expressions.
  *
  * The `graft.llm` / `graft.functions` operators build their columns
  * HERE — a plain expression wrap that works on any SparkSession —
  * rather than through `call_function("...")`, which resolves by name
  * and therefore requires [[graft.sql.GraftExtensions]] to be
  * installed (a vanilla session would throw UNRESOLVED_ROUTINE).
  * [[graft.sql.GraftExtensions]] still registers the same expressions
  * by name for the `spark.sql(...)` text surface.
  */
object Native {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(col)

  def minhashSignatures(text: Column, shingle: Int, k: Int): Column =
    c(MinHashSignatures(e(text), Literal(shingle), Literal(k)))

  def simhashFingerprint(text: Column, bits: Int): Column =
    c(SimHashFingerprint(e(text), Literal(bits)))

  def wordNgrams(text: Column, n: Int): Column =
    c(WordNgrams(e(text), Literal(n)))

  def winnowFingerprints(text: Column): Column =
    c(WinnowFingerprints(e(text)))

  /** KMV distinct sketch as an aggregate column (see [[KmvSketch]]). */
  def kmvSketch(hash: Column, k: Int): Column =
    c(KmvSketch(e(hash), k).toAggregateExpression())

  /** Codegen'd float/double-array dot product (see [[DotProduct]]). */
  def dotProduct(x: Column, y: Column): Column =
    c(DotProduct(e(x), e(y)))

  /** Codegen'd squared-L2 distance (see [[SquaredL2]]). */
  def squaredL2(x: Column, y: Column): Column =
    c(SquaredL2(e(x), e(y)))

  /** Allocation-free |A ∩ B| over SORTED string arrays (see
    * [[SortedIntersectSize]]; produce inputs with
    * `sort_array(array_distinct(...))`). */
  def sortedIntersectSize(x: Column, y: Column): Column =
    c(SortedIntersectSize(e(x), e(y)))

  /** Bounded top-k-per-group aggregate (see [[TopKBy]]). */
  def topKBy(ord: Column, payload: Column, k: Int): Column =
    c(TopKBy(e(ord), e(payload), k).toAggregateExpression())

  /** Spark's own runtime-filter bloom sketch as an explicit aggregate
    * (`BloomFilterAggregate` over `xxhash64(v)` — the exact pair the
    * engine builds for its bloom join reductions, reused here for the
    * file-level skipping index). Output: the serialized filter as
    * BINARY; probe with [[graft.operators.DataSkipping]]'s
    * `mightContainLong(xxhash64(key))` on the deserialized sketch. */
  def bloomAgg(v: Column, expectedItems: Long, numBits: Long): Column =
    c(new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(e(v))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** `xxhash64(value)` evaluated on the driver with the value cast to
    * `dt` first — the probe-side twin of [[bloomAgg]]'s insert hash
    * (an uncast literal of a narrower type would hash differently
    * than the stored column). */
  def xxhash64Of(value: Any, dt: org.apache.spark.sql.types.DataType): Long =
    new org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(Literal.create(value, dt))).eval(null).asInstanceOf[Long]

  /** Misra–Gries frequent-items sketch aggregate (see [[MisraGries]]). */
  def misraGries(item: Column, k: Int): Column =
    c(MisraGries(e(item), k).toAggregateExpression())

  /** Mergeable log₂/4-bit histogram aggregate (see [[HdrHistogram]]). */
  def hdrHistogram(value: Column): Column =
    c(HdrHistogram(e(value)).toAggregateExpression())

  /** Upper-edge estimate of the p-th percentile (integer p, 1..100)
    * from a [[hdrHistogram]] column: rank `⌈p·n/100⌉` walked over the
    * sorted bucket array — the same all-integer walk as q138, as a
    * scalar fold over the ≤ ~1k-entry histogram. The `/100` rides a
    * double division then truncates — exact here because the numerator
    * is exact below 2⁵³ and a non-integer quotient sits ≥ 0.01 from
    * any integer, far beyond one ulp. */
  def histogramQuantile(hist: Column, p: Int): Column = {
    require(p >= 1 && p <= 100, s"percentile $p out of range")
    import org.apache.spark.sql.functions.{aggregate => fold, lit, struct, when}
    val n = fold(hist, lit(0L), (a, x) => a + x.getField("cnt"))
    val rank = ((lit(p.toLong) * n + lit(99L)) / lit(100L)).cast("long")
    val init = struct(lit(0L).as("cum"), lit(null).cast("long").as("res"),
      rank.as("rank"))
    fold(hist, init,
      (acc, x) => when(acc.getField("res").isNotNull, acc).otherwise(
        when(acc.getField("cum") + x.getField("cnt") >= acc.getField("rank"),
          struct(acc.getField("cum").as("cum"), x.getField("hi").as("res"),
            acc.getField("rank").as("rank")))
          .otherwise(struct((acc.getField("cum") + x.getField("cnt")).as("cum"),
            lit(null).cast("long").as("res"), acc.getField("rank").as("rank")))),
      acc => acc.getField("res"))
  }

  def pyToJson(col: Column): Column = c(PyToJson(e(col)))

  def coerceNumeric(col: Column): Column = c(CoerceNumeric(e(col)))
}
