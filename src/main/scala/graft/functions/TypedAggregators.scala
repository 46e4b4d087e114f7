package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` surface — the Dataset-typed
  * counterpart to the engine's native `TypedImperativeAggregate`s
  * (KMV / TopKBy / Misra-Gries).
  *
  * Two registration paths, both demonstrated by the oracle queries:
  *   - typed: `ds.groupByKey(...).agg(agg.toColumn)` on a `Dataset[T]`
  *     — compile-time row types end to end;
  *   - untyped/SQL: `spark.udf.register(name, functions.udaf(agg, enc))`
  *     ([[TypedAggregators.registerAll]]) — the same aggregator callable
  *     from `spark.sql` text and `DataFrame.agg`.
  *
  * Determinism contract (same as [[Exact]]): buffers hold EXACT values
  * (`java.math.BigDecimal` / `Long`), every input double is snapped to
  * its declared decimal scale on entry (mirroring Spark's
  * double→decimal cast, HALF_UP on the shortest decimal
  * representation), and the single lossy double op happens once in
  * `finish` — so the result is independent of partitioning and merge
  * order, and bit-identical to a DuckDB decimal oracle.
  *
  * Scale shape: these compile to `ObjectHashAggregate` with partial
  * (map-side) aggregation — constant-size buffers per group, one
  * shuffle of partial buffers on the group key. No row set is ever
  * collected; 100 TB safe wherever a hash aggregate is.
  */
object TypedAggregators {

  /** Snap a double to `scale` decimal places, exactly as Spark's
    * `Cast(DoubleType → DecimalType)`: shortest decimal representation
    * (`BigDecimal.valueOf`) then HALF_UP. */
  private[graft] def snap(v: Double, scale: Int): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(scale, RoundingMode.HALF_UP)

  // ------------------------------------------------------------------
  // Weighted mean: sum(w*v) / sum(w), exact until one final division.
  // ------------------------------------------------------------------

  /** Exact-decimal buffer: scala.BigDecimal fields so the product
    * encoder serializes them as DecimalType (sums at scale <= 18 stay
    * exact under the encoder's (38,18) storage type). */
  final case class WeightedBuf(swv: BigDecimal, sw: BigDecimal)

  /** Revenue-weighted mean of a 2-decimal column over rows of type `T`.
    *
    * `value` and `weight` extract the measure and weight from the typed
    * row; both are snapped to `scale` decimals, so `swv` accumulates at
    * `2*scale` (exact, order-independent). `finish` = one double
    * division of two exactly-computed doubles — identical in any
    * engine. Empty/zero-weight groups yield NaN (a typed OUT of Double
    * cannot be null; callers with nullable semantics wrap in `when`).
    */
  final class WeightedMean[T](value: T => Double, weight: T => Double,
                              scale: Int = 2)
      extends Aggregator[T, WeightedBuf, Double] {
    override def zero: WeightedBuf =
      WeightedBuf(BigDecimal(JBigDecimal.ZERO), BigDecimal(JBigDecimal.ZERO))
    override def reduce(b: WeightedBuf, a: T): WeightedBuf = {
      val w = snap(weight(a), scale)
      val v = snap(value(a), scale)
      WeightedBuf(b.swv + BigDecimal(w.multiply(v)), b.sw + BigDecimal(w))
    }
    override def merge(x: WeightedBuf, y: WeightedBuf): WeightedBuf =
      WeightedBuf(x.swv + y.swv, x.sw + y.sw)
    override def finish(b: WeightedBuf): Double =
      if (b.sw.signum == 0) Double.NaN
      else b.swv.toDouble / b.sw.toDouble
    override def bufferEncoder: Encoder[WeightedBuf] = Encoders.product[WeightedBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ------------------------------------------------------------------
  // ASCII character-class profile over a text column.
  // ------------------------------------------------------------------

  /** Exact per-group counts: docs seen, ASCII letters, ASCII digits,
    * ASCII whitespace (space/tab/newline/CR). Counts are code-unit
    * counts restricted to ASCII classes, so they agree with any
    * code-point-counting engine. */
  final case class CharProfile(n_docs: Long, n_alpha: Long, n_digit: Long,
                               n_space: Long)

  /** Character-class census of a text column: one pass per string,
    * constant-size Long buffer. NULL inputs never reach `reduce` —
    * Spark's typed-aggregate bridge skips null rows before the
    * deserializer (both the `groupByKey` and the `udaf()` path), the
    * same convention as SQL aggregates. Callers that must account for
    * null-text docs coalesce first: `char_profile(coalesce(text, ''))`.
    * The null branch in `reduce` is defensive only. */
  final class CharClassProfile extends Aggregator[String, CharProfile, CharProfile] {
    override def zero: CharProfile = CharProfile(0L, 0L, 0L, 0L)
    override def reduce(b: CharProfile, text: String): CharProfile = {
      var alpha = 0L; var digit = 0L; var space = 0L
      if (text != null) {
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
          else if (c >= '0' && c <= '9') digit += 1
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') space += 1
          i += 1
        }
      }
      CharProfile(b.n_docs + 1, b.n_alpha + alpha, b.n_digit + digit,
        b.n_space + space)
    }
    override def merge(x: CharProfile, y: CharProfile): CharProfile =
      CharProfile(x.n_docs + y.n_docs, x.n_alpha + y.n_alpha,
        x.n_digit + y.n_digit, x.n_space + y.n_space)
    override def finish(b: CharProfile): CharProfile = b
    override def bufferEncoder: Encoder[CharProfile] = Encoders.product[CharProfile]
    override def outputEncoder: Encoder[CharProfile] = Encoders.product[CharProfile]
  }

  /** Register the SQL-callable forms on a session:
    * `weighted_mean(value, weight)` and `char_profile(text)`. Session-
    * scoped (UDAF registration is not an extensions injection point);
    * idempotent — re-registration replaces. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("weighted_mean",
      udaf(new WeightedMean[(Double, Double)](_._1, _._2),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)))
    spark.udf.register("char_profile",
      udaf(new CharClassProfile, Encoders.STRING))
  }
}
