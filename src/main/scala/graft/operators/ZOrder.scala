package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering for multi-column data skipping.
  *
  * A sort on one column gives parquet row-group min/max pruning on that
  * column only; interleaving the bits of several rank-normalized
  * columns and range-partitioning + sorting on the interleaved value
  * clusters the data so EVERY participating column's min/max stays
  * narrow per file — predicates on any of them skip most row groups.
  * This is the standard lakehouse `OPTIMIZE ZORDER BY` layout, built
  * from plain Spark ops: one scalar min/max aggregate per column (a
  * driver-side pair of numbers, not data), a codegen'd bit-interleave
  * expression, `repartitionByRange` + `sortWithinPartitions` on the
  * z-value, then a normal parquet write. At 100 TB the cost is one
  * extra range shuffle on write, repaid on every multi-predicate scan.
  */
object ZOrder {

  /** Bit-interleaved z-value over `cols`, each min/max-normalized to
    * `bitsPerCol` bits (caller supplies the (min, max) per column —
    * scalars from a prior aggregate; constant columns and nulls map to
    * 0). Pure column expression: codegen-friendly, no UDF. */
  def zValue(cols: Seq[(Column, (Double, Double))], bitsPerCol: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bitsPerCol <= 63,
      s"${cols.size} cols x $bitsPerCol bits must fit a signed long")
    val maxQ = (1L << bitsPerCol) - 1
    val quantized = cols.map { case (c, (lo, hi)) =>
      if (hi <= lo) lit(0L)
      else least(lit(maxQ), greatest(lit(0L),
        floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) /
          lit(hi - lo) * lit(maxQ.toDouble)).cast("long")))
    }
    (0 until bitsPerCol).flatMap { bit =>
      quantized.zipWithIndex.map { case (q, idx) =>
        shiftleft(shiftright(q, bit).bitwiseAND(lit(1L)),
          bit * cols.size + idx)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered by `cols` into `nFiles` files. The min/max
    * per column comes from one scalar aggregate (2 numbers per column
    * on the driver — metadata-scale, not a data collect). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    nFiles: Int, bitsPerCol: Int = 16): Unit = {
    val bounds = df.select(cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double")))): _*).head()
    val ranges = cols.indices.map { i =>
      (Option(bounds.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]),
        Option(bounds.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double]))
    }
    val z = zValue(cols.zip(ranges).map { case (c, r) => (col(c), r) }, bitsPerCol)
    // a temp name no input column can collide with — withColumn on an
    // existing name would silently REPLACE (then drop) the user's data
    val zCol = Iterator.from(0).map(i => s"__z$i")
      .find(!df.columns.contains(_)).get
    df.withColumn(zCol, z)
      .repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
      .write.mode("overwrite").parquet(path)
  }
}
