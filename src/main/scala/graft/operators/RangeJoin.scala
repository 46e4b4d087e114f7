package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (band) join: match each left row's point value to every
  * right row's [lo, hi] interval.
  *
  * Spark compiles `l.v BETWEEN r.lo AND r.hi` to a broadcast
  * nested-loop (or cartesian) join — O(|L|·|R|), the classic non-equi
  * scale-killer. This encodes it as a bucketized equi-join instead:
  * pick a bucket width, the point side emits its single bucket, the
  * interval side explodes into every bucket its interval overlaps, the
  * join runs on the bucket key and the exact BETWEEN predicate trims
  * bucket-edge false candidates. Each (point, interval) pair meets in
  * exactly one bucket (the point's), so no distinct pass is needed.
  *
  * Cost: the interval side replicates by interval_width/bucketWidth —
  * pick bucketWidth near the TYPICAL interval width so replication
  * stays small while bucket populations stay selective.
  */
object RangeJoin {

  /** Inner join of `points` (with numeric `valueCol`) against
    * `intervals` (with numeric `loCol`/`hiCol`, inclusive bounds). */
  def bucketed(points: DataFrame, intervals: DataFrame, valueCol: String,
               loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bk", floor(col(valueCol) / bucketWidth))
    val i = intervals.withColumn("__bk", explode(sequence(
      floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    p.join(i, Seq("__bk"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bk")
  }
}
