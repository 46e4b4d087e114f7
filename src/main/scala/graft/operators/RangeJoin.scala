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

  /** Interval×interval OVERLAP join: `a.lo <= b.hi AND b.lo <= a.hi`
    * (inclusive bounds, numeric columns) as a bucketized equi join —
    * the grid-join answer to the second classic non-equi scale-killer
    * (the first, point-in-interval, is [[bucketed]]).
    *
    * Both sides explode into every bucket their interval covers and
    * candidates meet on bucket equality; the exact overlap predicate
    * trims same-bucket non-overlaps. An overlapping pair shares every
    * bucket in the intersection of its covers, so the join would emit
    * it multiple times — instead of a distinct pass (a second
    * corpus-scale shuffle), each pair is kept ONLY in its first shared
    * bucket, `max(floor(a.lo/w), floor(b.lo/w))`, which both sides
    * cover by construction. Output is exact with one shuffle.
    *
    * Cost: each side replicates by interval_width / bucketWidth —
    * pick the width near the typical interval length, same guidance
    * as [[bucketed]]. The two inputs' column names must not collide
    * (alias before calling). */
  def overlap(a: DataFrame, b: DataFrame, aLo: String, aHi: String,
              bLo: String, bHi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def bk(c: String) = floor(col(c) / bucketWidth)
    val ax = a.withColumn("__bk_a", explode(sequence(bk(aLo), bk(aHi))))
    val bx = b.withColumn("__bk_b", explode(sequence(bk(bLo), bk(bHi))))
    ax.join(bx, col("__bk_a") === col("__bk_b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__bk_a") === greatest(bk(aLo), bk(bLo)))
      .drop("__bk_a", "__bk_b")
  }
}
