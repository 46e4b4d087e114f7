package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DoubleType

/** Physical broadcast range join — the small-interval-side companion
  * to [[RangeJoinRule]]'s shuffle-side bucketization.
  *
  * When the interval side of a non-equi range join fits on the driver
  * (dimension-scale: rate cards, validity windows, banding tables),
  * the right plan is not a shuffle at all: broadcast the intervals
  * SORTED by their lower bound with a running prefix-max of upper
  * bounds, and probe each point row by binary search —
  * O(log n + matches) per row against BroadcastNestedLoopJoin's
  * O(n) full sweep of every interval for every row. The point side
  * streams: no shuffle, no replication, pipelined through
  * `mapPartitions`.
  *
  * Probe correctness: candidates are found on DOUBLE-cast copies of
  * (v, lo, hi). The long→double cast is monotonic, so the candidate
  * set is a superset of the true matches (a boundary that rounds
  * together can only ADD candidates), and the ORIGINAL join condition
  * is re-evaluated exactly on every candidate pair — results are
  * bit-identical to the nested-loop plan. The prefix-max walk stops
  * at the first position whose running max upper bound falls below
  * the probe value: intervals are scanned only while one could still
  * match. Null bounds are dropped at build (they satisfy no inner
  * join); null probe values emit nothing.
  */
case class BroadcastRangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    v: Expression, lo: Expression, hi: Expression,
    pointIsLeft: Boolean, condition: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  /** Driver-side build, computed ONCE per plan node no matter how many
    * times the frame executes (count then collect, AQE stage retries):
    * intervals sorted by lo with a prefix-max of hi, broadcast. */
  private lazy val builtBroadcast = {
    val intervalPlan = if (pointIsLeft) right else left
    val loEval = BindReferences.bindReference(
      Cast(lo, DoubleType), intervalPlan.output)
    val hiEval = BindReferences.bindReference(
      Cast(hi, DoubleType), intervalPlan.output)
    val collected = intervalPlan.executeCollect()
    val built = collected.flatMap { r =>
      val l = loEval.eval(r)
      val h = hiEval.eval(r)
      if (l == null || h == null) None
      else {
        val ld = l.asInstanceOf[Double]
        val hd = h.asInstanceOf[Double]
        // a NaN bound satisfies no comparison (can never match an
        // inner join) and would poison the prefix-max walk
        if (ld.isNaN || hd.isNaN) None else Some((ld, hd, r.copy()))
      }
    }.sortBy(_._1)
    val lows = built.map(_._1)
    val his = built.map(_._2)
    val prefixMaxHi = new Array[Double](built.length)
    var i = 0
    var runMax = Double.NegativeInfinity
    while (i < built.length) {
      runMax = math.max(runMax, his(i)); prefixMaxHi(i) = runMax; i += 1
    }
    sparkContext.broadcast((lows, his, prefixMaxHi, built.map(_._3)))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val pointPlan = if (pointIsLeft) left else right
    val bc = builtBroadcast
    val vExpr = Cast(v, DoubleType)
    val pointOutput = pointPlan.output
    val out = output
    val isLeft = pointIsLeft
    val cond = condition
    pointPlan.execute().mapPartitions { iter =>
      val (blows, bhis, bmax, brows) = bc.value
      val vEval = BindReferences.bindReference(vExpr, pointOutput)
      val pred = Predicate.create(cond, out)
      pred.initialize(0)
      val joined = new JoinedRow
      // downstream exchanges/aggregates expect UnsafeRow — project the
      // JoinedRow out, as the built-in join execs do
      val resultProj = UnsafeProjection.create(out, out)
      iter.flatMap { prow =>
        val pv = vEval.eval(prow)
        if (pv == null || blows.isEmpty) Iterator.empty
        else {
          val x = pv.asInstanceOf[Double]
          // last index with lo <= x
          var a = 0; var b = blows.length - 1; var idx = -1
          while (a <= b) {
            val m = (a + b) >>> 1
            if (blows(m) <= x) { idx = m; a = m + 1 } else b = m - 1
          }
          // `joined` is mutated per candidate and `resultProj` reuses
          // its buffer, so: find the candidate in advance(), but run
          // the projection only at emission — the returned UnsafeRow
          // stays valid until the NEXT next() call (the same reuse
          // contract the built-in join execs follow)
          new Iterator[InternalRow] {
            private var i = idx
            private var pending = false
            private def advance(): Unit = {
              pending = false
              while (!pending && i >= 0 && bmax(i) >= x) {
                if (bhis(i) >= x) {
                  val j = if (isLeft) joined(prow, brows(i))
                          else joined(brows(i), prow)
                  if (pred.eval(j)) pending = true
                }
                i -= 1
              }
            }
            advance()
            override def hasNext: Boolean = pending
            override def next(): InternalRow = {
              val r = resultProj(joined)
              advance()
              r
            }
          }
        }
      }
    }
  }
}

/** Planner strategy: claim [[RangeJoinPattern]] joins whose interval
  * side is statistics-small (under the autoBroadcastJoinThreshold)
  * for [[BroadcastRangeJoinExec]]. Opt-in via
  * `spark.graft.rangeJoin.broadcast=true`. If [[RangeJoinRule]] is
  * also enabled it rewrites the join upstream (adding an equality
  * conjunct), so the pattern no longer matches here — the two
  * optimizations never double-claim. */
class BroadcastRangeJoinStrategy(spark: SparkSession) extends SparkStrategy {

  private val EnabledConf = "spark.graft.rangeJoin.broadcast"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(l, r, _, _, _)
        // case-insensitive like every built-in Spark boolean conf
        if spark.conf.getOption(EnabledConf).exists(_.equalsIgnoreCase("true")) =>
      RangeJoinPattern.unapply(j) match {
        case Some((v, lo, hi, pointIsLeft)) =>
          val interval = if (pointIsLeft) r else l
          val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
          if (threshold > 0 && interval.stats.sizeInBytes <= threshold)
            BroadcastRangeJoinExec(planLater(l), planLater(r),
              v, lo, hi, pointIsLeft, j.condition.get) :: Nil
          else Nil
        case None => Nil
      }
    case _ => Nil
  }
}
