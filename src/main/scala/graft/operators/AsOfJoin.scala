package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the most recent right row
  * (per key) whose timestamp is <= the left row's — the event-time
  * dimension lookup (e.g. "which SCD2 version was in effect when this
  * event happened").
  *
  * Spark has no as-of join operator; the naive encodings are a range
  * join (a per-key nested loop) or a subquery per left row. This uses
  * the union trick instead: tag both sides, union, ONE shuffle on the
  * key, then `last(value, ignoreNulls)` over (key, ts) carries the
  * latest right values forward — linear after one sort, the shape that
  * survives 100 TB. Ties (a right row at exactly the left ts) resolve
  * right-first: an event at a version's effective instant sees that
  * version.
  */
object AsOfJoin {

  /** `left` joined as-of: every column of `left`, plus `valueCols` of
    * `right` carried from the key's latest right row with
    * `rightTs <= leftTs` (null when no such row precedes).
    * `valueCols` must not collide with `left`'s column names; `right`
    * must be unique per (key, rightTs) — two versions at the same
    * instant have no defined winner. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(!left.columns.contains(_)),
      "valueCols must be disjoint from left's columns")
    val reserved = Seq("__ts", "__src", "__v", "__asof")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"columns named ${reserved.mkString("/")} are reserved by asOf")
    val leftCols = left.columns.toSeq

    // unified shape: leftCols ++ __v (struct of valueCols) ++ __ts ++
    // __src. The values travel as ONE struct: `last(ignoreNulls)` then
    // skips only left rows (whole struct null), never a right row that
    // legitimately carries a null FIELD — and all carried columns come
    // from the same right row.
    val vStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    val lSide = left
      .withColumn("__ts", col(leftTs)).withColumn("__src", lit(1))
      .withColumn("__v", lit(null).cast(vStructType))
    // join semantics: a null key matches nothing — drop null-key right
    // rows (null-key LEFT rows share a window partition with no right
    // rows in it and correctly carry null values)
    val rBase = right.filter(col(key).isNotNull).select(
      col(key) +: col(rightTs).as("__ts") +:
        struct(valueCols.map(col): _*).as("__v") +: Nil: _*)
      .withColumn("__src", lit(0))
    val rSide = leftCols.filterNot(_ == key).foldLeft(rBase) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // right rows sort before left rows at equal ts: __src 0 < 1
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
