package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Native sorted_intersect_size: exact agreement with
  * `size(array_intersect(...))` on sorted distinct inputs (the verify
  * tier's contract), null semantics, codegen/interpreted agreement. */
class SortedIntersectSizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      def arr() = (0 until rnd.nextInt(40))
        .map(_ => s"tok${rnd.nextInt(60)}").distinct.sorted.toArray
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      Native.sortedIntersectSize(col("a"), col("b")).as("nat"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("nat") =!= col("ref"))
    assert(cmp.count() === 0L)
  }

  test("unicode ordering agrees with sort_array's") {
    // mixed-script tokens: the merge scan's UTF8String.compareTo must
    // be the same binary order sort_array produced
    val toks = Seq("z", "éclair", "中文", "a", "Å", "10", "_x")
    val df = Seq((toks.toArray, toks.reverse.toArray)).toDF("a", "b")
      .select(sort_array(array_distinct(col("a"))).as("a"),
        sort_array(array_distinct(col("b"))).as("b"))
    val r = df.select(
      Native.sortedIntersectSize(col("a"), col("b")).as("nat"),
      size(array_intersect(col("a"), col("b"))).as("ref")).head()
    assert(r.getInt(0) === toks.length && r.getInt(0) === r.getInt(1))
  }

  test("null array -> null; empty/disjoint -> 0; interpreted == codegen") {
    val df = Seq(
      (Some(Array("a", "b")), Some(Array("b", "c"))),
      (None, Some(Array("x"))),
      (Some(Array.empty[String]), Some(Array("x"))),
      (Some(Array("p")), Some(Array("q")))
    ).toDF("a", "b")
    val got = df.select(Native.sortedIntersectSize(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq === Seq(1, null, 0, 0))
    // interpreted path (eval) agrees with the codegen'd column above
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def ad(xs: String*) = new GenericArrayData(
      xs.map(UTF8String.fromString).toArray[Any])
    assert(SortedIntersectSize.compute(ad("a", "b"), ad("b", "c")) === 1)
    assert(SortedIntersectSize.compute(ad(), ad("x")) === 0)
  }
}
