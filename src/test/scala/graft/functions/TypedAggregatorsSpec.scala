package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TypedAggregators.{CharClassProfile, CharProfile, WeightedMean}

/** The typed Aggregator surface: exactness and merge-order independence
  * of the decimal-buffer weighted mean, character-class counting
  * semantics (incl. nulls and non-ASCII), and both registration paths
  * (typed groupByKey column and udaf-registered SQL function).
  */
class TypedAggregatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wm = new WeightedMean[(String, Double, Double)](_._3, _._2)

  private def wmRun(rows: Seq[(String, Double, Double)], parts: Int): Map[String, Double] =
    rows.toDS().repartition(parts)
      .groupByKey(_._1).agg(wm.toColumn.name("w"))
      .collect().toMap

  test("weighted mean is exact and independent of partitioning") {
    // adversarial float ordering: values whose double-sum depends on order
    val rows = (1 to 4000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, 0.01 * (i % 7 + 1), if (i % 3 == 0) 1e8 + 0.01 else 0.01)
    }
    val r1 = wmRun(rows, 1)
    val r17 = wmRun(rows, 17)
    assert(r1 == r17) // bit-identical, not approx
    // reference: exact BigDecimal fold in one order
    val ref = rows.groupBy(_._1).map { case (g, rs) =>
      val swv = rs.map(r => BigDecimal(TypedAggregators.snap(r._2, 2))
        * BigDecimal(TypedAggregators.snap(r._3, 2))).sum
      val sw = rs.map(r => BigDecimal(TypedAggregators.snap(r._2, 2))).sum
      g -> swv.toDouble / sw.toDouble
    }
    assert(r1 == ref)
  }

  test("weighted mean of a zero-weight group is NaN") {
    val r = wmRun(Seq(("z", 0.0, 5.0), ("z", 0.0, 7.0)), 2)
    assert(r("z").isNaN)
  }

  test("char profile counts ASCII classes; null rows are skipped by Spark") {
    val rows = Seq(("en", "Ab1 \t\nx"), ("en", null), ("fr", "héllo!"))
    val prof = rows.toDF("lang", "text").repartition(3)
      .as[(String, String)].groupByKey(_._1).mapValues(_._2)
      .agg(new CharClassProfile().toColumn.name("p"))
      .collect().toMap
    // "Ab1 \t\nx": alpha=3 (A,b,x), digit=1, space=3; the null-text row
    // never reaches reduce (typed-agg null skip) -> n_docs = 1, which is
    // why callers needing null accountability coalesce first (q103).
    assert(prof("en") == CharProfile(1, 3, 1, 3))
    // "héllo!": é is non-ASCII -> not counted; h,l,l,o = 4 alphas
    assert(prof("fr") == CharProfile(1, 4, 0, 0))
    // coalesce restores the count-all-docs convention
    val coalesced = rows.toDF("lang", "text")
      .select(col("lang"), coalesce(col("text"), lit("")).as("text"))
      .as[(String, String)].groupByKey(_._1).mapValues(_._2)
      .agg(new CharClassProfile().toColumn.name("p"))
      .collect().toMap
    assert(coalesced("en") == CharProfile(2, 3, 1, 3))
  }

  test("udaf-registered SQL path matches the typed path") {
    TypedAggregators.registerAll(spark)
    val df = Seq(("a", 2.0, 10.0), ("a", 6.0, 20.0), ("b", 1.0, 5.0))
      .toDF("g", "w", "v")
    df.createOrReplaceTempView("wm_in")
    val sql = spark.sql(
      "SELECT g, weighted_mean(v, w) AS w FROM wm_in GROUP BY g")
      .as[(String, Double)].collect().toMap
    assert(sql("a") == (2.0 * 10.0 + 6.0 * 20.0) / 8.0)
    assert(sql("b") == 5.0)

    Seq(("en", "abc 12")).toDF("lang", "text").createOrReplaceTempView("cp_in")
    val p = spark.sql("SELECT char_profile(text) AS p FROM cp_in")
      .select("p.*").as[CharProfile].head()
    assert(p == CharProfile(1, 3, 2, 1))
  }

  test("snap mirrors Spark's double->decimal cast") {
    val d = Seq(0.05, 1e8 + 0.005, 123.456, -0.005)
    val viaSpark = d.toDF("x")
      .select(col("x").cast("decimal(28,2)").cast("string"))
      .as[String].collect().toSeq
    val viaSnap = d.map(v => TypedAggregators.snap(v, 2).toPlainString)
    assert(viaSpark == viaSnap)
  }
}
