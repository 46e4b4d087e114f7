package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.TestSpark
import graft.operators.BronzeNormalize.ColumnSpec
import graft.functions.LarkFunctions

class BronzeNormalizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val specs = Seq(
    ColumnSpec("User id", "user_id", StringType),
    ColumnSpec("Check in time", "check_in_datetime", TimestampType, epochMillis = true),
    ColumnSpec("Is offsite", "is_offsite", BooleanType),
    ColumnSpec("Tiền phạt", "penalty", LongType, junkNumeric = true),
    ColumnSpec("gender", "gender", StringType))

  test("missing source column materializes as null; extras dropped") {
    val raw = Seq(("U1", 1718600000123L, "junk")).toDF("User id", "Check in time", "extra")
    val out = BronzeNormalize(raw, specs)
    assert(out.columns.toSeq ===
      Seq("user_id", "check_in_datetime", "is_offsite", "penalty", "gender"))
    val row = out.collect()(0)
    assert(row.getAs[String]("gender") == null)
  }

  test("epoch millis floor to seconds (reference int(ms/1000))") {
    val raw = Seq(("U1", 1718600000999L)).toDF("User id", "Check in time")
    val ts = BronzeNormalize(raw, specs).select(unix_timestamp(col("check_in_datetime")))
      .as[Long].head()
    assert(ts === 1718600000L)
  }

  test("bool null-fills false, numeric null-fills 0") {
    val raw = Seq(("U1", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("User id", "Is offsite", "Tiền phạt")
    val row = BronzeNormalize(raw, specs).collect()(0)
    assert(row.getAs[Boolean]("is_offsite") === false)
    assert(row.getAs[Long]("penalty") === 0L)
  }

  test("junk numeric coercion: py-literal text payload") {
    val raw = Seq(("U1", "[{'text': 50000}]"), ("U2", "12345"),
                  ("U3", "garbage"), ("U4", "['77']"))
      .toDF("User id", "Tiền phạt")
    val got = BronzeNormalize(raw, specs)
      .select("user_id", "penalty").as[(String, Long)].collect().toMap
    assert(got === Map("U1" -> 50000L, "U2" -> 12345L, "U3" -> 0L, "U4" -> 77L))
  }

  test("lark struct extraction end-to-end") {
    val df = Seq("[{'id': 'ou_1', 'name': 'An'}]").toDF("user")
    val got = df.select(
      LarkFunctions.larkField(col("user"), "id").as("lark_id"),
      LarkFunctions.larkField(col("user"), "name").as("name"))
      .as[(String, String)].head()
    assert(got === ("ou_1", "An"))
  }

  test("applySchema projects and casts") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val out = BronzeNormalize.applySchema(Seq(("1", 2)).toDF("a", "b"), schema)
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      Seq(("a", LongType), ("b", StringType)))
  }
}
