package graft.warehouse

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.LarkSource

/** Edge paths of the medallion run: facts landing before any dim
  * exists, and free-text fields with embedded newlines surviving the
  * CSV round-trip.
  */
class PipelineEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("facts landing before any dim run with null enrichment, not a crash") {
    val root = java.nio.file.Files.createTempDirectory("edge1").toString
    // land ONLY an attendance_record CSV (no employee/vendor at all)
    val rec = Seq(
      ("E001", "R1", "1717200000000", "A", "1717203000000", "HQ", "False"))
      .toDF("User id", "Record id", "Date", "Employee", "Check time",
        "Check location name", "Is offsite")
    LarkSource.writeLandingCsv(rec, root,
      BronzeSchemas.tableIds("attendance_record"), "2024-06-01")

    val pipe = new Pipeline(spark, root, s"$root/lake")
    pipe.run("2024-06-01") // no dim_employee anywhere
    val fact = pipe.table("silver", "fact_attendance_record")
    assert(fact.count() == 1)
    assert(fact.select("user_id").head().getString(0) == "E001")
  }

  test("free-text field with embedded newline survives the landing round-trip") {
    val root = java.nio.file.Files.createTempDirectory("edge2").toString
    val note = "line one\nhe said \"hi, there\"\nline three"
    val rec = Seq(("E001", "R9", "1717200000000", "A", "1717203000000", note, "True"))
      .toDF("User id", "Record id", "Date", "Employee", "Check time",
        "Check location name", "Is offsite")
    LarkSource.writeLandingCsv(rec, root,
      BronzeSchemas.tableIds("attendance_record"), "2024-06-02")

    val pipe = new Pipeline(spark, root, s"$root/lake")
    val back = pipe.readLanding("attendance_record", "2024-06-02").get
    assert(back.count() == 1) // NOT split into fragment rows
    assert(back.select("Check location name").head().getString(0) == note)
    // and bronze still types the row correctly after the round-trip
    pipe.runBronze("2024-06-02")
    val bronze = pipe.table("bronze", "lark_attendance_record")
    assert(bronze.select("check_location_name").head().getString(0) == note)
    assert(bronze.select("is_offsite").head().getBoolean(0))
  }
}
