package graft.warehouse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.LarkFunctions.coerceTimestamp

/** F5 coerce-parse semantics (reference: etl.py:637-639,
  * `pd.to_datetime(x, format='%d/%m/%Y %H:%M', errors='coerce')`) and
  * its wiring into the gold cube for string-typed datetime columns.
  */
class GoldSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coerceTimestamp parses dd/MM/yyyy HH:mm, nulls everything else") {
    val in = Seq(
      "01/06/2024 08:00",   // valid
      "2/6/2024 8:00",      // non-padded: Spark's strict pattern rejects
      "31/02/2024 10:00",   // impossible date
      "2024-06-01 08:00",   // wrong layout
      "garbage",
      null
    ).toDF("s")
    val out = in.select(date_format(coerceTimestamp(col("s")),
      "yyyy-MM-dd HH:mm:ss").as("t")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == "2024-06-01 08:00:00")
    assert(out.drop(1).forall(_ == null))
  }

  test("gold cube accepts string-typed datetimes and coerces, invalid -> fillna(0)") {
    val dim = Seq(("E001", "A", "Eng")).toDF("user_id", "name", "job_title")
      .withColumn("is_current", lit(true))
    def fact(ci: String, cis: String, co: String, cos: String) =
      Seq(("A1", "E001", ci, cis, co, cos, 500L))
        .toDF("attendance_id", "user_id", "check_in_datetime",
          "check_in_shift_time", "check_out_datetime", "check_out_shift_time",
          "penalty")
        .withColumn("attendance_date", to_timestamp(lit("2024-06-01 00:00:00")))

    // 00:50 UTC in, 08:00 shift -> +7h makes 07:50 vs 08:00 -> 10 late
    val good = Gold.cubeAttendanceReport(
      fact("01/06/2024 00:50", "01/06/2024 08:00",
           "01/06/2024 10:20", "01/06/2024 17:30"), dim).head()
    assert(good.getAs[Long]("late_time_minute") == 10L)
    assert(good.getAs[Long]("early_time_minute") == 10L)
    assert(good.getAs[Long]("working_duration_hours") == 9L)
    assert(good.getAs[Long]("working_duration_benchmark") == 9L)

    // unparseable check-out -> coerced null -> early/working fillna 0
    val bad = Gold.cubeAttendanceReport(
      fact("01/06/2024 00:50", "01/06/2024 08:00",
           "not-a-datetime", "01/06/2024 17:30"), dim).head()
    assert(bad.getAs[Long]("late_time_minute") == 10L)
    assert(bad.getAs[Long]("early_time_minute") == 0L)
    assert(bad.getAs[Long]("working_duration_hours") == 0L)
    assert(bad.getAs[Long]("working_duration_benchmark") == 9L)
  }
}
