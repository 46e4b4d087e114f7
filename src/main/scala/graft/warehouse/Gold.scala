package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.functions.LarkFunctions.{clipAbs, coerceTimestamp, durationMinutes, plus7h}

/** Gold layer: cube_attendance_report (reference: dags/utils/etl.py:
  * 616-677; DDL: dwh/gold/cube_attendance_report.py).
  *
  * Reproduces the reference's metric semantics exactly, quirks and all:
  *   - the +7h VN display shift applies to attendance_date and to the
  *     check-in/out side of the lateness deltas but NOT to the shift
  *     boundaries (etl.py:631,640-647);
  *   - "late"/"early" minutes are clip(upper=0).abs() of the delta —
  *     positive only when the delta is negative — with null -> 0;
  *   - durations are fractional hours null-filled to 0 then truncated
  *     to int64 by the schema cast (apply_schema_to_df).
  */
object Gold {

  /** The reference re-parses the four check/shift datetime columns from
    * '%d/%m/%Y %H:%M' strings with errors='coerce' before the metric
    * math (etl.py:637-639); on already-datetime input pandas ignores the
    * format and passes through. Mirrored here per column type (F5). */
  private val coercedCols = Seq("check_in_datetime", "check_out_datetime",
    "check_out_shift_time", "check_in_shift_time")

  private def coerceDatetimes(fact: DataFrame): DataFrame =
    coercedCols.foldLeft(fact) { (df, c) =>
      if (df.schema(c).dataType == StringType)
        df.withColumn(c, coerceTimestamp(col(c)))
      else df
    }

  def cubeAttendanceReport(factAttendance: DataFrame,
                           dimEmployeeCurrent: DataFrame): DataFrame = {
    val dim = dimEmployeeCurrent.select(col("user_id"), col("name"), col("job_title"))
    val m = coerceDatetimes(factAttendance).join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("attendance_date_local", plus7h(col("attendance_date")))
    val cube = m.select(
      date_format(col("attendance_date_local"), "yyyy-MM").as("attendance_month"),
      to_date(col("attendance_date_local")).as("attendance_date"),
      col("user_id").as("lark_hrm_code"),
      col("name").as("hrm_name"),
      col("job_title"),
      clipAbs(durationMinutes(plus7h(col("check_in_datetime")),
        col("check_in_shift_time"))).cast("long").as("late_time_minute"),
      clipAbs(durationMinutes(plus7h(col("check_out_datetime")),
        col("check_out_shift_time"))).cast("long").as("early_time_minute"),
      coalesce((col("check_out_datetime").cast("double") -
        col("check_in_datetime").cast("double")) / 3600.0, lit(0.0))
        .cast("long").as("working_duration_hours"),
      coalesce((col("check_out_shift_time").cast("double") -
        col("check_in_shift_time").cast("double")) / 3600.0, lit(0.0))
        .cast("long").as("working_duration_benchmark"),
      col("penalty").as("penalty_amount"))
    // P5 (etl.py:655, dropna(how='all')) is a REFERENCE NO-OP: the
    // metric fillna(0) runs before it, so no cube row is ever all-null
    // — an all-null source row survives with zeroed metrics (asserted
    // by GoldenPipelineSpec). Reproduced faithfully by not filtering.
    cube
  }
}
