package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.LarkFunctions._
import graft.operators.Scd2

/** Silver-layer builders: the two SCD2 dimensions and three facts
  * (reference: dags/utils/etl.py:274-523). Preprocessing extracts the
  * Lark semi-structured fields; the SCD2 mechanics are the generic
  * [[graft.operators.Scd2]].
  */
object Silver {

  /** dim_employee attribute columns (DDL order minus SCD bookkeeping;
    * reference: dwh/silver/dim_employee.py:1-23). */
  val dimEmployeeCols: Seq[String] = Seq(
    "user_id", "lark_id", "employee_sur_id", "employee_no", "name",
    "employee_type", "email", "mobile", "department_ids", "leader_sur_id",
    "join_time", "job_title", "city", "gender", "datetime_created",
    "datetime_updated")

  val dimVendorCols: Seq[String] = Seq(
    "vendor_id", "vendor_sur_id", "bank_holder_name", "bank_acc_number",
    "bank_holder", "qr_code", "note", "datetime_created", "datetime_updated")

  /** Employee batch preprocessing (reference: etl.py:282-307): surrogate
    * key, Lark struct extraction (lark_id / display name / leader),
    * department array parse, and leader surrogate resolution preferring
    * the new batch over the current dim — two broadcast left joins +
    * coalesce instead of the reference's driver-side dicts (the dicts
    * would be a collect() at scale; the joins broadcast the same data). */
  def prepareEmployeeBatch(bronze: DataFrame, dimCurrent: DataFrame): DataFrame = {
    val e = bronze
      .withColumn("employee_sur_id",
        surrogateKey(col("user_id"), col("datetime_updated")))
      .withColumn("lark_id", larkField(col("user"), "id"))
      .withColumn("name", larkField(col("user"), "name"))
      .withColumn("leader_lark_id", larkField(col("leader"), "id"))
      .withColumn("department_ids", parseStringList(col("department_ids")))
    val fromBatch = e.select(col("lark_id").as("leader_lark_id"),
                             col("employee_sur_id").as("sur_from_batch"))
      .filter(col("leader_lark_id").isNotNull)
    val fromDim = dimCurrent.select(col("lark_id").as("leader_lark_id"),
                                    col("employee_sur_id").as("sur_from_dim"))
      .filter(col("leader_lark_id").isNotNull)
    e.join(broadcast(fromBatch), Seq("leader_lark_id"), "left")
      .join(broadcast(fromDim), Seq("leader_lark_id"), "left")
      .withColumn("leader_sur_id", coalesce(col("sur_from_batch"), col("sur_from_dim")))
      .select(dimEmployeeCols.map(col): _*)
  }

  /** Vendor batch preprocessing (reference: etl.py:364-371): vendor_id
    * from the Lark text payload + surrogate key. */
  def prepareVendorBatch(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("vendor_id", larkField(col("vendor_id"), "text"))
      .withColumn("vendor_sur_id",
        surrogateKey(col("vendor_id"), col("datetime_updated")))
      .select(dimVendorCols.map(col): _*)

  /** An empty current-dim slice with the batch's attr schema + SCD meta
    * (first run, before the dim table exists). */
  def emptyDim(batch: DataFrame): DataFrame =
    batch.limit(0)
      .withColumn("valid_from", lit(null).cast(TimestampType))
      .withColumn("valid_to", lit(null).cast(TimestampType))
      .withColumn("is_current", lit(true))

  /** Empty lark_id -> employee_sur_id lookup (first-run leader
    * resolution source). */
  private def emptyEmployeeLookup(spark: SparkSession): DataFrame =
    emptyStrings(spark, Seq("lark_id", "employee_sur_id"))

  /** Typed empty current-dim slices for first runs where the dim table
    * doesn't exist yet but facts do land: the fact builders select by
    * name, so the stand-in must carry the joined columns (a schemaless
    * empty frame would fail resolution and abort the run). */
  def emptyDimEmployeeSlice(spark: SparkSession): DataFrame =
    emptyStrings(spark, Seq("user_id", "lark_id", "employee_sur_id",
      "name", "job_title"))

  def emptyDimVendorSlice(spark: SparkSession): DataFrame =
    emptyStrings(spark, Seq("vendor_id", "vendor_sur_id"))

  private def emptyStrings(spark: SparkSession, names: Seq[String]): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(names.map(StructField(_, StringType))))

  /** SCD2 delta for dim_employee; `dimCurrent` = None on the first run. */
  def dimEmployeeDelta(bronze: DataFrame, dimCurrent: Option[DataFrame]): DataFrame = {
    val prepSource = dimCurrent.getOrElse(emptyEmployeeLookup(bronze.sparkSession))
    val batch = prepareEmployeeBatch(bronze, prepSource)
    val cur = dimCurrent.getOrElse(emptyDim(batch))
    Scd2.delta(batch, cur.select((dimEmployeeCols ++ Scd2Meta).map(col): _*),
      "user_id", "datetime_updated", "employee_sur_id")
  }

  /** SCD2 delta for dim_vendor; `dimCurrent` = None on the first run. */
  def dimVendorDelta(bronze: DataFrame, dimCurrent: Option[DataFrame]): DataFrame = {
    val batch = prepareVendorBatch(bronze)
    val cur = dimCurrent.getOrElse(emptyDim(batch))
    Scd2.delta(batch, cur.select((dimVendorCols ++ Scd2Meta).map(col): _*),
      "vendor_id", "datetime_updated", "vendor_sur_id")
  }

  private val Scd2Meta = Seq("valid_from", "valid_to", "is_current")

  /** fact_attendance_record (reference: etl.py:424-447): the reference
    * merges the FULL dim then apply_schema drops every dim column (the
    * DDL keeps only the record's own fields) — the join is retained for
    * semantic parity (it would duplicate fact rows if the dim ever held
    * two current rows per user_id, exactly as the reference would), but
    * builds its broadcast from the key column alone. */
  def factAttendanceRecord(bronze: DataFrame, dimEmployeeCurrent: DataFrame): DataFrame =
    bronze
      .join(broadcast(dimEmployeeCurrent.select(col("user_id"))),
        Seq("user_id"), "left")
      .select("user_id", "attendance_record_id", "check_time",
              "check_location_name", "is_offsite", "attendance_date")

  /** fact_attendance (reference: etl.py:449-472; DDL:
    * dwh/silver/fact_attendance.py). */
  def factAttendance(bronze: DataFrame, dimEmployeeCurrent: DataFrame): DataFrame =
    bronze
      .join(broadcast(dimEmployeeCurrent.select(col("user_id"),
        col("employee_sur_id"))), Seq("user_id"), "left")
      .select("attendance_id", "attendance_date", "user_id", "employee_sur_id",
        "group_name", "shift_name",
        "check_in_record_id", "check_in_shift_time", "check_in_datetime",
        "check_in_location_name", "check_in_is_offsite", "check_in_type",
        "check_in_result", "check_in_result_supplement",
        "check_out_record_id", "check_out_shift_time", "check_out_datetime",
        "check_out_location_name", "check_out_is_offsite", "check_out_type",
        "check_out_result", "check_out_result_supplement",
        "request_penalty", "early_late", "early_late_20_min",
        "penalty_early_late_20_min", "penalty", "reason")

  /** fact_payment (reference: etl.py:474-523): Lark payload extraction
    * then a chained 3-way enrich join (vendor by vendor_id, employee by
    * lark_id). */
  def factPayment(bronze: DataFrame, dimVendorCurrent: DataFrame,
                  dimEmployeeCurrent: DataFrame): DataFrame =
    bronze
      .withColumn("payment_id", larkField(col("payment_id"), "text"))
      .withColumn("payment_name", larkField(col("payment_name"), "text"))
      .withColumn("payment_type",
        parseStringList(col("payment_type")).getItem(0))
      .withColumn("lark_id", larkDictField(col("buying_person"), "id"))
      .withColumn("buying_person_name", larkDictField(col("buying_person"), "name"))
      .withColumn("vendor_id", larkField(col("billing_person"), "text"))
      .join(broadcast(dimVendorCurrent.select(col("vendor_id"),
        col("vendor_sur_id"))), Seq("vendor_id"), "left")
      .join(broadcast(dimEmployeeCurrent.select(col("lark_id"),
        col("employee_sur_id"))), Seq("lark_id"), "left")
      .select("payment_id", "payment_name", "payment_type", "payment_date",
        "project_name", "goods", "price_unit", "quantity", "price_total",
        "bill_image", "billing_evidence", "buying_person_name",
        "employee_sur_id", "vendor_sur_id", "note", "was_approved_by_ceo",
        "was_paid_by_accountant", "was_recieve", "ceo_approved_datetime",
        "accountant_paid_datetime", "recieve_datetime")
}
