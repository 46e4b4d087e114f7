package graft.warehouse

import org.apache.spark.sql.types._
import graft.operators.BronzeNormalize.ColumnSpec

/** Bronze table declarations: source column -> snake_case target +
  * type, mirroring the reference's per-table dtype dicts and rename
  * maps (reference: dags/utils/dwh/bronze/lark/{employee,attendance,
  * attendance_record,payment,vendor}.py). Epoch-millis columns are the
  * reference's `datetime64[ns, UTC]` fields (Lark delivers epoch ms);
  * junk-numeric columns are its junk-tolerant int64 fields.
  */
object BronzeSchemas {

  private def s(src: String, tgt: String) = ColumnSpec(src, tgt, StringType)
  private def ts(src: String, tgt: String) =
    ColumnSpec(src, tgt, TimestampType, epochMillis = true)
  private def b(src: String, tgt: String) = ColumnSpec(src, tgt, BooleanType)
  private def num(src: String, tgt: String) =
    ColumnSpec(src, tgt, LongType, junkNumeric = true)

  /** reference: bronze/lark/employee.py:25-55 */
  val employee: Seq[ColumnSpec] = Seq(
    s("user_id", "user_id"), s("employee_no", "employee_no"), s("name", "name"),
    s("user", "user"), s("employee_type", "employee_type"), s("email", "email"),
    s("mobile", "mobile"), s("department_ids", "department_ids"),
    s("departments", "departments"), s("leader", "leader"),
    ts("join_time", "join_time"), s("job_title", "job_title"), s("city", "city"),
    s("gender", "gender"), s("Parent items", "parent_items"),
    s("Created By", "created_by"), s("Modified By", "modified_by"),
    ts("Date Created", "datetime_created"),
    ts("Last Modified Date", "datetime_updated"))

  /** reference: bronze/lark/vendor.py:12-32 */
  val vendor: Seq[ColumnSpec] = Seq(
    s("Vendor", "vendor_id"), s("Tên tài khoản", "bank_holder_name"),
    s("Số tài khoản", "bank_acc_number"), s("Ngân hàng", "bank_holder"),
    s("QR code", "qr_code"), s("Ghi chú", "note"),
    ts("Date Created", "datetime_created"),
    ts("Last Modified Date", "datetime_updated"))

  /** reference: bronze/lark/attendance.py:36-100 */
  val attendance: Seq[ColumnSpec] = Seq(
    s("User id", "user_id"), s("Result id", "attendance_id"),
    ts("Date", "attendance_date"), s("Employee", "employee"),
    s("Group name", "group_name"), s("Shift name", "shift_name"),
    s("Check in record id", "check_in_record_id"),
    ts("Check in time", "check_in_datetime"),
    ts("Check in shift time", "check_in_shift_time"),
    s("Check in location name", "check_in_location_name"),
    b("Check in - Is offsite", "check_in_is_offsite"),
    s("Check in type", "check_in_type"), s("Check in result", "check_in_result"),
    s("Check in result supplement", "check_in_result_supplement"),
    s("Check out record id", "check_out_record_id"),
    ts("Check out time", "check_out_datetime"),
    ts("Check out shift time", "check_out_shift_time"),
    s("Check out location name", "check_out_location_name"),
    b("Check out - Is offsite", "check_out_is_offsite"),
    s("Check out type", "check_out_type"), s("Check out result", "check_out_result"),
    s("Check out result supplement", "check_out_result_supplement"),
    s("Employee type", "employee_type"),
    b("Nhân sự không đồng ý phiếu phạt", "request_penalty"),
    b("Đi muộn / về sớm", "early_late"),
    b("Muộn 20p/sớm 20p", "early_late_20_min"),
    num("Giá phạt đi muộn/ về sớm", "early_late_penalty_price"),
    num("Phạt muộn 20p/sớm 20p", "penalty_early_late_20_min"),
    num("Tiền phạt", "penalty"), s("Lý do", "reason"))

  /** reference: bronze/lark/attendance_record.py:13-31 */
  val attendanceRecord: Seq[ColumnSpec] = Seq(
    s("User id", "user_id"), s("Record id", "attendance_record_id"),
    ts("Date", "attendance_date"), s("Employee", "employee"),
    ts("Check time", "check_time"),
    s("Check location name", "check_location_name"),
    b("Is offsite", "is_offsite"))

  /** reference: bronze/lark/payment.py:28-76 */
  val payment: Seq[ColumnSpec] = Seq(
    s("Payment_ID", "payment_id"), s("Payment", "payment_name"),
    s("Loại chi phí", "payment_type"), ts("Ngày mua", "payment_date"),
    s("Tên dự án", "project_name"), s("Hàng hóa", "goods"),
    num("Đơn giá", "price_unit"), num("Số lượng", "quantity"),
    num("Tổng tiền", "price_total"), s("Hóa đơn", "bill_image"),
    s("Minh chứng chuyển khoản", "billing_evidence"),
    s("Thông tin người cần chuyển khoản", "billing_person"),
    s("Số tài khoản", "bank_acc_number"), s("Ngân hàng", "bank_holder"),
    s("Người mua", "buying_person"), s("Ghi chú", "note"),
    b("CEO duyệt", "was_approved_by_ceo"),
    b("Kế toán đã thanh toán", "was_paid_by_accountant"),
    b("Người mua đã nhận được tiền", "was_recieve"),
    ts("Ngày CEO duyệt", "ceo_approved_datetime"),
    ts("Ngày kế toán chuyển khoản", "accountant_paid_datetime"),
    ts("Ngày người mua nhận tiền", "recieve_datetime"))

  /** Landing-zone table ids (reference: etl.py:144,160,175,190,205). */
  val tableIds: Map[String, String] = Map(
    "employee" -> "tblXTpGXeRW8mAfx",
    "attendance_record" -> "tblzcYy2TaKLtSIJ",
    "attendance" -> "tblyIrzuCoAorFyE",
    "payment" -> "tblV3dM091DDjHwq",
    "vendor" -> "tblZCiYqiaEdOR3f")

  val specsFor: Map[String, Seq[ColumnSpec]] = Map(
    "employee" -> employee, "vendor" -> vendor, "attendance" -> attendance,
    "attendance_record" -> attendanceRecord, "payment" -> payment)
}
