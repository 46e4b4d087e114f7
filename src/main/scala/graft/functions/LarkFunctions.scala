package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level functions reproducing the reference's scalar transforms
  * (SURVEY.md §2.6). Everything except the Python-literal parse is a
  * built-in Catalyst expression chain — codegen'd, no UDF in the hot
  * path; the parse is one scalar UDF emitting JSON text that `from_json`
  * (native) then decodes.
  */
object LarkFunctions {

  /** F2: Python-repr literal -> JSON text (null on parse failure) —
    * the native [[PyToJson]] expression (whole-stage-codegen'd, no UDF
    * serialization hop), constructed directly so it works on a vanilla
    * session ([[graft.sql.GraftExtensions]] registers the same
    * expression by name for SQL text). */
  def pyToJson(c: Column): Column = Native.pyToJson(c)

  /** UDF form of the same parse, for sessions without the graft
    * extensions installed. */
  val pyToJsonUdf = udf(PyLiteral.toJson _)

  /** Schema of a Lark person/link cell: list of {id, name, en_name, email, text}. */
  val larkPersonSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("en_name", StringType),
    StructField("email", StringType),
    StructField("text", StringType))))

  /** F2+F3: parse a Lark list-of-struct cell. */
  def parseLarkList(c: Column): Column = from_json(pyToJson(c), larkPersonSchema)

  /** F3: first element's field of a Lark list cell, e.g. user -> lark_id
    * (reference: dags/utils/etl.py:285-294). Null-safe by construction. */
  def larkField(c: Column, field: String): Column =
    parseLarkList(c).getItem(0).getField(field)

  /** F2 dict variant (reference: `Người mua` is a bare dict, etl.py:500-505). */
  def larkDictField(c: Column, field: String): Column =
    from_json(pyToJson(c), larkPersonSchema.elementType).getField(field)

  /** F2 list-of-string variant (e.g. department_ids). */
  def parseStringList(c: Column): Column =
    from_json(pyToJson(c), ArrayType(StringType))

  /** F1: surrogate key — md5(naturalKey + yyyy-MM-dd HH:mm:ss of change ts)
    * (reference: dags/utils/etl.py:282-284,368-371). */
  def surrogateKey(naturalKey: Column, changeTs: Column): Column =
    md5(concat(naturalKey.cast("string"),
               date_format(changeTs, "yyyy-MM-dd HH:mm:ss")))

  /** F4: epoch millis -> timestamp, truncating sub-second like the
    * reference's `int(ms/1000)` (reference: data_helper.py:131-137).
    * Goes through double: CSV-landed epoch columns arrive as "1234.0"
    * strings when the source had nulls (pandas float64 columns), which
    * a direct long cast would null out. Epoch-ms values are far below
    * 2^53, so the double path is exact. */
  def epochMillisToTs(c: Column): Column =
    timestamp_seconds(floor(c.cast("double") / 1000.0).cast("long"))

  /** F5: coerce-parse a 'dd/MM/yyyy HH:mm' string to timestamp, null on
    * any parse failure — the reference's `pd.to_datetime(x,
    * format='%d/%m/%Y %H:%M', errors='coerce')` (reference:
    * dags/utils/etl.py:637-639). `try_to_timestamp` nulls-on-failure
    * regardless of the session's ANSI setting. */
  def coerceTimestamp(c: Column, fmt: String = "dd/MM/yyyy HH:mm"): Column =
    try_to_timestamp(c, lit(fmt))

  /** F8: lateness minutes — clip-upper-0 then abs, i.e. max(0, -x)
    * (reference: dags/utils/etl.py:640-647). */
  def clipAbs(c: Column): Column = coalesce(greatest(lit(0.0), -c), lit(0.0))

  /** F7: duration between timestamps in minutes (fractional). */
  def durationMinutes(end: Column, start: Column): Column =
    (end.cast("double") - start.cast("double")) / 60.0

  /** F6: UTC -> VN local display shift (reference: etl.py:631,640-647). */
  def plus7h(c: Column): Column = c + expr("INTERVAL 7 HOURS")

  /** F10: defensive numeric coercion (reference: data_helper.py:109-122):
    * a numeric cell may arrive as a number, a numeric string, a Python
    * list (take first element), or a dict (take 'text', default 0);
    * anything else -> 0. Null passes through (the bronze fill handles
    * it). Native [[CoerceNumeric]] expression, constructed directly
    * (no session-extension requirement; see [[Native]]). */
  def coerceNumeric(c: Column): Column = Native.coerceNumeric(c)

  /** UDF form for sessions without the graft extensions installed. */
  val coerceNumericUdf = udf((raw: String) =>
    if (raw == null) null else CoerceNumeric.coerceString(raw))
}
