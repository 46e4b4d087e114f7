package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the defensive numeric coercion (F10,
  * reference: data_helper.py:109-122): a numeric cell may arrive as a
  * number, a numeric string, a Python list (first element), or a dict
  * (its 'text', default 0); anything else coerces to 0; null passes
  * through. Same doGenCode static-call shape as [[PyToJson]] — the
  * bronze normalization stage stays inside one codegen span.
  */
case class CoerceNumeric(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "coerce_numeric"

  override protected def nullSafeEval(input: Any): Any =
    CoerceNumeric.coerce(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("coerced")
      s"""
         |java.lang.Double $r = graft.functions.CoerceNumeric.coerce($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CoerceNumeric =
    copy(child = newChild)
}

object CoerceNumeric {

  /** Static entry point shared by interpreted eval and generated code. */
  def coerce(s: UTF8String): java.lang.Double =
    if (s == null) null else coerceString(s.toString)

  def coerceString(raw: String): java.lang.Double = {
    val trimmed = raw.trim
    def toNum(t: String): Option[Double] =
      try Some(t.toDouble) catch { case _: Exception => None }
    toNum(trimmed).orElse {
      Option(PyLiteral.toJson(trimmed)).flatMap { js =>
        try {
          val j = js.trim
          if (j.startsWith("[")) {
            // first element: number, or dict with "text"
            val inner = j.substring(1, j.length - 1).trim
            if (inner.isEmpty) Some(0.0)
            else if (inner.startsWith("{")) extractText(inner)
            else toNum(inner.split(",")(0).trim.stripPrefix("\"").stripSuffix("\""))
          } else if (j.startsWith("{")) extractText(j)
          else toNum(j.stripPrefix("\"").stripSuffix("\""))
        } catch { case _: Exception => None }
      }
    }.map(d => java.lang.Double.valueOf(d)).getOrElse(java.lang.Double.valueOf(0.0))
  }

  private def extractText(jsonObj: String): Option[Double] = {
    val m = """"text"\s*:\s*"?([-+0-9.eE]+)"?""".r.findFirstMatchIn(jsonObj)
    m.flatMap(g => try Some(g.group(1).toDouble) catch { case _: Exception => None })
      .orElse(Some(0.0))
  }
}
