package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Python-literal -> JSON transform
  * (F2): the same parse as [[PyLiteral.toJson]] but without the UDF
  * layer — no encoder round-trip per row, and `doGenCode` emits a
  * static call that whole-stage codegen inlines into the stage loop,
  * so the surrounding `from_json(...)` pipeline stays in one codegen
  * span. Null in, null out; unparseable in, null out.
  */
case class PyToJson(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "py_to_json"

  override protected def nullSafeEval(input: Any): Any =
    PyToJson.toJsonUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pyJson")
      s"""
         |UTF8String $r = graft.functions.PyToJson.toJsonUTF8($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PyToJson =
    copy(child = newChild)
}

object PyToJson {
  /** Static entry point shared by interpreted eval and generated code. */
  def toJsonUTF8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val r = PyLiteral.toJson(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}
