package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for winnowing-style document
  * fingerprints: hash every 8-code-point window with the polynomial
  * sum_k cp[i+k] * 31^k mod 2^31-1 and keep the 1/16 sample where
  * hash % 16 == 0. Bit-identical to the SQL higher-order-function
  * formulation in [[graft.llm.TextStats.fingerprints]] (pinned by
  * `WinnowFingerprintsSpec`), but the HOF chain
  * (`transform`/`filter`/lambda) is CodegenFallback — every window
  * position costs boxed lambda invocations — while this runs one
  * JIT-compiled primitive loop per document and stays inside the
  * surrounding whole-stage-codegen span (same static-call shape as
  * [[CoerceNumeric]]). Docs shorter than 8 code points yield an empty
  * array; null passes through.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private final val Mod = 2147483647L // 2^31 - 1
  private final val Width = 8
  private final val Sample = 16
  /** 31^k mod 2^31-1 — the same constants the SQL path unrolls. */
  private final val Pow: Array[Long] = {
    val p = new Array[Long](Width)
    p(0) = 1L
    var k = 1
    while (k < Width) { p(k) = p(k - 1) * 31 % Mod; k += 1 }
    p
  }

  /** Static entry point shared by interpreted eval and generated code.
    * One pass to decode code points, one primitive O(8) window per
    * position; kept hashes collected without boxing until the final
    * (usually small) result array. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < Width) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Long](n)
    var ci = 0
    var i = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(i) = cp.toLong
      i += 1
      ci += Character.charCount(cp)
    }
    var kept = new Array[Long](math.max(8, (n - Width + 1) / (Sample / 2)))
    var nKept = 0
    var pos = 0
    val last = n - Width
    while (pos <= last) {
      var h = 0L
      var k = 0
      while (k < Width) { h += cps(pos + k) * Pow(k); k += 1 }
      h %= Mod
      if (h % Sample == 0) {
        if (nKept == kept.length)
          kept = java.util.Arrays.copyOf(kept, kept.length * 2)
        kept(nKept) = h
        nKept += 1
      }
      pos += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, nKept))
  }
}
