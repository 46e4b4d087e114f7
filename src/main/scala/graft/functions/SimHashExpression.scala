package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, BinaryExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for SimHash fingerprints: distinct words
  * of the space-split text each vote per bit of their 48-bit md5-prefix
  * hash (+1 where the bit is set, −1 where clear); the fingerprint is
  * the sign vector as a '1'/'0' string, bit j at position j.
  *
  * Bit-identical to the SQL higher-order-function formulation in
  * [[graft.llm.Dedup.simhashHof]] (pinned by `SimHashExpressionSpec`),
  * including Spark's `split` trailing-empty semantics and UTF-8 md5
  * bytes — but the HOF fold rebuilds a `bits`-wide boxed vote array
  * per word under CodegenFallback, while this is one primitive loop
  * per document (same static-call doGenCode shape as
  * [[WinnowFingerprints]]).
  *
  * `bits` must be a foldable INT in (0, 48] — the votes draw from a
  * 48-bit word hash.
  */
case class SimHashFingerprint(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "simhash_fingerprint"

  private lazy val bits: Int = right match {
    case Literal(v: Int, IntegerType) if v > 0 && v <= 48 => v
    case other => throw new IllegalArgumentException(
      s"simhash_fingerprint bits must be a literal INT in (0, 48], got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("bits must be a literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(text: Any, b: Any): Any =
    SimHashFingerprint.compute(text.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, _) =>
      s"graft.functions.SimHashFingerprint.compute($t, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashFingerprint =
    copy(left = newLeft, right = newRight)
}

object SimHashFingerprint {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, bits: Int): UTF8String = {
    // Spark split semantics: limit -1 keeps trailing empty strings
    val words = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](bits)
    val md = digest.get()
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (seen.add(w)) {
        md.reset()
        val h = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 12 hex chars = first 6 bytes, big-endian: the same
        // 48-bit value as conv(substr(md5(w), 1, 12), 16, 10)
        var x = 0L
        var b = 0
        while (b < 6) { x = (x << 8) | (h(b) & 0xffL); b += 1 }
        var j = 0
        while (j < bits) {
          votes(j) += (if (((x >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }
}
