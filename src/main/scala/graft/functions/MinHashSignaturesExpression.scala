package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for MinHash signatures: distinct word
  * `shingle`-grams of the space-split text, each folded to the 48-bit
  * prefix of its md5, then `k` affine hashes
  * h_i(x) = (a_i·x + b_i) mod 2^31−1 minimized per i — element i of
  * the result array is mh_i.
  *
  * Bit-identical to the SQL higher-order-function formulation in
  * [[graft.llm.Dedup.minhashSignaturesHof]] (pinned by
  * `MinHashSignaturesSpec`) including the degenerate-short-doc rule
  * (docs shorter than `shingle` words hash their whole text as one
  * gram) — but the HOF chain runs one interpreted lambda per shingle
  * per hash under CodegenFallback, while this is one primitive loop
  * per document (same static-call doGenCode shape as
  * [[WinnowFingerprints]]). The affine coefficients live HERE;
  * [[graft.llm.Dedup.affine]] delegates, so the engine and the DuckDB
  * oracle text can never drift.
  */
case class MinHashSignatures(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "minhash_signatures"

  /** Bad arguments fail as a clean ANALYSIS error (same contract as
    * [[SimHashFingerprint]]), never an executor-side throw at
    * codegen/eval time. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure("shingle and k must be literals")
    else if (Seq(second, third).exists(e =>
        Option(e.eval(null)).forall(_.asInstanceOf[Int] <= 0)))
      TypeCheckResult.TypeCheckFailure("shingle and k must be positive INTs")
    else TypeCheckResult.TypeCheckSuccess
  }
  private lazy val shingle: Int = second.eval(null).asInstanceOf[Int]
  private lazy val k: Int = third.eval(null).asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, s: Any, kk: Any): Any =
    MinHashSignatures.compute(text.asInstanceOf[UTF8String], shingle, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, _, _) =>
      s"graft.functions.MinHashSignatures.compute($t, $shingle, $k)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinHashSignatures =
    copy(first = f, second = s, third = t)
}

object MinHashSignatures {

  /** 2^31 − 1: far below the 48-bit input domain so the affine map
    * wraps (a larger modulus would be monotone in x and every h_i
    * would pick the same min-shingle). */
  val MersennePrime: Long = 2147483647L

  /** h_i coefficients — a_i·x tops out near 2^62: inside int64. */
  def affine(i: Int): (Int, Int) = (12289 + 2 * i, 1000003 * (i + 1))

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, shingle: Int, k: Int): ArrayData = {
    // Spark split semantics: limit -1 keeps trailing empty strings
    val str = text.toString
    val words = str.split(" ", -1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val md = digest.get()

    def vote(gram: String): Unit = if (seen.add(gram)) {
      md.reset()
      val h = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 12 hex chars = first 6 bytes, big-endian — the same
      // 48-bit value as conv(substr(md5(g), 1, 12), 16, 10)
      var x = 0L
      var b = 0
      while (b < 6) { x = (x << 8) | (h(b) & 0xffL); b += 1 }
      var i = 0
      while (i < k) {
        val hi = ((12289L + 2L * i) * x + 1000003L * (i + 1)) % MersennePrime
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
    }

    if (words.length < shingle) vote(str)
    else {
      val sb = new java.lang.StringBuilder()
      var p = 0
      while (p + shingle <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < shingle) {
          if (j > 0) sb.append(' ')
          sb.append(words(p + j))
          j += 1
        }
        vote(sb.toString)
        p += 1
      }
    }
    new GenericArrayData(mins)
  }
}
