package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for ordered word n-gram windows over a
  * space-split text: element i (0-based) is words i+1 … i+n joined
  * with a single space; a doc with fewer than `n` words yields an
  * EMPTY array (callers that want the whole-text degenerate rule wrap
  * this in `CASE WHEN size < n THEN array(text) …`, which stays
  * codegen'd).
  *
  * Bit-identical to the `transform(sequence(...), i ->
  * array_join(slice(...)))` SQL formulation (pinned by
  * `WordNgramsSpec` — incl. Spark's split trailing-empty semantics),
  * but that chain is CodegenFallback: one boxed lambda + array slice +
  * join per window position. This is one primitive loop per document
  * (same static-call doGenCode shape as [[WinnowFingerprints]]).
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "word_ngrams"

  /** Bad arguments fail as a clean ANALYSIS error (same contract as
    * [[SimHashFingerprint]]), never an executor-side throw at
    * codegen/eval time. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("n must be a literal")
    else if (Option(right.eval(null)).forall(_.asInstanceOf[Int] <= 0))
      TypeCheckResult.TypeCheckFailure("n must be a positive INT")
    else TypeCheckResult.TypeCheckSuccess
  }
  private lazy val n: Int = right.eval(null).asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, nn: Any): Any =
    WordNgrams.compute(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, _) =>
      s"graft.functions.WordNgrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // Spark split semantics: limit -1 keeps trailing empty strings
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var p = 0
    while (p < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(p + j))
        j += 1
      }
      out(p) = UTF8String.fromString(sb.toString)
      p += 1
    }
    new GenericArrayData(out)
  }
}
