package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel shared by interpreted eval and generated code. */
object ShingleKernel {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** THE whitespace tokenizer all text kernels share (split on \s+ and
    * drop empties — the executable twin of filter(split(text, "\\s+"),
    * _ != "")). One definition so shingles, chunks and the metric battery
    * can never diverge on token boundaries. */
  private[expr] def splitTokens(s: String): Array[String] =
    WS.split(s, -1).filter(_.nonEmpty)

  /** Whitespace tokens (split + empty filter) as ArrayData — shared by
    * [[WordTokens]] and callers needing the raw token array. */
  def tokens(text: UTF8String): ArrayData = {
    val toks = splitTokens(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Word k-shingles in one pass: the n-k+1 space-joined token windows;
    * fewer than k tokens collapse to one shingle of the whole
    * (whitespace-normalized) token stream — exactly the semantics of the
    * HOF composition it replaces (`transform(sequence(...), i =>
    * array_join(slice(toks, i, k), " "))`,
    * [[graft.operators.Dedup.shingles]]'s original form). */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = splitTokens(text.toString)
    if (toks.length < k)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val out = new Array[Any](toks.length - k + 1)
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native whitespace tokenizer: the `filter(split(text, "\\s+"), _ != "")`
  * composition is the engine's most-used text primitive (simhash, CMS,
  * jaccard, token frequency, stopword ratio all explode or fold it) and
  * the `filter` HOF runs interpreted. One pass, identical semantics —
  * including `[]` (not `[""]`) for empty/whitespace-only input. */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_tokens expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tokens"

  override protected def nullSafeEval(t: Any): Any =
    ShingleKernel.tokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleKernel.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

/** Native Catalyst expression for word-shingle generation — the single
  * hottest scalar in the MinHash family. The higher-order-function form
  * (transform + sequence + slice + array_join) runs interpreted and
  * re-walks the token array per shingle; measured at sf0.1 it was ~3 s of
  * q22's 5.5 s. This is one static call per row inside whole-stage
  * codegen, building each shingle in a single pass.
  *
  * `k` is a plan-time constant (shingle width is an operator parameter,
  * not data), so it compiles into the generated code as a literal. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (string, k >= 1), got " +
        s"(${child.dataType.simpleString}, $k)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(t: Any): Any =
    ShingleKernel.wordShingles(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.ShingleKernel.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
