package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object FingerprintKernel {
  /** Java-regex-\s whitespace (the exact set Spark's split("\\s+") uses —
    * NOT Character.isWhitespace, which differs on some Unicode spaces). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Fused tokenize + rolling hash, value-identical to
    * TextOps.fingerprint's Column composition (token value = first code
    * point * 31 + code-point length; fold h = (h*131 + v) mod 1e9+7) but a
    * single pass over the chars with zero array/string allocation. */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var h = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        val first = str.codePointAt(start)
        val len = str.codePointCount(start, i)
        h = (h * 131L + (first * 31L + len)) % 1000000007L
      }
    }
    h
  }
}

/** Native codegen'd form of TextOps.fingerprint — the bulk-corpus path
  * (the Column composition builds a token array and folds it interpreted,
  * per document). */
case class TextFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_fingerprint expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "text_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintKernel.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.FingerprintKernel.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

object TextFingerprint {
  def apply(c: Column): Column = shim.column(TextFingerprint(shim.expression(c)))
}
