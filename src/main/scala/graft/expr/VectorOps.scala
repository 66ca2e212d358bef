package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for the embedding hot path: dot product and L2 norm
  * over float/double array columns.
  *
  * The Column compositions in [[graft.operators.Knn]]
  * (`aggregate(zip_with(...))` / `aggregate(transform(...))`) are the
  * executable spec — Spark evaluates higher-order functions INTERPRETED,
  * allocating a lambda frame per element; on pair-scoring paths (brute
  * force, SRP/IVF candidate verify, semantic-dedup within-cluster pairs,
  * negative sampling) that interpreter tax dominates. Each kernel here is
  * one codegen'd static call per row — the WordShingles/TextMetrics
  * pattern (a tight JVM loop behind `defineCodeGen`, never an unrolled
  * expression tree, which bloats janino compiles — Knn's scaladoc
  * documents that measured failure mode).
  *
  * Float discipline (oracle-critical): the fold is LEFT-TO-RIGHT in
  * double with each element widened exactly like `x.cast("double")`, so
  * results are bit-identical to the HOF forms (0.0 + x == x in IEEE754;
  * VectorOpsParitySpec pins this on generated vectors).
  *
  * Contract: equal lengths, non-null elements (embedding columns). Both
  * are ENFORCED, not just documented: `ArrayData.getFloat/getDouble` on a
  * null slot silently reads garbage (typically 0.0), which would be a
  * silent value divergence from the HOF spec forms (they propagate null
  * through zip_with/transform) — so the kernels raise on a null element
  * instead, and callers whose vectors can legitimately hold nulls keep
  * the Column forms (null-propagating) or filter first. */
object VectorKernel {

  private def checkNotNull(v: ArrayData, i: Int, op: String): Unit =
    if (v.isNullAt(i))
      throw new IllegalArgumentException(
        s"$op: null element at index $i — embedding vectors must be dense " +
          "(use the HOF Column forms for null-propagating semantics)")

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vector_dot: length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      checkNotNull(a, i, "vector_dot"); checkNotNull(b, i, "vector_dot")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def sqDist(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vector_sqdist: length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      checkNotNull(a, i, "vector_sqdist"); checkNotNull(b, i, "vector_sqdist")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  def norm(a: ArrayData, aFloat: Boolean): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      checkNotNull(a, i, "vector_norm")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** round(x_i * x_j, 6) * 1e6 as exact longs, upper triangle flattened
    * row-major (i <= j). BigDecimal.valueOf + setScale(6, HALF_UP) is
    * Round's own DoubleType path — value parity with round(col, 6). */
  def outerMicros(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      checkNotNull(a, i, "vector_outer_micros")
      xs(i) = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Long](n * (n + 1) / 2)
    var t = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(t) = java.math.BigDecimal.valueOf(xs(i) * xs(j))
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        t += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

private object VectorOps {
  def elemCheck(name: String, dts: Seq[DataType]): TypeCheckResult = {
    val ok = dts.forall {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float>/array<double>, got ${dts.map(_.simpleString).mkString(", ")}")
  }
  def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Codegen'd left-fold dot product of two vector columns (double). */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.elemCheck("vector_dot", Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def lf = VectorOps.isFloat(left.dataType)
  private def rf = VectorOps.isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.VectorKernel.dot($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd left-fold squared L2 distance of two vector columns
  * (double) — the PQ/IVFADC hot path ([[graft.operators.Pq]]): encode
  * scores corpus x codebook and assign scores corpus x centroids, both
  * per-row over bounded broadcast sides, so the interpreter tax of the
  * HOF fold multiplies with nseeds/nlist. Bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  * (VectorOpsParitySpec). */
case class VectorSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.elemCheck("vector_sqdist", Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_sqdist"

  private def lf = VectorOps.isFloat(left.dataType)
  private def rf = VectorOps.isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.VectorKernel.sqDist($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqDist =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd left-fold L2 norm of a vector column (double). */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.elemCheck("vector_norm", Seq(child.dataType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  private def cf = VectorOps.isFloat(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VectorKernel.norm(a.asInstanceOf[ArrayData], cf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorKernel.norm($a, $cf)")

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Codegen'd upper-triangle outer products as EXACT micro-units: a flat
  * array of d(d+1)/2 longs, element t = round(x_i * x_j, 6) * 10^6 for
  * the t-th (i, j) pair in row-major upper-triangle order (i <= j) — the
  * covariance hot path ([[graft.operators.Embeddings]]).
  *
  * Why micros: the covariance oracle sums per-row products rounded to 6
  * decimals through DECIMAL (order-independent, cross-engine exact). The
  * nested-HOF form that built 2,080 DECIMAL structs per row ran
  * INTERPRETED — this kernel emits the same rationals as scaled longs in
  * one codegen'd loop, and sum(micros)/10^6 is the identical rational.
  * Rounding matches Spark's `round(double, 6)` exactly: both go through
  * BigDecimal.valueOf(x).setScale(6, HALF_UP) (Round's DoubleType path),
  * so values are bit-identical to the HOF/DECIMAL form it replaced
  * (VectorOpsParitySpec pins this).
  *
  * Contract: dense vectors (null elements raise, as the other kernels). */
case class VectorOuterMicros(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.elemCheck("vector_outer_micros", Seq(child.dataType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vector_outer_micros"

  private def cf = VectorOps.isFloat(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VectorKernel.outerMicros(a.asInstanceOf[ArrayData], cf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorKernel.outerMicros($a, $cf)")

  override protected def withNewChildInternal(newChild: Expression): VectorOuterMicros =
    copy(child = newChild)
}
