package graft

import org.apache.spark.sql.functions._
import graft.expr.{GraftFunctions, SimilarityKernel}
import org.apache.spark.unsafe.types.UTF8String

class PositionalSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def k(a: String, b: String): Double =
    SimilarityKernel.positional(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches the reference formula") {
    assert(math.abs(k("Mumabi", "Mumbai") - 4.0 / 6) < 1e-12)
    assert(k("DELHI", "delhi") == 1.0)
    assert(k("", "x") == 0.0 && k("x", "") == 0.0)
    assert(k("ab", "abcd") == 0.5) // common prefix over max length
  }

  test("expression evaluates via codegen in a projection and handles nulls") {
    val df = Seq(("Mumabi", "Mumbai"), (null, "x"), ("x", null)).toDF("a", "b")
    val got = df.select(
      round(GraftFunctions.positionalSimilarity(col("a"), col("b")), 4)).collect()
    assert(got(0).getDouble(0) == 0.6667)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("SQL registration: positional_similarity callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT positional_similarity('Bangalor', 'Bangalore') AS s").head()
    assert(math.abs(r.getDouble(0) - 8.0 / 9) < 1e-12)
  }

  test("native fingerprint is value-identical to the Column composition") {
    val inputs = Seq("ab c", "", "   ", "one", "the quick brown fox",
      "tabs\tand\nnewlines  collapse", "中文 词 例", "x " * 500)
    val df = inputs.toDF("t")
    val got = df.select(
      graft.operators.TextOps.fingerprint(col("t")).as("native"),
      graft.operators.TextOps.fingerprintComposed(col("t")).as("composed"))
      .collect()
    got.zip(inputs).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for input: '$in'")
    }
  }

  test("SQL registration: text_fingerprint callable from spark.sql") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT text_fingerprint('ab c') AS f").head().getLong(0) == 397249L)
  }

  test("SQL registration: vector_dot / vector_norm callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vector_norm(array(3.0D, 4.0D)) AS n").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }
}
