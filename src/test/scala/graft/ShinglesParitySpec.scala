package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, TextOps}

/** The native WordShingles expression must reproduce the HOF composition
  * it replaced (transform + sequence + slice + array_join over filtered
  * whitespace tokens) value-for-value — the MinHash/Jaccard oracles were
  * written against those semantics. */
class ShinglesParitySpec extends SparkSpec {
  import spark.implicits._

  /** The original interpreted form, kept here as the executable spec. */
  private def hofShingles(text: Column, k: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
  }

  private def assertParity(inputs: Seq[String], k: Int): Unit = {
    val df = inputs.toDF("text")
    val rows = df.select(
        Dedup.shingles(col("text"), k).as("native"),
        hofShingles(coalesce(col("text"), lit("")), k).as("hof"))
      .collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle mismatch for k=$k input=${Option(in).map(_.take(60))}")
    }
  }

  test("native shingles == HOF shingles on edge cases") {
    val edges = Seq(
      null, "", " ", "   ", "\t\n ", "one", "one two", "one two three",
      "one two three four", "  leading", "trailing  ", "a  b\tc\nd",
      "répé tition über tökens", "a b a b a b", "x   y", "𝒳 𝒴 𝒵 w")
    for (k <- Seq(1, 2, 3, 5)) assertParity(edges, k)
  }

  test("native shingles == HOF shingles on generated corpora") {
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""),
      Gen.const(" "), Gen.asciiPrintableStr.map(_.take(4)))
    val text = Gen.listOf(word).map(_.mkString(" "))
    val inputs = Gen.listOfN(300, text)
      .pureApply(Gen.Parameters.default, Seed(7L))
    assertParity(inputs, 3)
  }

  test("native tokens == filter(split) tokens") {
    val edges = Seq(null, "", " ", "\t \n", "one", " a  b\tc ", "é 漢 字",
      "x" * 100 + " y")
    val gen = Gen.listOfN(300,
        Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const("")))
          .map(_.mkString(" ")))
      .pureApply(Gen.Parameters.default, Seed(13L))
    val rows = (edges ++ gen).toDF("text").select(
        TextOps.tokens(col("text")).as("native"),
        filter(split(coalesce(col("text"), lit("")), "\\s+"),
          t => t =!= "").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"token mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("word_shingles is SQL-callable and codegen'd") {
    val out = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").collect().head.getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    // stays inside whole-stage codegen (no interpreted HOF fallback) —
    // non-literal input so constant folding can't collapse the projection
    val plan = spark.range(10)
      .select(concat(lit("a b c "), col("id")).as("t"))
      .select(Dedup.shingles(col("t"), 3)).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // *(n) = WholeStageCodegen span
  }
}
