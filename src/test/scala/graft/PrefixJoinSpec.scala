package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Embeddings, PrefixJoin, TextOps}

/** Specs for the round-7 batch-2 additions: prefix-filtered exact
  * Jaccard join (losslessness vs brute force), normalized dedup, and the
  * mergeable covariance moments. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix join == brute force on a seeded random corpus (losslessness)") {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 80).map(i => s"w$i")
    val docs = (0 until 120).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // plant overlapping pairs: near-copies with small edits
    val planted = docs.filter(_._1 % 10 == 0).map { case (id, t) =>
      (id + 1000L, t.split(" ").drop(1).mkString(" ") + " extra")
    }
    val corpus = (docs ++ planted).toDF("doc_id", "text")
    val fast = pairsOf(PrefixJoin.jaccardJoin(corpus, "doc_id", "text", 1, 2))
    val brute = pairsOf(PrefixJoin.jaccardJoinBrute(corpus, "doc_id", "text", 1, 2))
    assert(fast == brute)
    assert(brute.nonEmpty) // the planted near-copies must appear
  }

  test("prefix join == brute force in shingle mode (k=3) on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val fast = pairsOf(PrefixJoin.jaccardJoin(docs, "doc_id", "text", 3, 5, shingleK = 3))
    val brute = pairsOf(PrefixJoin.jaccardJoinBrute(docs, "doc_id", "text", 3, 5, shingleK = 3))
    assert(fast == brute)
  }

  test("prefix join exact boundary: J == tau accepted, just below rejected") {
    // sets {a b c d e f} vs {a b c d e g}: I=5, U=7, J=5/7
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    val atTau = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 5, 7).collect()
    assert(atTau.length == 1 && atTau(0).getLong(0) == 1L)
    // jaccard is the UNROUNDED 5/7 since the r8 round()-tie audit
    assert(atTau(0).getDouble(2) == 5.0 / 7.0)
    val above = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 3, 4) // 3/4 > 5/7
    assert(above.count() == 0)
  }

  test("prefix join is set-semantic: repeated tokens don't change Jaccard") {
    val docs = Seq((1L, "a a a b b c"), (2L, "c b a")).toDF("doc_id", "text")
    val out = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 99, 100).collect()
    assert(out.length == 1 && out(0).getDouble(2) == 1.0)
  }

  test("normalizedDedup collapses recased/punctuated/reflowed variants to the min id") {
    val docs = Seq(
      (10L, "Hello, World!"),
      (11L, "hello   world"),
      (12L, "HELLO-WORLD"),
      (20L, "something else")).toDF("doc_id", "text")
    val out = Dedup.normalizedDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 10L && out(0).getLong(1) == 3L)
    assert(out(1).getLong(0) == 20L && out(1).getLong(1) == 1L)
  }

  test("normalizeForDedup is idempotent") {
    val docs = Seq((1L, "  A--B  c!! d  ")).toDF("doc_id", "text")
    val once = docs.select(TextOps.normalizeForDedup(col("text")).as("n"))
    val twice = once.select(TextOps.normalizeForDedup(col("n")).as("n"))
    assert(once.head.getString(0) == twice.head.getString(0))
    assert(once.head.getString(0) == "a b c d")
  }

  test("persisted moments table: replayed appends dedup away; equals one-shot") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("graft_moments").resolve("t").toString
    Embeddings.appendMoments(e.filter(col("vec_id") % 2 === 0),
      "embedding", path, batchId = "even")
    Embeddings.appendMoments(e.filter(col("vec_id") % 2 === 1),
      "embedding", path, batchId = "odd")
    // at-least-once: the odd batch lands twice — read-side dedup absorbs it
    Embeddings.appendMoments(e.filter(col("vec_id") % 2 === 1),
      "embedding", path, batchId = "odd")
    val fromTable = Embeddings.covarianceFromTable(spark, path)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val oneShot = Embeddings.covariance(e, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fromTable == oneShot) // exact — DECIMAL stats, duplicate batch dropped

    // maintenance rung: folding the appends into one group-summed frame
    // is value-preserving (exact DECIMAL addition) and shrinks the table
    val (before, after) = Embeddings.compactMoments(spark, path)
    assert(after <= before && after >= 1)
    val compacted = Embeddings.covarianceFromTable(spark, path)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(compacted == oneShot)
  }

  test("momentStats merge over any split equals the one-shot covariance") {
    val rnd = new scala.util.Random(5)
    val e = (0 until 150).map(i =>
      (i.toLong, Array.fill(6)((rnd.nextGaussian()).toFloat))).toDF("vec_id", "embedding")
    val oneShot = Embeddings.covariance(e, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // three-way uneven split
    val parts = Seq(
      e.filter(col("vec_id") % 5 === 0),
      e.filter(col("vec_id") % 5 === 1),
      e.filter(col("vec_id") % 5 >= 2)).map(Embeddings.momentStats(_, "embedding"))
    val merged = Embeddings.covarianceFromStats(Embeddings.mergeStats(parts))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(merged == oneShot) // exact equality — DECIMAL sums, no tolerance
  }

  test("covarianceFromStats(momentStats(df)) == covariance(df) without any merge") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Embeddings.covariance(e, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Embeddings.covarianceFromStats(Embeddings.momentStats(e, "embedding"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a == b)
  }
}
