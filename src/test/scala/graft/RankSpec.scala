package graft

import org.apache.spark.sql.functions._
import graft.operators.Rank

class RankSpec extends SparkSpec {
  import spark.implicits._

  // 4-doc corpus with hand-computable statistics:
  //   d1: "a a b"    d2: "a c"    d3: "b b b c"    d4: "d"
  private val docs = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "b b b c"), (4L, "d"))
    .toDF("doc_id", "text")

  test("tfidf: hand-computed scores, ranking and ties") {
    val out = Rank.tfidfTopTerms(docs, "doc_id", "text", topK = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    // N=4; df: a=2, b=2, c=2, d=1. idf(df=2)=ln(5/3), idf(df=1)=ln(5/2).
    def s(tf: Int, df: Int): Double =
      BigDecimal(tf * math.log(5.0 / (df + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, 1, "a", s(2, 2)), (1L, 2, "b", s(1, 2)),
      // d2: a and c tie at tf=1,df=2 -> token-asc breaks the tie
      (2L, 1, "a", s(1, 2)), (2L, 2, "c", s(1, 2)),
      (3L, 1, "b", s(3, 2)), (3L, 2, "c", s(1, 2)),
      (4L, 1, "d", s(1, 1))))
  }

  test("bm25: matched docs only, ordered by score, rank contiguous") {
    val out = Rank.bm25Search(docs, "doc_id", "text", Seq("a", "d"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // docs 1, 2, 4 match; 3 (no 'a'/'d') must not appear
    assert(out.map(_._2).toSet == Set(1L, 2L, 4L))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._4).toSeq == out.map(_._4).toSeq.sorted.reverse)
    // d4 is the only doc with the rarest term (df=1) and the shortest dl —
    // BM25 must rank it first
    assert(out.head._2 == 4L)
    // dl column carries the document token count
    assert(out.find(_._2 == 1L).get._3 == 3L)
  }

  test("bm25 rejects duplicate query terms (would double-count)") {
    val e = intercept[IllegalArgumentException] {
      Rank.bm25Search(docs, "doc_id", "text", Seq("a", "a"), topK = 5)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("bm25: score increases with tf at equal dl (saturating, positive)") {
    val corpus = Seq(
      (1L, "t x x x"), (2L, "t t x x"), (3L, "t t t x"), (4L, "y y y y"))
      .toDF("doc_id", "text")
    val out = Rank.bm25Search(corpus, "doc_id", "text", Seq("t"), topK = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(3L, 2L, 1L))
    assert(out.forall(_._2 > 0.0))
    // saturation: the tf=1 -> 2 gain exceeds the tf=2 -> 3 gain
    val byId = out.toMap
    assert(byId(2L) - byId(1L) > byId(3L) - byId(2L))
  }

  test("tf is computed once: no consumer re-tokenizes the corpus") {
    // df/dl/postings are DIFFERENT aggregates over tf — Catalyst prunes
    // them into non-identical subtrees, so exchange reuse can never fire
    // and a lazy tf would re-run the corpus-sized tokenize+shuffle per
    // consumer. The checkpointed tf must leave ZERO tokenize calls in
    // the consuming plans (they read the materialized RDD instead).
    for (q <- Seq(Rank.tfidfTopTerms(docs, "doc_id", "text", topK = 2),
                  Rank.bm25Search(docs, "doc_id", "text", Seq("a", "d")))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("word_tokens"),
        s"corpus re-tokenized by a tf consumer:\n$plan")
      assert(plan.contains("ExistingRDD"), s"tf not checkpoint-backed:\n$plan")
    }
  }

  test("bm25 from the persisted index == one-shot, across batches and a replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    val path = s"$dir/postings"
    val wave2 = Seq((5L, "a b d"), (6L, "c c a")).toDF("doc_id", "text")
    Rank.appendPostings(docs, "doc_id", "text", path, "b0")
    Rank.appendPostings(wave2, "doc_id", "text", path, "b1")
    // at-least-once replay: the same batch appended twice must not
    // change a single statistic (tf, df, dl, N, avgdl all dedup)
    Rank.appendPostings(wave2, "doc_id", "text", path, "b1")
    val all = docs.unionByName(wave2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val oneShot = rows(Rank.bm25Search(all, "doc_id", "text",
      terms = Seq("a", "c"), topK = 10))
    val fromIndex = rows(Rank.bm25FromIndex(spark, path,
      terms = Seq("a", "c"), topK = 10))
    assert(fromIndex == oneShot && oneShot.nonEmpty)
    // the second wave is genuinely in the index (doc 6 matches both terms)
    assert(fromIndex.exists(_._2 == 6L))
  }

  test("phraseSearch: adjacency counts, overlaps, repeated terms, misses") {
    val corpus = Seq(
      (1L, "a b a b a"),  // "a b" at 0 and 2
      (2L, "a a a"),      // "a a" overlapping at 0 and 1
      (3L, "x y"),        // contains neither term pair
      (4L, "b a")         // reversed order only
    ).toDF("doc_id", "text")
    def run(phrase: Seq[String]) =
      Rank.phraseSearch(corpus, "doc_id", "text", phrase, topK = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // order matters: "a b" hits docs 1 only; "b a" hits 1 (pos 1,3) and 4
    assert(run(Seq("a", "b")) == Map(1L -> 2L))
    assert(run(Seq("b", "a")) == Map(1L -> 2L, 4L -> 1L))
    // a repeated term intersects two aliases of its own position list,
    // and OVERLAPPING occurrences each count ("a a a" -> 2); doc 1 has
    // no consecutive "a a" at all despite three a's
    assert(run(Seq("a", "a")) == Map(2L -> 2L))
    // 3-term phrase, still exact
    assert(run(Seq("a", "b", "a")) == Map(1L -> 2L))
    // absent phrase: no rows, not zero rows with tf 0
    assert(run(Seq("x", "a")).isEmpty)
  }

  test("bm25 rejects empty or oversized term lists") {
    intercept[IllegalArgumentException] {
      Rank.bm25Search(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Rank.bm25Search(docs, "doc_id", "text", (1 to 9).map(i => s"t$i"))
    }
  }
}
