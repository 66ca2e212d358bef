package graft

import org.apache.spark.sql.functions._
import graft.operators._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("positional similarity matches the reference's zip/max formula, case-insensitive") {
    val df = Seq(("Mumabi", "Mumbai"), ("DELHI", "delhi"), ("abc", "xyz")).toDF("a", "b")
    val got = df.select(round(FuzzyJoin.positionalSimilarity(col("a"), col("b")), 4)).collect()
    assert(got(0).getDouble(0) == 0.6667) // 4 of 6 positions match
    assert(got(1).getDouble(0) == 1.0)
    assert(got(2).getDouble(0) == 0.0)
  }

  test("identical probe rows each keep their own best-match row") {
    val probe = Seq("Mumabi", "Mumabi").toDF("city")
    val master = Seq("Mumbai", "Pune").toDF("name")
    val got = FuzzyJoin.bestMatch(probe, "city", master, "name", threshold = 0.6)
    assert(got.count() == 2)
    assert(got.select("matched").collect().forall(_.getString(0) == "Mumbai"))
  }

  test("tiered clean: corrected -> exact -> fuzzy -> unmatched") {
    val probe = Seq("Mumabi", "Pune", "Bangalor", "Xyzzy").toDF("city")
    val master = Seq("Mumbai", "Pune", "Bangalore", "Chennai").toDF("name")
    val got = FuzzyJoin.tieredClean(probe, "city", master, "name",
        corrections = Map("Mumabi" -> "Mumbai"), threshold = 0.8, out = "clean")
      .select("city", "clean", "clean_method").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got("Mumabi") == ("Mumbai", "corrected"))
    assert(got("Pune") == ("Pune", "exact"))
    assert(got("Bangalor") == ("Bangalore", "fuzzy"))
    assert(got("Xyzzy") == ("Xyzzy", "unmatched"))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps first by order column") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "text")
    val got = Dedup.markExactDuplicates(df, "text", "id")
      .orderBy("id").select("is_duplicate").collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(false, true, false))
  }

  test("sortedNeighborhoodPairs pairs each record with its w sort-successors only") {
    import org.apache.spark.sql.functions.col
    // sort order by (v, id): 10->a, 20->b, 21->c, 90->d
    val df = Seq((1L, 20L, "b"), (2L, 10L, "a"), (3L, 90L, "d"), (4L, 21L, "c"))
      .toDF("id", "v", "tag")
    val got = Dedup.sortedNeighborhoodPairs(df, "id", Seq(col("v").asc), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // a(2)-b(1) gap1, a(2)-c(4) gap2, b(1)-c(4) gap1, b(1)-d(3) gap2, c(4)-d(3) gap1
    assert(got == Set((2L, 1L, 1), (2L, 4L, 2), (1L, 4L, 1), (1L, 3L, 2),
      (4L, 3L, 1)))
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborhoodPairs(df, "id", Seq(col("v").asc), window = 0)
    }
  }

  test("charNgrams: sliding distinct n-grams with degenerate-input guards") {
    val rows = Seq("abcd", "aaaa", "ab", "", null).toDF("t")
      .select(TextOps.charNgrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(rows(0) == List("abc", "bcd"))
    assert(rows(1) == List("aaa"))          // distinct, not 2 copies
    assert(rows(2) == Nil)                  // shorter than n: EMPTY —
    assert(rows(3) == Nil)                  // sequence(1,0) would descend
    assert(rows(4) == Nil)                  // null-safe
  }

  test("jaccard is set-semantics intersection over union") {
    val df = Seq((Seq("a", "b", "b"), Seq("b", "c"))).toDF("x", "y")
    assert(df.select(Dedup.jaccard(col("x"), col("y"))).head().getDouble(0) == 1.0 / 3.0)
  }

  test("minhash LSH finds a planted near-duplicate and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words nothing shared here at all whatsoever ok fine"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("id", "text")
    val pairs = Dedup.minhashNearDups(df, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("portableHash64 matches its DuckDB replica bit for bit") {
    // pinned value independently computed in DuckDB via
    // CAST('0x' || substr(md5('7:the quick brown'), 1, 15) AS BIGINT) —
    // the cross-engine contract every portable oracle (q61-q63) rests on
    val got = Seq("the quick brown").toDF("s")
      .select(Dedup.portableHash64(col("s"), 7)).head().getLong(0)
    assert(got == 859283159904724978L)
  }

  test("portable minhash finds the same planted near-dup as the xxhash64 family") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words nothing shared here at all whatsoever ok fine"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("id", "text")
    val pairs = Dedup.minhashNearDups(df, "id", "text", threshold = 0.5, portable = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("connected components groups transitive near-dup chains") {
    // chain 1-2, 2-3 and isolated pair 7-9: clusters {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("pointer-jumping CC matches plain propagation and converges in O(log d) rounds") {
    // a 48-hop path graph: diameter 48, so plain propagation needs ~48
    // rounds — pointer jumping must label everything 0 within 10
    val chain = (0L until 48L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponentsFast(chain, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.size == 49 && fast.values.forall(_ == 0L))
    // and on a branchy multi-component graph both algorithms agree exactly
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 10L), (10L, 11L), (7L, 9L),
      (20L, 25L), (25L, 21L), (21L, 26L)).toDF("id_a", "id_b")
    val slow = Dedup.connectedComponents(pairs, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast2 = Dedup.connectedComponentsFast(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast2 == slow)
  }

  test("dropNearDuplicates keeps one canonical doc per cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val near2 = "quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different words nothing shared here at all whatsoever ok fine"
    val df = Seq((1L, base), (2L, near), (3L, near2), (4L, other)).toDF("id", "text")
    val kept = Dedup.dropNearDuplicates(df, "id", "text", threshold = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("fuzzy duplicate pairs: same email OR same name+phone, nulls excluded") {
    val df = Seq(
      (1L, "a@x.com", "ann", "111"), (2L, "a@x.com", "bob", "222"),
      (3L, "c@x.com", "bob", "222"), (4L, null, "dee", "444"),
      (5L, null, "dee", "444"), (6L, null, null, "444")).toDF("id", "email", "name", "phone")
    val got = Dedup.fuzzyDuplicatePairs(df, "id", "email", "name", "phone")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // 1-2 share email; 2-3 and 4-5 share name+phone; null email/name never match
    assert(got == Set((1L, 2L, "email"), (2L, 3L, "name_phone"), (4L, 5L, "name_phone")))
  }

  test("fuzzyDuplicatePairs maxBlockSize drops exactly the oversized blocks") {
    // hot@ forms a 4-member email block (6 pairs); name+phone blocks stay
    // size 2. Cap 3 must erase the hot block's pairs and NOTHING else —
    // the 100 TB junk-key valve (one shared email must not go quadratic).
    val df = Seq(
      (1L, "hot@x.com", "a", "1"), (2L, "hot@x.com", "b", "2"),
      (3L, "hot@x.com", "c", "3"), (4L, "hot@x.com", "d", "4"),
      (5L, "e@x.com", "z", "9"), (6L, "e@x.com", "z", "9"))
      .toDF("id", "email", "name", "phone")
    val capped = Dedup.fuzzyDuplicatePairs(df, "id", "email", "name",
        "phone", maxBlockSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(capped == Set((5L, 6L, "email"), (5L, 6L, "name_phone")))
    // default cap = keep everything: the gated fixture behavior
    val all = Dedup.fuzzyDuplicatePairs(df, "id", "email", "name", "phone")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(all.count(_._3 == "email") == 7 && all((5L, 6L, "name_phone")))
  }

  test("fuzzyDuplicatePairsAuto: 10x-p99 policy keeps honest blocks, drops the hot key") {
    // 150 honest 2-member email blocks (p99 = 2 -> cap = 20) plus one
    // 30-member junk email: the policy must erase the hot block's
    // C(30,2) pairs and keep every honest pair — hot-key survival of
    // the production default, unsupervised (no explicit cap passed)
    val honest = (0 until 150).flatMap(b => Seq(
      (b * 2L, s"e$b@x.com", s"n${b * 2}", s"p${b * 2}"),
      (b * 2L + 1, s"e$b@x.com", s"n${b * 2 + 1}", s"p${b * 2 + 1}")))
    val hot = (1000L until 1030L).map(i => (i, "hot@x.com", s"n$i", s"p$i"))
    val df = (honest ++ hot).toDF("id", "email", "name", "phone")
    assert(Dedup.autoBlockCap(df, Seq("email")) == 20)
    val got = Dedup.fuzzyDuplicatePairsAuto(df, "id", "email", "name", "phone")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = (0 until 150).map(b => (b * 2L, b * 2L + 1, "email")).toSet
    assert(got == want)

    // uniform block profile (the gated fixtures' shape): p99 = max, the
    // cap is 10x the largest block and provably never binds — the auto
    // entry point equals the uncapped contract exactly
    val uniform = (0L until 120L).map(i =>
      (i, s"u${i % 30}@x.com", s"n${i % 12}", s"p${i % 12}"))
      .toDF("id", "email", "name", "phone")
    assert(Dedup.autoBlockCap(uniform, Seq("email")) == 40)
    val auto = Dedup.fuzzyDuplicatePairsAuto(
        uniform, "id", "email", "name", "phone")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val uncapped = Dedup.fuzzyDuplicatePairs(
        uniform, "id", "email", "name", "phone")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(auto == uncapped && auto.nonEmpty)
  }

  test("autoBlockCap: with <100 blocks the p99 IS the max (documented caveat)") {
    // 10 blocks of 4: r = ceil(0.99*10) = 10 -> p99 = max -> cap = 40,
    // i.e. the policy cannot bind at small key cardinality — callers
    // there pass an explicit maxBlockSize (ADVICE r11, scaladoc'd)
    val few = (0L until 40L).map(i => (i, s"e${i % 10}@x.com", s"n$i", s"p$i"))
      .toDF("id", "email", "name", "phone")
    assert(Dedup.autoBlockCap(few, Seq("email")) == 40)
  }

  test("lastN keeps the most recent n events per key") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (2L, ts(1))).toDF("k", "ts")
    val got = Sessionize.lastN(df, "k", "ts", 2)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(got == Set((1L, ts(2)), (1L, ts(3)), (2L, ts(1))))
  }

  test("detectFiles probes directories in order with fallback") {
    val found = graft.etl.Ingest.detectFiles(spark,
      Seq("/nonexistent-dir", "/root/reference/input_data"),
      Seq("students_enrollment.csv", "missing.csv"))
    assert(found == Map("students_enrollment.csv" ->
      "/root/reference/input_data/students_enrollment.csv"))
  }

  test("simhash near-dups bounded by hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappb"
    val other = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("id", "text")
    val pairs = Dedup.simhashNearDups(df, "id", "text", maxDist = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)) && !pairs.contains((1L, 3L)))
  }

  test("containment is asymmetric: quote scores 1.0 in the quoted, not back") {
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val quote = "gamma delta epsilon zeta"    // contiguous slice of page
    val other = "one two three four five six"
    val df = Seq((1L, page), (2L, quote), (3L, other)).toDF("id", "text")
    val got = Dedup.containmentPairs(df, "id", "text", k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // quote's shingles ⊂ page's -> (2 in 1) = 1.0; reverse direction is
    // 2/8 = 0.25 and must NOT appear; `other` matches nothing
    assert(got == Set((2L, 1L, 1.0)))
  }

  test("vocab build + encode: rank order, OOV zero, position fidelity") {
    val docs = Seq((1L, "b a b c"), (2L, "a a zz")).toDF("id", "text")
    val vocab = TextOps.buildVocab(docs, "text", size = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // freq: a=3, b=2, c=1, zz=1 -> top-3 = a(1), b(2), c(3) (tie c<zz)
    assert(vocab.toSeq == Seq(("a", 1, 3L), ("b", 2, 2L), ("c", 3, 1L)))
    val enc = TextOps.encodeTokens(docs, "id", "text",
        TextOps.buildVocab(docs, "text", size = 3))
      .orderBy("id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(enc.toSeq == Seq(
      (1L, 1, 2), (1L, 2, 1), (1L, 3, 2), (1L, 4, 3),
      (2L, 1, 1), (2L, 2, 1), (2L, 3, 0)))   // zz is OOV -> 0
  }

  test("encodeTokensPacked: array order == exploded encoder, round trip lossless") {
    val docs = Seq((1L, "b a b c"), (2L, "a a zz"), (3L, "")).toDF("id", "text")
    val vocab = TextOps.buildVocab(docs, "text", size = 3)
    val packed = TextOps.encodeTokensPacked(docs, "id", "text", vocab)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getInt(2)))
    // position order restored regardless of agg arrival order; OOV -> 0
    assert(packed.toSeq == Seq(
      (1L, Seq(2, 1, 2, 3), 4), (2L, Seq(1, 1, 0), 3)))
    // the empty doc has no token rows — absent from the packed frame (the
    // exploded encoder drops it the same way), so the twins agree
    val exploded = TextOps.encodeTokens(docs, "id", "text", vocab)
      .orderBy("id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    assert(exploded.map(_._1).distinct.toSeq == packed.map(_._1).toSeq)
    assert(exploded.map(_._2).toSeq == packed.flatMap(_._2).toSeq)
  }

  test("unigramLogProb: hand-computed scores, rare-token docs score lower") {
    // corpus: a x3, b x2, c x1 -> N = 6
    val docs = Seq((1L, "a a b"), (2L, "b c a")).toDF("id", "text")
    val got = TextOps.unigramLogProb(docs, "id", "text", minLogProb = -1.0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    def term(tf: Long, freq: Long) =
      BigDecimal(tf * math.log(freq / 6.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)
    // raw double division — the mean is not rounded (see bigram test)
    def mean(ts: Seq[BigDecimal], n: Long) = ts.sum.toDouble / n
    val d1 = mean(Seq(term(2, 3), term(1, 2)), 3)   // a a b
    val d2 = mean(Seq(term(1, 2), term(1, 1), term(1, 3)), 3) // b c a
    assert(got.toSeq == Seq((1L, 3L, d1, d1 >= -1.0), (2L, 3L, d2, d2 >= -1.0)))
    // doc 2 carries the rare token c -> strictly less typical
    assert(d2 < d1)
  }

  test("bigramLogProb: hand-computed interpolated scores; token soup scores lower than fluent repeats") {
    // corpus tokens: doc1 = a b a b, doc2 = a a -> N = 6, c(a) = 4, c(b) = 2
    // bigrams: doc1 (a,b)x2 (b,a)x1; doc2 (a,a)x1
    val docs = Seq((1L, "a b a b"), (2L, "a a")).toDF("id", "text")
    val got = TextOps.bigramLogProb(docs, "id", "text", lambda = 0.75,
        minLogProb = -1.0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    def p(c2: Long, c1: Long, cw2: Long) =
      0.75 * (c2.toDouble / c1) + 0.25 * (cw2.toDouble / 6.0)
    def term(tf: Long, prob: Double) =
      BigDecimal(tf * math.log(prob)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // the mean is the RAW double division of the DECIMAL term sum — no
    // trailing round (it diverges cross-engine at shortest-repr ties)
    def mean(ts: Seq[BigDecimal], n: Long) = ts.sum.toDouble / n
    val d1 = mean(Seq(term(2, p(2, 4, 2)), term(1, p(1, 2, 4))), 3)
    val d2 = mean(Seq(term(1, p(1, 4, 4))), 1)
    assert(got.toSeq == Seq((1L, 3L, d1, d1 >= -1.0), (2L, 1L, d2, d2 >= -1.0)))
    // one-token docs have no bigrams and are absent (unigram filter's job)
    val single = Seq((9L, "a")).toDF("id", "text")
    assert(TextOps.bigramLogProb(single, "id", "text").count() == 0)
  }

  test("minhashJaccardEstimate: identical docs estimate 1.0; estimates track exact Jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // == 1
      (3L, "the quick brown fox jumps over the lazy cat tonight"), // near 1
      (4L, "entirely different words in this document body here")) // far
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val est = Dedup.minhashJaccardEstimate(docs, pairs, "doc_id", "text",
        numHashes = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) == 1.0)               // identical signatures
    assert(est((1L, 4L)) <= 0.25)              // disjoint shingles, ~0
    assert(est((1L, 3L)) > est((1L, 4L)))      // ordering preserved
  }

  test("sourceOverlapMatrix: unordered pair counting, diagonal = within-source") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 1L, 0.8), (1L, 3L, 0.7), (3L, 4L, 0.6))
      .toDF("id_a", "id_b", "jaccard_sim")
    val docs = Seq((1L, "wiki"), (2L, "crawl"), (3L, "wiki"), (4L, "wiki"))
      .toDF("doc_id", "source")
    val got = Dedup.sourceOverlapMatrix(pairs, docs, "doc_id", "source")
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("crawl", "wiki", 2L, 0.8, 0.9),   // (1,2) and (2,1) both land here
      ("wiki", "wiki", 2L, 0.6, 0.7)))   // within-source duplication
  }

  test("nearDupThresholdSweep: hand-computed stats per threshold, one CC pass") {
    // 0.5: edges {1-2, 2-3, 4-5} -> 5 docs, 2 clusters, 3 dropped
    // 0.7: edges {1-2, 2-3}      -> 3 docs, 1 cluster,  2 dropped
    // 0.8: edge  {1-2}           -> 2 docs, 1 cluster,  1 dropped
    // 0.95: no edges             -> all zero
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.7), (4L, 5L, 0.55))
      .toDF("id_a", "id_b", "jaccard_sim")
    val got = Dedup.nearDupThresholdSweep(pairs, Seq(0.5, 0.7, 0.8, 0.95))
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0.5, 3L, 5L, 2L, 3L),
      (0.7, 2L, 3L, 1L, 2L),
      (0.8, 1L, 2L, 1L, 1L),
      (0.95, 0L, 0L, 0L, 0L)))
  }

  test("shingleNovelty: re-crawled content charges to its first owner") {
    // doc 1 (wiki) owns every shingle of "a b c d e"; doc 2 (crawl) is a
    // verbatim copy -> crawl novelty 0; doc 3 (crawl) is fresh -> novel.
    val docs = Seq(
      (1L, "wiki", "a b c d e"),
      (2L, "crawl", "a b c d e"),
      (3L, "crawl", "x y z w"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.shingleNovelty(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // "a b c d e" -> 3 shingles; "x y z w" -> 2 shingles
    assert(got.toSeq == Seq(
      ("crawl", 5L, 2L, 0.4),   // 3 copied + 2 fresh
      ("wiki", 3L, 3L, 1.0)))   // first owner keeps full credit
  }

  test("dropDuplicateSpans: keep-first across docs, empty-doc row kept") {
    val docs = Seq(
      (1L, Seq("header", "body one")),
      (2L, Seq("header", "body two")),
      (3L, Seq("header")),           // loses everything
      (4L, Seq("body one", "tail"))) // "body one" already seen in doc 1
      .toDF("id", "spans")
    val got = Dedup.dropDuplicateSpans(docs, "id", col("spans"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, "header body one"),
      (2L, 2L, 1L, "body two"),
      (3L, 1L, 0L, ""),      // row survives with empty text, not dropped
      (4L, 2L, 1L, "tail")))
  }

  test("dropSpansAgainstExisting: corpus spans never re-enter, batch keep-firsts") {
    val existing = Seq((1L, Seq("header", "old body"))).toDF("id", "spans")
    val incoming = Seq(
      (10L, Seq("header", "new a")),           // header known to the corpus
      (11L, Seq("new a", "new b")),            // "new a" seen earlier in batch
      (12L, Seq("old body")))                  // fully known -> empty
      .toDF("id", "spans")
    val got = Dedup.dropSpansAgainstExisting(incoming, existing, "id",
        col("spans"), col("spans"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (10L, 2L, 1L, "new a"),
      (11L, 2L, 1L, "new b"),
      (12L, 1L, 0L, "")))
  }

  test("corpusDiff classifies added/removed/changed/unchanged exactly") {
    val prev = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
    val next = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "text")
    val got = Dedup.corpusDiff(prev, next, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  test("incremental dedup drops only digests already in the existing corpus") {
    val existing = Seq((1L, "aaa"), (2L, "bbb")).toDF("id", "text")
    val incoming = Seq((10L, "aaa"), (11L, "ccc"), (12L, "bbb"), (13L, "ddd"))
      .toDF("id", "text")
    val kept = Dedup.dropAgainstExisting(incoming, existing, "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
    // idempotent: once survivors are ingested, a re-run drops everything
    val merged = existing.unionByName(incoming.filter(col("id").isin(11L, 13L)))
    assert(Dedup.dropAgainstExisting(incoming, merged, "text").count() == 0)
  }

  test("incremental near-dedup pairs incoming rows with similar existing rows only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words nothing shared here at all whatsoever ok fine"
    val existing = Seq((1L, base), (2L, other)).toDF("id", "text")
    val incoming = Seq((10L, near), (11L, "unrelated fresh content entirely new")).toDF("id", "text")
    val got = Dedup.minhashNearDupsAgainst(incoming, existing, "id", "text",
        threshold = 0.5)
      .select("incoming_id", "existing_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 1L)))
  }

  test("simhash: zero-token docs get signature 0 (pair at hamming 0)") {
    // explode_outer emits a null token for empty docs and xxhash64(null)
    // returns the seed, not null — the bulk path must still yield sig 0
    val df = Seq((1L, ""), (2L, "   "), (3L, "real content with many words here"))
      .toDF("id", "text")
    val got = Dedup.simhashNearDups(df, "id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue()))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  test("simhash: maxDist=7 candidate set contains the maxDist=3 set") {
    val docs = (0L until 8L).map(i =>
      (i, s"shared prefix tokens across docs number $i plus tail ${i % 3}"))
    val df = docs.toDF("id", "text")
    def pairSet(d: Int) = Dedup.simhashNearDups(df, "id", "text", maxDist = d)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue()))
    val tight = pairSet(3)
    val wide = pairSet(7)
    assert(tight.forall(_._3 <= 3) && wide.forall(_._3 <= 7))
    assert(tight.map(p => (p._1, p._2)).toSet.subsetOf(wide.map(p => (p._1, p._2)).toSet))
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq((1, "a", 1), (2, "b", 1)).toDF("k", "v", "ord")

  test("merge: batch wins on conflict, new keys inserted, others kept") {
    val batch = Seq((2, "B", 2), (3, "c", 2)).toDF("k", "v", "ord")
    val got = Upsert.upsert(existing, batch, Seq("k"), "ord")
      .orderBy("k").select("k", "v").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("last-write-wins dedup inside the batch") {
    val batch = Seq((9, "first", 1), (9, "second", 2)).toDF("k", "v", "ord")
    val got = Upsert.dedupLastWins(batch, Seq("k"), "ord").select("v").head().getString(0)
    assert(got == "second")
  }

  test("upsert is idempotent") {
    val batch = Seq((2, "B", 2), (3, "c", 2)).toDF("k", "v", "ord")
    val once = Upsert.upsert(existing, batch, Seq("k"), "ord")
    val twice = Upsert.upsert(once, batch, Seq("k"), "ord")
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("upsertParquet physical roundtrip + crash-safe swap leaves table live") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val path = s"$dir/tbl"
    Upsert.upsertParquet(path, existing, Seq("k"), "ord")
    Upsert.upsertParquet(path, Seq((2, "B", 2), (3, "c", 2)).toDF("k", "v", "ord"), Seq("k"), "ord")
    val got = spark.read.parquet(path).orderBy("k")
      .select("k", "v").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, "B"), (3, "c")))
  }
}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("trainBpe: the classic subword-nmt example, hand-computed merges") {
    // word freqs: low x5, lower x2, newest x6, widest x3.
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 -> tie breaks left-asc: (e,s);
    // then (es,t)=9, (est,</w>)=9; then (l,o)=(o,w)=7 -> (l,o); (lo,w)=7.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val merges = TextOps.trainBpe(Seq(text).toDF("text"), "text", numMerges = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)))
    // determinism: a re-run over the same corpus yields the same table
    val again = TextOps.trainBpe(Seq(text).toDF("text"), "text", numMerges = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq == merges.toSeq)
    // merge exhaustion: asking for more merges than exist stops cleanly
    val tiny = TextOps.trainBpe(Seq("ab ab").toDF("text"), "text", numMerges = 50)
    assert(tiny.count() == 2) // (a,b) then (ab,</w>) — nothing left after
  }

  test("bpeSegments: ordered merges apply with symbol-boundary safety") {
    val merges = Seq("e" -> "s", "es" -> "t", "est" -> "</w>",
      "l" -> "o", "lo" -> "w")
    val got = Seq("lowest widest")
      .toDF("text")
      .select(TextOps.bpeSegments(col("text"), merges).as("sw"))
      .head().getSeq[String](0)
    // lowest: es -> est -> est</w> -> lo -> low => [low, est</w>]
    // widest: w i d est</w> (no (l,o)/(lo,w) sites)
    assert(got == Seq("low", "est</w>", "w", "i", "d", "est</w>"))
    // boundary safety: a (b,c) merge must NOT fire inside symbol "ab"+"c"
    val tricky = Seq("abc").toDF("text")
      .select(TextOps.bpeSegments(col("text"), Seq("a" -> "b", "b" -> "c")).as("sw"))
      .head().getSeq[String](0)
    // (a,b) fires first -> symbols [ab, c, </w>]; (b,c) has no site left
    assert(tricky == Seq("ab", "c", "</w>"))
  }

  test("gopher rules: each planted fixture fails exactly its one rule") {
    val docs = Queries.gopherPlanted.toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs, "doc_id", "text", minWords = 50)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ruleCols = Seq("rule_word_count", "rule_mean_len", "rule_symbol",
      "rule_alpha", "rule_stopwords", "rule_bullet", "rule_ellipsis")
    def failing(id: Long): Seq[String] =
      ruleCols.filter(c => !got(id).getAs[Boolean](c))
    assert(failing(9000001L).isEmpty && got(9000001L).getAs[Boolean]("keep"))
    assert(failing(9000002L) == Seq("rule_bullet"))
    assert(failing(9000003L) == Seq("rule_symbol"))
    assert(failing(9000004L) == Seq("rule_ellipsis"))
    assert(failing(9000005L) == Seq("rule_alpha"))
    assert(failing(9000006L) == Seq("rule_mean_len"))
    assert((2L to 6L).forall(i => !got(9000000L + i).getAs[Boolean]("keep")))
  }

  test("gopher rules: short and empty docs fail word count with zeroed ratios") {
    val docs = Seq((1L, "tiny doc"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got(1L).getAs[Boolean]("rule_word_count"))
    assert(!got(2L).getAs[Boolean]("rule_word_count"))
    assert(got(2L).getAs[Double]("mean_word_len") == 0.0)
    assert(got(2L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(!got(2L).getAs[Boolean]("keep"))
  }

  test("line corrections: each planted fixture drops exactly its one line") {
    val docs = Queries.linePlanted.toDF("doc_id", "text")
    val got = TextOps.lineCorrections(docs, "doc_id", "text", maxDropRatio = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(9100001L).getAs[Int]("n_dropped") == 0 &&
      got(9100001L).getAs[Boolean]("keep_doc"))
    for (id <- Seq(9100002L, 9100003L, 9100004L, 9100005L)) {
      assert(got(id).getAs[Int]("n_dropped") == 1, s"doc $id")
      assert(got(id).getAs[String]("text_clean") ==
        "a fine first line of words\nanother fine line of words", s"doc $id")
    }
    // boilerplate-heavy doc: header/counter/menu lines dropped; "© 2024"
    // survives (© is outside the ASCII punct class, so the numeric-only
    // rule doesn't fire — the rules are deliberately ASCII-scoped); the
    // document gate still fires at 3/5
    assert(got(9100006L).getAs[Int]("n_dropped") == 3)
    assert(!got(9100006L).getAs[Boolean]("keep_doc"))
  }

  test("strip markup: blocks/tags/entities per planted fixture") {
    val docs = Queries.htmlPlanted.toDF("doc_id", "text")
    val got = TextOps.stripMarkupDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(9200001L) == "Page Title Main Heading First paragraph.")
    assert(got(9200002L) ==
      "Plain text with inside and bold plus a self-closing break here")
    assert(got(9200003L) ==
      "Entities: fish & chips, 1 < 2, 3 > 1, \"quoted\", it's non breaking")
    // &amp;lt; decodes ONCE (to the literal entity), never into a tag
    assert(got(9200004L) == "Pre-escaped: the entity &lt; stays literal text")
    // an unmatched < with no later > is untouched (not an HTML parser)
    assert(got(9200005L) ==
      "Math like 1 < 2 with no closing bracket stays untouched")
  }

  test("NB classifier: recovers separable labels; empty doc falls to prior") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog ran to the park", "en"),
      (3L, "el gato grande come pescado", "es"),
      (4L, "el perro corre al parque", "es"),
      (5L, "the quick cat and the dog", "en"),
      (6L, "", "es")).toDF("doc_id", "text", "lang")
    val got = Classify.nbSelfClassify(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 1L to 5L)
      assert(got(id).getAs[Boolean]("correct"), s"doc $id")
    // the empty doc scores priors only: 3 en docs vs 3 es docs is a
    // dead tie, so the deterministic label-asc tie-break picks "en"
    assert(got(6L).getAs[String]("pred_label") == "en")
    // two-frame form: score a fresh doc against the trained corpus
    val fresh = Seq((10L, "the cat and the dog sat")).toDF("doc_id", "text")
    val pred = Classify.nbClassify(docs, fresh, "doc_id", "text", "lang")
      .collect().head
    assert(pred.getString(1) == "en")
  }

  test("url audit: host/domain/tld per parse case, subdomain blocklisting") {
    val got = UrlOps.urlAudit(Queries.urlPlanted.toDF("doc_id", "url"),
        "doc_id", "url", Queries.urlBlocklist)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getString(4), r.getBoolean(5)))
      .toMap
    assert(got(9300001L) == ("www.example.com", "example.com", "com", false))
    // two-level public suffix: registrable is shop.co.uk, not co.uk
    assert(got(9300002L) == ("sub.shop.co.uk", "shop.co.uk", "uk", false))
    assert(got(9300003L) == ("example.org", "example.org", "org", false))
    // userinfo + port stripped; blocked through the subdomain
    assert(got(9300004L) == ("secure.badsite.com", "badsite.com", "com", true))
    // trailing root dot stripped
    assert(got(9300005L) == ("files.example.net", "example.net", "net", false))
    assert(got(9300006L) == ("tracker.net", "tracker.net", "net", true))
    // bare IP: last-two-labels heuristic applies, documented behavior
    assert(got(9300007L) == ("192.168.0.1", "0.1", "1", false))
    // filter form drops exactly the blocked rows
    assert(UrlOps.filterBlocked(Queries.urlPlanted.toDF("doc_id", "url"),
      "url", Queries.urlBlocklist).count() == 5)
  }

  test("bpe fertility: merged-vocab group segments shorter than unmerged") {
    // the q119 merges compress "lowest"-family English ("low" -> lo+w,
    // "est</w>" fully merged); the xx group's words shatter to chars
    val docs = Seq(
      (1L, "lowest lowest low", "en"),
      (2L, "zq zq zq", "xx")).toDF("doc_id", "text", "lang")
    val got = TextOps.bpeFertility(docs, "lang", "text", Queries.q119Merges)
      .collect().map(r => r.getString(0) -> r).toMap
    // "lowest" -> [low, est</w>] (2), "low" -> [low, </w>] (2)
    assert(got("en").getAs[Long]("n_words") == 3)
    assert(got("en").getAs[Long]("n_subwords") == 6)
    assert(got("en").getAs[Double]("fertility") == 2.0)
    // "zq" -> [z, q, </w>] (3 per word): no merge applies
    assert(got("xx").getAs[Long]("n_subwords") == 9)
    assert(got("xx").getAs[Long]("n_chars") == 6)
    // chars/subword lower for the unserved group (words shatter)
    assert(got("xx").getAs[Double]("chars_per_subword") <
      got("en").getAs[Double]("chars_per_subword"))
  }

  test("KL drift: a divergent source scores far above in-distribution ones") {
    // a and b share the corpus-typical distribution; z is pure spam.
    // Enough tokens per source that real counts dominate the +1-per-
    // bucket smoothing mass (the add-one floor is the baseline everyone
    // pays; drift must clear it)
    val docs = (
      (1 to 200).map(_ => ("the quick brown fox jumps over the dog", "a")) ++
      (1 to 200).map(_ => ("the lazy dog sleeps under the quick fox", "b")) ++
      (1 to 200).map(_ => ("buy buy buy cheap cheap pills now", "z")))
      .toDF("text", "source")
    val got = TextOps.klDrift(docs, "source", "text", numBuckets = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a and b also diverge from the three-way MIXTURE (z's spam mass is
    // in the corpus distribution), so the in-distribution baseline is
    // nonzero; the spam source must still clear it by a wide margin
    assert(got("z") > 1.5 * math.max(got("a"), got("b")),
      s"spam source not flagged: $got")
    // n_tokens is the per-source token total
    val n = TextOps.klDrift(docs, "source", "text", numBuckets = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("a") == 1600 && n("z") == 1400)
  }

  test("encoding scrub: mojibake repaired, control bytes counted out") {
    val got = TextOps.fixEncoding(
        Queries.encodingPlanted.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getBoolean(3)))
      .toMap
    assert(got(9400001L) == ("perfectly clean prose here", 0, false))
    assert(got(9400002L) == ("bell and noisehere", 3, false))
    assert(got(9400003L) ==
      ("it's a test — with élan", 0, true))
    assert(got(9400004L) ==
      ("say \"quoted\" with space and lone mark", 1, true))
  }

  test("session sequences: ordered tokens per gap-bounded session") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, at(0), 7L, "view"), (2L, at(5), 7L, "click"),
      (3L, at(10), 7L, "purchase"),
      (4L, at(60), 7L, "view"),                  // new session (50-min gap)
      (5L, at(0), 8L, "error")).toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessionize.sessionSequences(events, "user_id", "ts",
        "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got((7L, 1L)) == ((3L, "view click purchase", 600L)))
    assert(got((7L, 2L)) == ((1L, "view", 0L)))
    assert(got((8L, 1L)) == ((1L, "error", 0L)))
  }

  test("perplexity buckets: thirds by LM score, common-token docs in head") {
    // docs of corpus-frequent tokens score high; rare-token docs low
    val docs = ((1 to 6).map(i => (i.toLong, "the cat sat on the mat")) ++
      (7 to 12).map(i => (i.toLong, "the cat sat on a rug quietly")) ++
      (13 to 18).map(i => (i.toLong, s"xylophone$i quartz$i vortex$i")))
      .toDF("doc_id", "text")
    val got = TextOps.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert((1 to 6).forall(i => got(i.toLong) == "head"))
    assert((7 to 12).forall(i => got(i.toLong) == "middle"))
    assert((13 to 18).forall(i => got(i.toLong) == "tail"))
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("Hello,  world! abc123 done").toDF("t")
    assert(df.select(TextOps.tokenCount(col("t"))).head().getInt(0) == 4)
    // Hello , world ! abc 123 done -> 7
    assert(df.select(TextOps.bpeishTokenCount(col("t"))).head().getInt(0) == 7)
  }

  test("quality score penalizes short/punct-heavy/implausible text") {
    val good = "the cat sat on the mat and then the dog came in too"
    val short = "tiny text"
    val df = Seq((good, short)).toDF("g", "s")
    assert(df.select(TextOps.qualityScore(col("g"))).head().getInt(0) == 100)
    assert(df.select(TextOps.qualityScore(col("s"))).head().getInt(0) <= 50)
  }

  test("langId picks marker-word argmax; und on zero hits") {
    val df = Seq(("the cat is of the house and it is big"),
      ("el la de que los amigos"), ("qwerty zzz")).toDF("t")
    val got = df.select(TextOps.langId(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "und"))
  }

  test("chunking: overlapping windows, clamped tail, single chunk for short docs") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(doc, "short doc").toDF("t")
    val got = df.select(TextOps.chunks(col("t"), 4, 2)).collect()
    // 10 tokens, size 4, step 2 -> 1 + ceil(6/2) = 4 chunks
    val c = got(0).getSeq[String](0)
    assert(c.length == 4)
    assert(c.head == "t1 t2 t3 t4" && c(1) == "t3 t4 t5 t6" && c.last == "t7 t8 t9 t10")
    assert(got(1).getSeq[String](0) == Seq("short doc"))
  }

  test("PII redaction replaces emails and long digit runs") {
    val df = Seq("mail me at a.b@x.co.in or call 9876543210 ok 123").toDF("t")
    assert(df.select(TextOps.redactPii(col("t"))).head().getString(0) ==
      "mail me at <EMAIL> or call <PHONE> ok 123")
  }

  test("fingerprint matches the hand-computed rolling hash") {
    // tokens "ab" (97*31+2=3009) then "c" (99*31+1=3070):
    // ((0*131+3009)%p)*131+3070 = 397249
    val df = Seq("ab c").toDF("t")
    assert(df.select(TextOps.fingerprint(col("t"))).head().getLong(0) == 397249L)
  }
}

class KnnSpec extends SparkSpec {
  import spark.implicits._

  test("cosine similarity of known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(2.0f, 0.0f)))
      .toDF("x", "y", "z")
    assert(df.select(Knn.cosine(col("x"), col("y"))).head().getDouble(0) == 0.0)
    assert(df.select(Knn.cosine(col("x"), col("z"))).head().getDouble(0) == 1.0)
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Knn.bruteForceTopK(df, df.filter(col("vec_id") === 1), k = 2)
      .orderBy("rank").select("neighbor_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("negative samples exclude self and near-neighbors, deterministic") {
    // anchor 1 points +x; 2 is a near-dup (cos ~0.994), 3..6 orthogonal/far
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f)),
      (5L, Seq(0.0f, -1.0f)), (6L, Seq(-0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val anchors = df.filter(col("vec_id") === 1)
    def run() = Knn.negativeSamples(df, anchors, k = 3, maxSim = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val got = run()
    // the near-dup (2) and self (1) never appear; ranks are contiguous
    assert(!got.map(_._2).contains(2L) && !got.map(_._2).contains(1L))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    assert(got.forall(_._3 < 0.5))
    // hash selection: a second run returns the identical sample
    assert(run().toSeq == got.toSeq)
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._
  private val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("asOf picks the latest version at-or-before each event, null before first") {
    val events = Seq((1, ts("2024-01-05"), "e1"), (1, ts("2024-01-10"), "e2"),
      (1, ts("2024-01-01"), "e0"), (2, ts("2024-01-05"), "e3"))
      .toDF("k", "ts", "name")
    val versions = Seq((1, ts("2024-01-03"), "v1"), (1, ts("2024-01-10"), "v2"),
      (2, ts("2024-01-06"), "v9"))
      .toDF("k", "vts", "ver")
    val got = graft.operators.AsOfJoin.asOf(events, versions, "k", "ts", "vts", Seq("ver"))
      .orderBy("name").collect().map(r => r.getAs[String]("name") -> r.getAs[String]("ver"))
    // e0 before any version -> null; e2 at exactly v2's ts -> v2 (inclusive)
    assert(got.toSeq == Seq("e0" -> null, "e1" -> "v1", "e2" -> "v2", "e3" -> null))
  }

  test("asOfNearest picks the closer side, ties to the earlier, nulls without right rows") {
    val events = Seq((1L, 100L, "e1"), (1L, 205L, "e2"), (1L, 300L, "e3"),
      (1L, 10L, "e0"), (2L, 50L, "e4"))
      .toDF("k", "ts", "name")
    val refs = Seq((1L, 90L, "r90"), (1L, 200L, "r200"), (1L, 210L, "r210"))
      .toDF("k", "rts", "ref")
    val got = graft.operators.AsOfJoin.asOfNearest(events, refs, "k",
        "ts", "rts", Seq("ref"))
      .orderBy("name").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("ref"),
        Option(r.getAs[java.lang.Long]("matched_ts")).map(_.toLong)))
    assert(got.toSeq == Seq(
      ("e0", "r90", Some(90L)),   // only forward exists -> forward
      ("e1", "r90", Some(90L)),   // 10 back vs 100 fwd -> backward
      ("e2", "r200", Some(200L)), // exact tie (5 vs 5) -> earlier
      ("e3", "r210", Some(210L)), // only backward exists -> backward
      ("e4", null, None)))        // key 2 has no refs
  }

  test("duplicate (key, ts) right rows resolve deterministically: max payload backward, min forward") {
    // without the struct tiebreaker the carried payload was
    // shuffle-order-dependent (r9 ADVICE); pin the contract on both ops
    val events = Seq((1L, 100L, "eb"), (1L, 300L, "ef")).toDF("k", "ts", "name")
    val refs = Seq((1L, 90L, "rA"), (1L, 90L, "rZ"),
      (1L, 310L, "sB"), (1L, 310L, "sY")).toDF("k", "rts", "ref")
    (1 to 3).foreach { _ =>
      val near = graft.operators.AsOfJoin.asOfNearest(
          events, refs.repartition(7), "k", "ts", "rts", Seq("ref"))
        .orderBy("name").collect().map(_.getAs[String]("ref"))
      assert(near.toSeq == Seq("rZ", "sB")) // backward max, forward min
      val backOnly = graft.operators.AsOfJoin.asOf(
          events, refs.repartition(5), "k", "ts", "rts", Seq("ref"))
        .orderBy("name").collect().map(_.getAs[String]("ref"))
      assert(backOnly.toSeq == Seq("rZ", "rZ")) // latest-at-or-before, max on tie
    }
  }

  test("scd2 builds half-open validity intervals with a current flag") {
    val changes = Seq((1, ts("2024-01-01"), "a"), (1, ts("2024-02-01"), "b"))
      .toDF("k", "cts", "v")
    val got = graft.operators.AsOfJoin.scd2(changes, "k", "cts")
      .orderBy("valid_from").collect()
    assert(got(0).getAs[java.sql.Timestamp]("valid_to") == ts("2024-02-01"))
    assert(!got(0).getAs[Boolean]("is_current"))
    assert(got(1).getAs[java.sql.Timestamp]("valid_to") == null)
    assert(got(1).getAs[Boolean]("is_current"))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap-based sessions split on >30min inactivity") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq((1L, ts(0), 1.0), (1L, ts(10), 1.0), (1L, ts(55), 1.0), (2L, ts(0), 1.0))
      .toDF("user_id", "ts", "value")
    val got = Sessionize.sessionSummary(df, "user_id", "ts", "value", 30)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("rollingDaily: 3-day RANGE window skips gap days, exact value sums") {
    val t = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // user 1: days 1, 2, 5 — day 5's window must NOT see days 1-2 (RANGE,
    // not ROWS: the gap matters)
    val df = Seq((1L, t(1), 10.0), (1L, t(1), 2.5), (1L, t(2), 1.0),
        (1L, t(5), 4.0), (2L, t(3), 7.0))
      .toDF("user_id", "ts", "value")
    val got = Sessionize.rollingDaily(df, "user_id", "ts", "value", days = 3)
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 2L, 12.5),
      (1L, "2024-01-02", 3L, 13.5),
      (1L, "2024-01-05", 1L, 4.0),   // ROWS -2 would wrongly include day 2
      (2L, "2024-01-03", 1L, 7.0)))
  }
}

class DateDimSpec extends SparkSpec {
  test("calendar attributes for a known date") {
    val got = DateDim.fromRange(spark,
        java.sql.Date.valueOf("2024-01-06"), java.sql.Date.valueOf("2024-01-06")).head()
    assert(got.getAs[Int]("date_key") == 20240106)
    assert(got.getAs[String]("day_name") == "Saturday")
    assert(got.getAs[Boolean]("is_weekend"))
    assert(got.getAs[Int]("quarter") == 1)
  }
}

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._
  import graft.expr.Enrichment

  test("risk score null/case semantics mirror the reference") {
    // all-null inputs: +25 (completion or 0 < 30) +15 (status '' != completed) = 40
    val df = Seq((Option.empty[Int], Option.empty[Double], Option.empty[String]),
      (Some(40), Some(10.0), Some("pending")), (Some(5), Some(90.0), Some("COMPLETED")))
      .toDF("d", "c", "p")
    val got = df.select(Enrichment.riskScore(col("d"), col("c"), col("p"))).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(40, 60, 0))
  }

  test("risk categories bucket at 25/50/75") {
    val df = Seq(80, 55, 30, 10).toDF("s")
    val got = df.select(Enrichment.riskCategory(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("Critical", "High", "Medium", "Low"))
  }
}

class EditDistanceVerifySpec extends SparkSpec {
  import spark.implicits._

  test("edit gate rejects reordered text that token-multiset similarity accepts") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta thetb"), // one char edit
      (3L, "theta eta zeta epsilon delta gamma beta alpha")) // reversed order
      .toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.editDistanceVerify(pairs, corpus, "id", "text", maxDistPct = 20)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Int]("lev"), r.getAs[Boolean]("edit_ok")))).toMap
    assert(got((1L, 2L)) == ((1, true)))
    val (lev13, ok13) = got((1L, 3L))
    // same token multiset, but order-sensitive distance is large
    assert(lev13 > 8 && !ok13)
  }
}

class NgramTrimSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "one two three four five six seven eight"

  test("cross-doc repeated window trimmed everywhere but the first occurrence") {
    val docs = Seq(
      (1L, s"unique opening here $boiler"),
      (2L, s"different start words $boiler"),
      (3L, "totally unrelated text with no repeats at all today")).toDF("id", "text")
    val got = Dedup.trimRepeatedNgrams(docs, "id", "text", n = 8)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_masked"),
          r.getAs[String]("text_trimmed")))).toMap
    assert(got(1L) == ((11, 0, s"unique opening here $boiler"))) // keeper intact
    assert(got(2L) == ((11, 8, "different start words")))
    assert(got(3L)._2 == 0)
  }

  test("intra-doc doubled phrase keeps only the first copy") {
    val docs = Seq((7L, s"$boiler $boiler")).toDF("id", "text")
    val got = Dedup.trimRepeatedNgrams(docs, "id", "text", n = 8).head()
    assert(got.getAs[Int]("n_tokens") == 16)
    assert(got.getAs[Int]("n_masked") == 8)
    assert(got.getAs[String]("text_trimmed") == boiler)
  }

  test("docs shorter than the window pass through with normalized whitespace") {
    val docs = Seq((1L, "just  a   few tokens")).toDF("id", "text")
    val got = Dedup.trimRepeatedNgrams(docs, "id", "text", n = 8).head()
    assert(got.getAs[Int]("n_masked") == 0)
    assert(got.getAs[String]("text_trimmed") == "just a few tokens")
  }
}

class PiiVocabHealthSpec extends SparkSpec {
  import spark.implicits._

  test("piiScan counters agree with redactPii (same regex constants)") {
    val df = Seq(
      ("s1", "mail me at bob@example.com or alice@test.org"),
      ("s1", "call 5551234567 today"),
      ("s2", "clean text, no pii, short digits 1234")).toDF("source", "text")
    val got = TextOps.piiScan(df, "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_emails"),
          r.getAs[Long]("n_phones"), r.getAs[Long]("n_docs_with_pii")))).toMap
    assert(got("s1") == ((2L, 2L, 1L, 2L)))
    assert(got("s2") == ((1L, 0L, 0L, 0L)))
  }

  test("vocabHealth hand-computed: types, hapax, ratios") {
    val df = Seq(("a", "The cat sat"), ("a", "the dog")).toDF("source", "text")
    val got = TextOps.vocabHealth(df, "source", "text").head()
    // lowered tokens: the(2) cat(1) sat(1) dog(1)
    assert(got.getAs[Long]("n_types") == 4L)
    assert(got.getAs[Long]("n_tokens") == 5L)
    assert(got.getAs[Long]("n_hapax") == 3L)
    assert(got.getAs[Double]("hapax_ratio") == 0.75)
    assert(got.getAs[Double]("type_token_ratio") == 0.8)
  }
}
