package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Pack, Split, TextOps}

/** Specs for the round-7 curation additions: semantic decontamination,
  * readability, chunk occupancy, boilerplate n-gram discovery, and the
  * deterministic shuffle-shard layout. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("semanticOverlaps flags exact copies at sim 1.0 and picks the min bench id on ties") {
    val rnd = new scala.util.Random(11)
    val bench = (0 until 5).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian()).toFloat))).toDF("vec_id", "embedding")
    val clean = (100 until 120).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian()).toFloat))).toDF("vec_id", "embedding")
    val copies = bench.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val out = Decontaminate.semanticOverlaps(
      clean.unionByName(copies), bench, "vec_id", "embedding", threshold = 0.99)
    val flagged = out.filter(col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == (0 until 5).map(_ + 1000L).toSet)
    // each copy's argmax is its own source benchmark row
    assert(flagged.forall { case (cid, bid) => bid == cid - 1000 })
    assert(out.count() == 25)
    // drop form removes exactly the flagged rows
    val kept = Decontaminate.dropSemanticContaminated(
      clean.unionByName(copies), bench, "vec_id", "embedding", 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (100 until 120).map(_.toLong).toSet)
  }

  test("readability: hand-computed Flesch on a known sentence, floors and empty band") {
    val docs = Seq(
      (1L, "the cat sat on the mat. it was happy!"),
      (2L, ""),
      (3L, "zzz zzz")) // vowelless words floor at 1 syllable; no sentence mark floors at 1
      .toDF("doc_id", "text")
    val r = TextOps.readability(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 9 words, 2 sentences, syllables: the=1 cat=1 sat=1 on=1 the=1
    // mat.=1 it=1 was=1 happy!=2 -> 10
    assert(r(0).getLong(1) == 9 && r(0).getLong(2) == 2 && r(0).getLong(3) == 10)
    val want = 206.835 - 1.015 * (9.0 / 2.0) - 84.6 * (10.0 / 9.0)
    assert(math.abs(r(0).getDouble(4) - math.rint(want * 1e4) / 1e4) < 1e-9)
    assert(r(1).isNullAt(4) && r(1).getString(5) == "empty")
    assert(r(2).getLong(1) == 2 && r(2).getLong(2) == 1 && r(2).getLong(3) == 2)
  }

  test("chunkOccupancy splits a straddling doc token-exactly across windows") {
    // shard A: docs of 3, 4, 5 tokens; seqLen 4 ->
    //   chunk0: doc1(3) + doc2(1 of 4)        -> 4 tokens, 1 straddle-out
    //   chunk1: doc2(3 of 4) + doc3(1 of 5)   -> 4 tokens, straddle_in=1 (doc2)
    //   chunk2: doc3(4 of 5)                  -> 4 tokens, straddle_in=1
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "d e f g", "A"), (3L, "h i j k l", "A"))
      .toDF("doc_id", "text", "src")
    val out = Pack.chunkOccupancy(docs, "doc_id", "text", "src", seqLen = 4)
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L)) // n_tokens fills every window
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 2L, 1L)) // n_docs
    assert(out.map(_.getLong(4)).toSeq == Seq(0L, 1L, 1L)) // n_straddle_in
    assert(out.map(_.getLong(5)).toSeq == Seq(3L, 3L, 4L)) // max_doc_tokens
    // total tokens across chunks == total corpus tokens
    assert(out.map(_.getLong(3)).sum == 12)
  }

  test("chunkOccupancy token totals reconcile with packSequences on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val occ = Pack.chunkOccupancy(docs, "doc_id", "text", "source", 512)
      .agg(sum("n_tokens")).head.getLong(0)
    val pack = Pack.packSequences(docs, "doc_id", "text", "source", 512)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(occ == pack)
  }

  test("boilerplateNgrams finds the planted footer with exact document frequency") {
    val docs = (0 until 60).map { i =>
      val base = s"unique text ${i} alpha${i} beta${i} gamma${i} delta${i} eps${i}"
      val t = if (i % 2 == 0) base + " please subscribe to our newsletter today" else base
      (i.toLong, t, s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val out = TextOps.boilerplateNgrams(docs, "doc_id", "text", "source",
      n = 5, minDf = 10L, topK = 10).collect()
    val top = out.filter(_.getLong(2) == 30L).map(_.getString(1)).toSet
    // every 5-gram of the 6-token footer appears in all 30 planted docs
    assert(top.contains("please subscribe to our newsletter"))
    assert(top.contains("subscribe to our newsletter today"))
    assert(out.forall(_.getLong(2) >= 10L))
    // per-doc distinct: a doc repeating its own footer counts once
    val rep = Seq((1L, "x y z x y z x y z x y z", "s")).toDF("doc_id", "text", "source")
    val repOut = TextOps.boilerplateNgrams(rep, "doc_id", "text", "source", 3, 1L, 50)
    assert(repOut.filter(col("ngram") === "x y z").head.getLong(2) == 1L)
  }

  test("shuffleShards: positions are a contiguous 0..n-1 per shard, layout deterministic") {
    val docs = (0 until 500).map(i => (i.toLong, s"src${i % 4}")).toDF("doc_id", "source")
    val s1 = Split.shuffleShards(docs, "doc_id", numShards = 7, seed = 3)
    val s2 = Split.shuffleShards(docs, "doc_id", numShards = 7, seed = 3)
    assert(s1.collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).sortBy(_._1)
      .sameElements(s2.collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).sortBy(_._1)))
    val perShard = s1.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos_in_shard").as("lo"),
        max("pos_in_shard").as("hi"))
      .collect()
    assert(perShard.length == 7)
    assert(perShard.forall(r => r.getLong(2) == 0 && r.getLong(3) == r.getLong(1) - 1))
    // a different seed moves documents
    val s3 = Split.shuffleShards(docs, "doc_id", 7, seed = 4)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m1 = s1.select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 != s3)
  }

  test("shardAudit counts reconcile with the corpus and sources interleave") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val audit = Split.shardAudit(docs, "doc_id", "source", numShards = 8, seed = 7)
    val total = audit.agg(sum("n_docs")).head.getLong(0)
    assert(total == docs.count())
    // every shard sees more than one source (hash mixing)
    assert(audit.filter(col("n_sources") <= 1).count() == 0)
  }
}
