package graft

import org.apache.spark.sql.functions._
import graft.operators.{Checkpoints, Dedup, Knn}

/** The persisted-index production shapes: LSH bucket tables
  * (Dedup.writeBucketTable / minhashNearDupsAgainstTable), span digest
  * tables, IVF save/load (Knn.ivfSave/ivfLoad), and the reliable-checkpoint
  * routing (Checkpoints.ckpt). Each table form must be value-identical to
  * its recompute-per-batch twin, and the incremental pass must never touch
  * the source corpus. */
class PersistedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val existingDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "pack my box with five dozen liquor jugs right now"),
    (3L, "how vexingly quick daft zebras jump around the park"),
    (4L, "sphinx of black quartz judge my vow they all said"))
  private val incomingDocs = Seq(
    (11L, "the quick brown fox jumps over the lazy dog tonight"),  // exact dup of 1
    (12L, "pack my box with five dozen liquor jugs right away"),   // near dup of 2
    (13L, "completely unrelated sentence about data pipelines and spark"),
    (14L, "sphinx of black quartz judge my vow they all said"))    // exact dup of 4

  test("expired bucket table probes exactly like an index rebuilt from the survivors") {
    val dir = tmp("graft-expire")
    val existing = existingDocs.toDF("doc_id", "text")
    Dedup.writeBucketTable(existing, s"$dir/idx", "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 4)
    // retire docs 1 and 4 (the exact-dup veto sources for 11 and 14)
    val survivors = existing.filter(col("doc_id") === 2L || col("doc_id") === 3L)
    Dedup.expireBucketTable(spark, s"$dir/idx", survivors, "doc_id")
    val viaExpired = Dedup.minhashNearDupsAgainstTable(
        incomingDocs.toDF("doc_id", "text"), s"$dir/idx", "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.writeBucketTable(survivors, s"$dir/rebuilt", "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 4)
    val viaRebuilt = Dedup.minhashNearDupsAgainstTable(
        incomingDocs.toDF("doc_id", "text"), s"$dir/rebuilt", "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExpired == viaRebuilt)
    // the retired docs no longer veto their duplicates; doc 2's near-dup
    // is still caught
    assert(!viaExpired.exists(_._2 == 1L) && !viaExpired.exists(_._2 == 4L))
    assert(viaExpired.contains((12L, 2L)))
  }

  test("bucket-table near-dedup == corpus-frame near-dedup, and the corpus is scanned ZERO times") {
    val dir = tmp("graft-lsh")
    // the existing corpus lives in parquet so its scan would be visible in
    // the incremental pass's physical plan if it leaked in
    val corpusPath = s"$dir/corpus"
    existingDocs.toDF("doc_id", "text").write.parquet(corpusPath)
    val existing = spark.read.parquet(corpusPath)
    val incoming = incomingDocs.toDF("doc_id", "text")

    Dedup.writeBucketTable(existing, s"$dir/idx", "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 4)
    val viaTable = Dedup.minhashNearDupsAgainstTable(incoming, s"$dir/idx",
      "doc_id", "text", threshold = 0.5)
    val viaCorpus = Dedup.minhashNearDupsAgainst(incoming, existing,
      "doc_id", "text", threshold = 0.5, numHashes = 16, bands = 4)

    val a = viaTable.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = viaCorpus.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
    assert(a.map(p => (p._1, p._2)).contains((11L, 1L)))
    assert(a.map(p => (p._1, p._2)).contains((14L, 4L)))

    // the scan-set assertion: the incremental pass reads the INDEX parquet,
    // never the corpus parquet (that is the whole point of the table)
    val plan = viaTable.queryExecution.executedPlan.toString
    assert(plan.contains(s"$dir/idx"), "expected the index table in the plan")
    assert(!plan.contains(corpusPath),
      "incremental pass must not scan the source corpus")
  }

  test("line-df table scrub == batch scrub semantics, corpus scanned ZERO times") {
    val dir = tmp("graft-linedf")
    val corpusPath = s"$dir/corpus"
    val footer = "all rights reserved"
    Seq((1L, s"alpha one\n$footer"), (2L, s"beta two\n$footer"),
      (3L, s"gamma three\n$footer"))
      .toDF("doc_id", "text").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    Dedup.writeLineDfTable(corpus, s"$dir/idx", "doc_id", "text")
    val incoming = Seq((11L, s"fresh prose line\n$footer"),
      (12L, "only fresh lines here")).toDF("doc_id", "text")
    val out = Dedup.dropFrequentLinesAgainstTable(incoming, s"$dir/idx",
      "doc_id", "text", maxDf = 2).orderBy("doc_id").collect()
    // footer has table df 3 > 2 -> dropped from doc 11; fresh lines (df 0) kept
    assert(out(0).getAs[Long]("n_dropped") == 1L &&
      out(0).getAs[String]("text_clean") == "fresh prose line")
    assert(out(1).getAs[Long]("n_dropped") == 0L &&
      out(1).getAs[String]("text_clean") == "only fresh lines here")
    val plan = Dedup.dropFrequentLinesAgainstTable(incoming, s"$dir/idx",
      "doc_id", "text", maxDf = 2).queryExecution.executedPlan.toString
    assert(plan.contains(s"$dir/idx") && !plan.contains(corpusPath),
      "incremental line scrub must read the table, never the corpus")
  }

  test("dropAgainstBucketTable keeps exactly the non-duplicates") {
    val dir = tmp("graft-lsh-drop")
    Dedup.writeBucketTable(existingDocs.toDF("doc_id", "text"), s"$dir/idx",
      "doc_id", "text", shingleK = 3, numHashes = 16, bands = 4)
    val kept = Dedup.dropAgainstBucketTable(incomingDocs.toDF("doc_id", "text"),
        s"$dir/idx", "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 13L) || kept == Set(13L)) // 12 depends on LSH recall
    assert(kept.contains(13L) && !kept.contains(11L) && !kept.contains(14L))
  }

  test("beforeIngest hides rows appended at or after the cut (streaming replay view)") {
    val dir = tmp("graft-lsh-ingest")
    Dedup.writeBucketTable(existingDocs.take(2).toDF("doc_id", "text"),
      s"$dir/idx", "doc_id", "text", shingleK = 3, numHashes = 16, bands = 4)
    // batch 3 appends doc 4's text; a replay of batch 3 (beforeIngest = 3)
    // must not see it, a later batch (beforeIngest = 4) must
    Dedup.appendToBucketTable(existingDocs.drop(3).toDF("doc_id", "text"),
      s"$dir/idx", "doc_id", "text", ingestStamp = 3L)
    val probe = Seq((14L, existingDocs(3)._2)).toDF("doc_id", "text")
    def matches(cut: Long) =
      Dedup.minhashNearDupsAgainstTable(probe, s"$dir/idx", "doc_id", "text",
          threshold = 0.5, beforeIngest = Some(cut))
        .select("existing_id").as[Long].collect().toSet
    assert(matches(3L) == Set.empty[Long])
    assert(matches(4L) == Set(4L))
    // duplicate appends are deduped at read: same matches, not doubled rows
    Dedup.appendToBucketTable(existingDocs.drop(3).toDF("doc_id", "text"),
      s"$dir/idx", "doc_id", "text", ingestStamp = 3L)
    val pairRows = Dedup.minhashNearDupsAgainstTable(probe, s"$dir/idx",
      "doc_id", "text", threshold = 0.5, beforeIngest = Some(4L)).count()
    assert(pairRows == 1L)
  }

  test("span digest table == corpus-frame span dedup, append/cut behave") {
    val dir = tmp("graft-span")
    val spansOf = split(col("text"), "\\. ")
    val existing = Seq((1L, "common header line. unique body one")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "common header line. fresh paragraph alpha"),
      (11L, "fresh paragraph alpha. fresh paragraph beta")).toDF("doc_id", "text")
    Dedup.writeSpanDigestTable(existing, s"$dir/dg", spansOf)
    val viaTable = Dedup.dropSpansAgainstDigestTable(incoming, s"$dir/dg",
      "doc_id", spansOf, joiner = ". ")
    val viaFrame = Dedup.dropSpansAgainstExisting(incoming, existing,
      "doc_id", spansOf, spansOf, joiner = ". ")
    assert(viaTable.orderBy("doc_id").collect().toSeq ==
      viaFrame.orderBy("doc_id").collect().toSeq)
    val texts = viaTable.orderBy("doc_id").select("text_dedup").as[String].collect()
    assert(texts(0) == "fresh paragraph alpha")      // header seen in corpus
    assert(texts(1) == "fresh paragraph beta")       // alpha keep-first at doc 10
  }

  test("bucket-table maintenance: compaction of the append-accreted table changes nothing") {
    val dir = tmp("graft-lsh-compact")
    Dedup.writeBucketTable(existingDocs.take(2).toDF("doc_id", "text"),
      s"$dir/idx", "doc_id", "text", shingleK = 3, numHashes = 16, bands = 4)
    Dedup.appendToBucketTable(existingDocs.drop(2).toDF("doc_id", "text"),
      s"$dir/idx", "doc_id", "text", ingestStamp = 1L)
    Dedup.appendToBucketTable(existingDocs.drop(3).toDF("doc_id", "text"),
      s"$dir/idx", "doc_id", "text", ingestStamp = 2L) // duplicate rows on purpose
    val incoming = incomingDocs.toDF("doc_id", "text")
    def probe(cut: Option[Long]) = Dedup.minhashNearDupsAgainstTable(incoming,
        s"$dir/idx", "doc_id", "text", threshold = 0.5, beforeIngest = cut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = probe(None)
    val beforeCut2 = probe(Some(2L)) // excludes the ingest=2 duplicate append
    val ((b1, a1), (b2, a2)) = Dedup.compactBucketTable(spark, s"$dir/idx", 1)
    assert(a1 <= b1 && a2 <= b2 && a1 == 1 && a2 == 1)
    // results unchanged at EVERY ingest cut: the fold keeps min(ingest),
    // so duplicate appends collapse without shifting replay visibility
    assert(probe(None) == before && before.nonEmpty)
    assert(probe(Some(2L)) == beforeCut2)
    // logical row counts actually shrank (the duplicate append folded)
    assert(spark.read.parquet(s"$dir/idx/shingles")
      .groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("IVF maintenance: ivfAdd growth -> save -> load == the grown index") {
    val dir = tmp("graft-ivf-grow")
    val rnd = new scala.util.Random(7)
    val all = (0 until 150).map(i =>
      (i.toLong, Array.fill(12)((rnd.nextDouble() * 2 - 1).toFloat)))
    val base = all.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
    val batch = all.filter(_._1 % 2 == 1).toDF("vec_id", "embedding")
    val queries = all.take(4).toDF("vec_id", "embedding")
    val grown = Knn.ivfAdd(Knn.ivfIndex(base, nlist = 6), batch)
    val want = Knn.ivfSearch(grown, queries, k = 3, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    Knn.ivfSave(grown, s"$dir/idx")
    val loaded = Knn.ivfLoad(spark, s"$dir/idx")
    val got = Knn.ivfSearch(loaded, queries, k = 3, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && got.nonEmpty)
    grown.unpersist(); loaded.unpersist()
  }

  test("IVF save/load round trip: reloaded index searches identically") {
    val dir = tmp("graft-ivf")
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val built = Knn.ivfIndex(corpus, nlist = 8)
    val before = Knn.ivfSearch(built, queries, k = 4, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    Knn.ivfSave(built, s"$dir/idx")
    val loaded = Knn.ivfLoad(spark, s"$dir/idx")
    assert(loaded.centroids.map(_._1).sorted.sameElements(
      built.centroids.map(_._1).sorted))
    assert(loaded.lists.count() == built.lists.count())
    val after = Knn.ivfSearch(loaded, queries, k = 4, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(after == before && after.nonEmpty)
    built.unpersist(); loaded.unpersist()
  }

  test("reliable checkpoint without a checkpoint dir fails fast with guidance") {
    // must run BEFORE the routing test below (which sets the dir on the
    // shared context — setCheckpointDir has no unset)
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      spark.conf.set("spark.graft.reliableCheckpoint", "true")
      try {
        val ex = intercept[IllegalArgumentException] {
          Checkpoints.ckpt(Seq((1, "a")).toDF("i", "s"))
        }
        assert(ex.getMessage.contains("setCheckpointDir"))
      } finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
    }
  }

  test("reliable checkpoint routing: same CC + near-dedup results, files in the checkpoint dir") {
    val ckptDir = tmp("graft-ckpt")
    val docs = (existingDocs ++ incomingDocs).toDF("doc_id", "text")
    val defaultKept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      threshold = 0.5).select("doc_id").as[Long].collect().toSet
    val sc = spark.sparkContext
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    sc.setCheckpointDir(ckptDir)
    try {
      val reliableKept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
        threshold = 0.5).select("doc_id").as[Long].collect().toSet
      assert(reliableKept == defaultKept)
      def anyFiles(f: java.io.File): Boolean = {
        val fs = f.listFiles()
        fs != null && fs.exists(c => c.isFile || anyFiles(c))
      }
      assert(anyFiles(new java.io.File(ckptDir)),
        "reliable checkpoint must write to the checkpoint dir")
    } finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }
}
