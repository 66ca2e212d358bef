package graft

import org.apache.spark.sql.functions._
import graft.operators.{Robust, Split, TextOps, Winnow}

/** Specs for the round-7 batch: winnowing fingerprints (the SIGMOD'03
  * locality guarantee), Zipf OLS fit, temperature mixture sampling, and
  * percentile score calibration. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantee: a shared run of >= k+w-1 chars is caught") {
    // k=8, w=4 -> any shared substring of >= 11 chars (post-normalization)
    // must yield a shared fingerprint. The shared paragraph sits at
    // DIFFERENT offsets inside otherwise-disjoint text.
    val shared = "the quick brown fox jumps over the lazy dog repeatedly"
    val a = (1L, s"alpha beta gamma delta $shared epsilon zeta")
    val b = (2L, s"one two $shared three four five six seven eight nine")
    val c = (3L, "entirely different content with no overlap at all here")
    val df = Seq(a, b, c).toDF("doc_id", "text")
    val pairs = Winnow.overlapReport(df, "doc_id", "text", minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowing is whitespace/case-insensitive and self-overlap is 1.0") {
    val df = Seq(
      (1L, "Some Document   With  Odd\n\nSpacing and CASE"),
      (2L, "some document with odd spacing and case")).toDF("doc_id", "text")
    val r = Winnow.overlapReport(df, "doc_id", "text", minShared = 1).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("overlap") == 1.0)
    assert(r(0).getAs[Long]("n_a") == r(0).getAs[Long]("n_b"))
  }

  test("winnowing density: fingerprints per doc <= window count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).select("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .groupBy("doc_id").count()
    val lens = docs.select(col("doc_id"),
      greatest(length(concat_ws(" ", TextOps.tokens(lower(col("text"))))) - lit(7 + 3),
        lit(1)).as("n_win"))
    val bad = fps.join(lens, "doc_id").filter(col("count") > col("n_win")).count()
    assert(bad == 0)
  }

  test("zipf fit: an exact power-law corpus fits slope ~ -1 with high r2") {
    // token i (1..100) appears floor(2000 / i) times: freq ~ rank^-1
    val rows = (1 to 100).flatMap(i => Seq.fill(2000 / i)(s"tok${"%03d".format(i)}"))
    val df = rows.grouped(500).map(_.mkString(" ")).toSeq.toDF("text")
    val r = TextOps.zipfFit(df, "text", topRanks = 64).collect()(0)
    val slope = r.getAs[Double]("slope")
    val r2 = r.getAs[Double]("r2")
    assert(math.abs(slope - (-1.0)) < 0.05, s"slope $slope")
    assert(r2 > 0.999, s"r2 $r2")
    assert(r.getAs[Int]("n_ranks") == 64)
  }

  test("zipf fit: a uniform-frequency corpus fits slope ~ 0") {
    val rows = (1 to 50).flatMap(i => Seq.fill(40)(s"u$i"))
    val df = rows.grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val slope = TextOps.zipfFit(df, "text", topRanks = 32)
      .collect()(0).getAs[Double]("slope")
    assert(math.abs(slope) < 1e-9, s"slope $slope")
  }

  test("temperature mixture: exact total, flattened shares, small-source guard") {
    // natural shares 80/15/4/1 (%); alpha=1/2 must pull the head down
    val docs = (1 to 1600).map(i => ("big", i.toLong)) ++
      (1 to 300).map(i => ("mid", 10000L + i)) ++
      (1 to 80).map(i => ("small", 20000L + i)) ++
      (1 to 20).map(i => ("tiny", 30000L + i))
    val df = docs.map { case (s, id) => (s, id, "word " * 5) }
      .toDF("source", "doc_id", "text")
    val card = Split.temperatureMixture(df, "source", "doc_id", "text",
      total = 500L).collect().map(r =>
        r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("target_n"),
           r.getAs[Long]("n_sampled"))).toMap
    assert(card.values.map(_._2).sum == 500L) // largest remainder is exact
    // every target was satisfiable here, so sampled == target
    assert(card.values.forall { case (n, t, s) => s == math.min(n, t) })
    val naturalBig = 1600.0 / 2000.0
    val mixedBig = card("big")._2 / 500.0
    assert(mixedBig < naturalBig, s"head share $mixedBig !< $naturalBig")
    val naturalTiny = 20.0 / 2000.0
    assert(card("tiny")._2 / 500.0 > naturalTiny) // tail upsampled
  }

  test("temperature mixture is deterministic across runs") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Split.temperatureMixture(df, "source", "doc_id", "text", 200L)
      .orderBy("source").collect().toSeq
    val b = Split.temperatureMixture(df, "source", "doc_id", "text", 200L)
      .orderBy("source").collect().toSeq
    assert(a == b)
  }

  test("percentile calibration: deciles partition each group, norms monotone") {
    val df = (0 until 100).map(i => ("s1", i.toLong)) ++
      (0 until 30).map(i => ("s2", 1000L + 7L * i))
    val out = Robust.percentileCalibration(df.toDF("source", "score"),
      "source", "score").orderBy("source", "decile").collect()
    val s1 = out.filter(_.getString(0) == "s1")
    assert(s1.map(_.getAs[Long]("n_docs")).sum == 100L)
    assert(s1.map(_.getAs[Int]("decile")).toSeq == (0 to 9))
    val means = s1.map(_.getAs[Double]("mean_norm")).toSeq
    assert(means == means.sorted) // rank-normalized means rise by decile
    // scale-free: both sources' decile-0 means match despite different scales
    val s2 = out.filter(_.getString(0) == "s2")
    assert(s2.map(_.getAs[Long]("n_docs")).sum == 30L)
  }

  test("jackknife CI: exact mean, se = 0 on a constant group, interval brackets") {
    val docs = (1 to 400).map(i => ("varied", i.toLong, (i % 37).toLong)) ++
      (1 to 100).map(i => ("const", 10000L + i, 42L))
    val out = Robust.jackknifeCI(docs.toDF("source", "doc_id", "score"),
      "source", "doc_id", "score").collect()
      .map(r => r.getString(0) -> r).toMap
    val c = out("const")
    assert(c.getAs[Double]("mean") == 42.0)
    assert(c.getAs[Double]("se_jack") == 0.0)
    assert(c.getAs[Double]("ci_lo") == 42.0 && c.getAs[Double]("ci_hi") == 42.0)
    val v = out("varied")
    val exact = (1 to 400).map(_ % 37).sum.toDouble / 400
    assert(math.abs(v.getAs[Double]("mean") - exact) < 1e-6)
    assert(v.getAs[Double]("se_jack") > 0)
    assert(v.getAs[Double]("ci_lo") < exact && exact < v.getAs[Double]("ci_hi"))
    assert(v.getAs[Long]("n") == 400L)
  }

  test("winnow table probe == in-session fingerprints (params from meta)") {
    val dir = java.nio.file.Files.createTempDirectory("winnowtab").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 4 === 0)
    val incoming = docs.filter(col("doc_id") % 4 === 2)
    // NON-default params: the probe must pick them up from meta
    Winnow.writeFingerprintTable(existing, dir, "doc_id", "text",
      k = 6, w = 5, seed = 23)
    val viaTable = Winnow.overlapAgainstTable(incoming, dir, "doc_id", "text",
      minShared = 2).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2))).toSet
    // direct recomputation with the BUILD params
    val exFps = Winnow.fingerprints(existing, "doc_id", "text", 6, 5, 23)
      .select(col("doc_id").as("existing_id"), col("fp"))
    val inFps = Winnow.fingerprints(incoming, "doc_id", "text", 6, 5, 23)
      .select(col("doc_id").as("incoming_id"), col("fp"))
    val direct = inFps.join(exFps, "fp")
      .groupBy("incoming_id", "existing_id").count()
      .filter(col("count") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaTable == direct)
    assert(viaTable.nonEmpty || direct.isEmpty)
  }

  test("winnow table append + beforeIngest: replayed batch excludes itself") {
    val dir = java.nio.file.Files.createTempDirectory("winnowing").toString
    val seedDocs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    Winnow.writeFingerprintTable(seedDocs, dir, "doc_id", "text")
    val batch = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    Winnow.appendToFingerprintTable(batch, dir, "doc_id", "text",
      ingestStamp = 7L)
    // replay at cut 7: the batch's own rows (ingest 7) are invisible —
    // it matches only the seed corpus, exactly-once semantics hold
    val replay = Winnow.overlapAgainstTable(batch, dir, "doc_id", "text",
      minShared = 1, beforeIngest = Some(7L))
      .select("existing_id").as[Long].collect().toSet
    assert(replay == Set(1L))
    // an unbounded probe sees the appended copy too (self-match id 10)
    val openProbe = Winnow.overlapAgainstTable(batch, dir, "doc_id", "text",
      minShared = 1).select("existing_id").as[Long].collect().toSet
    assert(openProbe == Set(1L, 10L))
  }

  test("percentile calibration: an all-ties group lands wholly in decile 0") {
    val df = (1 to 20).map(i => ("t", 5L)).toDF("source", "score")
    val out = Robust.percentileCalibration(df, "source", "score").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("decile") == 0)
    assert(out(0).getAs[Double]("mean_norm") == 0.0)
    assert(out(0).getAs[Long]("n_docs") == 20L)
  }
}
