package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Skew}
import graft.etl.Sinks

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val skewed = (
    (1 to 1000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"cold$i", i.toDouble))).toDF("k", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "v", salts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain join") {
    val right = Seq(("hot", "H"), ("cold1", "C1"), ("missing", "M")).toDF("k", "tag")
    val plain = skewed.join(right, Seq("k")).groupBy("k", "tag").count()
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val salted = Skew.saltedJoin(skewed, right, "k", salts = 8)
      .groupBy("k", "tag").count()
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join rejects join types that would duplicate right rows") {
    val right = Seq(("hot", "H")).toDF("k", "tag")
    for (bad <- Seq("right", "full", "full_outer"))
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(skewed, right, "k", salts = 4, joinType = bad)
      }
  }

  test("advisor flags the hot key with the right share and salt factor") {
    // 1000 hot + 50 cold rows over 51 keys: mean ~20.6, hot > 2x mean
    val rep = Skew.advisor(skewed, Seq("k"), targetRowsPerTask = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(rep.head == ("hot", 1000L, 1000L * 1000000L / 1050L, true, 10L))
    assert(rep.length == 51)
    val cold = rep.tail
    assert(cold.forall { case (_, n, _, hot, salt) =>
      n == 1L && !hot && salt == 1L })
    // deterministic tiebreak: equal-count keys come back key-ordered
    assert(cold.map(_._1).toSeq == cold.map(_._1).toSeq.sorted)
  }

  test("advisor rejects a non-positive task budget") {
    intercept[IllegalArgumentException] {
      Skew.advisor(skewed, Seq("k"), targetRowsPerTask = 0L)
    }
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k finds exact neighbors when probing all lists") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 37.0 + d) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val exact = Knn.bruteForceTopK(vecs, queries, k = 3)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val ivfAll = Knn.ivfTopK(vecs, queries, k = 3, nlist = 4, nprobe = 4)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(ivfAll == exact) // nprobe = nlist scans everything -> exact
    val ivfPruned = Knn.ivfTopK(vecs, queries, k = 3, nlist = 4, nprobe = 1)
    assert(ivfPruned.groupBy("query_id").count()
      .collect().forall(_.getLong(1) <= 3))
  }

  test("k-means IVF: separated clusters land in one list each; full probe is exact") {
    // 4 well-separated clusters of 10 vectors along distinct axes
    val vecs = (0L until 40L).map { i =>
      val c = (i % 4).toInt
      val base = Array.fill(8)(0.01f * ((i % 7) + 1))
      base(c * 2) = 10f + (i % 5) * 0.1f
      (i, base)
    }.toDF("vec_id", "embedding")
    val index = Knn.ivfIndexKMeans(vecs, nlist = 4, iters = 3)
    assert(index.centroids.length == 4)
    assert(index.lists.count() == 40)
    // members of one cluster share a list (centroids converge to the axes)
    val byCluster = index.lists.withColumn("cluster", col("neighbor_id") % 4)
      .groupBy("cluster").agg(countDistinct(col("__cent_id")).as("nlists"))
      .collect().map(r => r.getAs[Number]("nlists").longValue())
    assert(byCluster.forall(_ == 1L))
    // probing every list reproduces brute force exactly
    val queries = vecs.filter(col("vec_id") < 3)
    val exact = Knn.bruteForceTopK(vecs, queries, k = 3)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val got = Knn.ivfSearch(index, queries, k = 3, nprobe = 4)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(got == exact)
  }
}

class MutualNnLshSpec extends SparkSpec {
  import spark.implicits._

  test("mutual-NN via lshTopKPortable equals brute mutual-NN when buckets capture the clusters") {
    // two tight clusters along different axes: every vector's true top-1
    // is in-cluster, and the SRP projections are dominated by the big
    // axis component so each cluster shares one bucket — on this fixture
    // the q382 scorer swap (lshTopKPortable for bruteForceTopK) must
    // change NOTHING about the reciprocal-best-match set
    val vecs = (0L until 40L).map { i =>
      val axis = if (i < 20) 0 else 4
      val v = Array.tabulate(8)(d => 0.05f * ((i * 7 + d) % 5))
      v(axis) = 10f + 0.01f * (i % 5)
      (i, v)
    }.toDF("vec_id", "embedding")
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("query_id", "neighbor_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def mutual(m: Map[Long, Long]): Set[(Long, Long)] =
      m.collect { case (a, b) if m.get(b).contains(a) && a < b => (a, b) }.toSet
    val brute = mutual(top1(Knn.bruteForceTopK(vecs, vecs, k = 1)))
    val lsh = mutual(top1(Knn.lshTopKPortable(vecs, vecs, k = 1,
      numPlanes = 8)))
    assert(brute.nonEmpty)
    assert(lsh == brute)
    // mutual pairs never cross clusters on this fixture
    assert(lsh.forall { case (a, b) => (a < 20) == (b < 20) })
  }
}

class IvfAddSpec extends SparkSpec {
  import spark.implicits._

  test("incrementally-grown index full-probe equals brute force") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 41.0 + d) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val exact = Knn.bruteForceTopK(vecs, queries, k = 4)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val grown = Knn.ivfAdd(
      Knn.ivfIndex(vecs.filter(col("vec_id") % 3 =!= 0), nlist = 4),
      vecs.filter(col("vec_id") % 3 === 0))
    assert(grown.lists.count() == 60) // every vector landed in a list
    val got = Knn.ivfSearch(grown, queries, k = 4, nprobe = 4)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(got == exact)
    grown.unpersist()
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Knn, Quantize}

  private val vecs = (0L until 80L).map { i =>
    (i, Array.tabulate(16)(d => (math.sin(i * 53.0 + d * 7) * 5).toFloat))
  }.toDF("vec_id", "embedding")

  test("int8 codes stay in [-127,127] and reconstruction error <= scale/2 + eps") {
    val s = Quantize.scaleOf(col("embedding"))
    val bad = vecs.select(
        explode(Quantize.quantize(col("embedding"), s)).as("q"))
      .filter(col("q") > 127 || col("q") < -127).count()
    assert(bad == 0)
    val viol = Quantize.reconstructionError(vecs, "vec_id", "embedding")
      .filter(col("max_err") > col("scale") / 2 + 1e-9).count()
    assert(viol == 0) // round-to-nearest bounds the error by scale/2
  }

  test("top-k recall on dequantized vectors stays high") {
    val queries = vecs.filter(col("vec_id") < 5)
    val exact = Knn.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s = Quantize.scaleOf(col("embedding"))
    val deq = vecs.select(col("vec_id"),
      Quantize.dequantize(Quantize.quantize(col("embedding"), s), s)
        .as("embedding"))
    val approx = Knn.bruteForceTopK(deq, deq.filter(col("vec_id") < 5), k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized top-k recall $recall < 0.9")
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Pq

  // 4 planted clusters of 20: members share their center's coarse shape
  // with small deterministic jitter, so subvector codes separate them
  private val dim = 16
  private val vecs = (0L until 80L).map { i =>
    val c = (i % 4).toInt
    (i, Array.tabulate(dim)(d =>
      (math.sin(c * 100.0 + d) * 10 + math.sin(i * 53.0 + d) * 0.1).toFloat))
  }.toDF("vec_id", "embedding")
  private val cb = Pq.codebook(vecs, "vec_id", "embedding", dim, m = 4,
    nseeds = 8)
  private val codes = Pq.encode(vecs, cb, "vec_id", "embedding", dim, m = 4)

  test("codebook/codes shapes: m x nseeds entries, one code per (vec, j)") {
    assert(cb.count() == 4 * 8)
    assert(cb.select(size(col("subvec"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(dim / 4))
    assert(codes.count() == 80 * 4)
    assert(codes.groupBy("vec_id", "j").count()
      .filter(col("count") =!= 1).count() == 0)
    val range = codes.agg(min(col("code")), max(col("code"))).collect().head
    assert(range.getInt(0) >= 0 && range.getInt(1) <= 7)
  }

  test("ADC on a seed vector equals its exact squared distance") {
    // a seed's codes reconstruct the seed itself (distance-0 argmin), so
    // ADC(q, seed) is the exact subvector-sum distance up to round-6
    val q = vecs.filter(col("vec_id") === 40L) // not a seed (seeds are 0-7)
    val got = Pq.adcSearch(q, codes, cb, "vec_id", "vec_id", "embedding",
        dim, m = 4, k = 80)
      .filter(col("neighbor_id") < 8).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val exact = vecs.filter(col("vec_id") === 40L).as("a")
      .crossJoin(vecs.filter(col("vec_id") < 8).as("b"))
      .select(col("b.vec_id"),
        round(Pq.sqDist(col("a.embedding"), col("b.embedding")), 4).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, d) <- exact)
      assert(math.abs(got(id) - d) < 1e-3, s"seed $id: adc ${got(id)} vs $d")
  }

  test("coarse codebook: every ADC top-5 neighbor is from the query's cluster") {
    // 8 seeds over 4 clusters: within-cluster jitter is below quantization
    // resolution (members share codes — PQ's documented granularity
    // limit), but BETWEEN-cluster distance dominates, so cluster
    // membership of the top-k is exact
    val queries = vecs.filter(col("vec_id") >= 40L && col("vec_id") < 45L)
    val bad = Pq.adcSearch(queries, codes, cb, "vec_id", "vec_id",
        "embedding", dim, m = 4, k = 5)
      .filter(col("query_id") % 4 =!= col("neighbor_id") % 4).count()
    assert(bad == 0)
  }

  test("IVFADC: full probe + full-resolution residual codebook is exact") {
    // nprobe = nlist and nseeds = |corpus|: every residual encodes to
    // itself and every list is probed, so the whole approximate pipeline
    // collapses to exact L2 — the two accuracy knobs at their endpoints
    val queries = vecs.filter(col("vec_id") >= 40L && col("vec_id") < 45L)
    val exact = queries.as("a").crossJoin(vecs.as("b"))
      .where(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("n"),
        Pq.sqDist(col("a.embedding"), col("b.embedding")).as("d"))
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("q")).orderBy(col("d"), col("n"))))
      .where(col("r") <= 5).select("q", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.ivfadcSearch(queries, vecs, "vec_id", "embedding",
        dim, nlist = 4, m = 4, nseeds = 80, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == exact, s"exhaustive IVFADC != exact: ${approx diff exact}")
  }

  test("IVFADC: results come only from probed lists") {
    val queries = vecs.filter(col("vec_id") === 40L)
    val got = Pq.ivfadcSearch(queries, vecs, "vec_id", "embedding",
        dim, nlist = 4, m = 4, nseeds = 8, k = 80, nprobe = 1)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    // nprobe=1 over 4 planted clusters: neighbors share one coarse list;
    // with cluster-shaped data that list is (a subset of) one cluster
    assert(got.nonEmpty && got.size < 80)
    val clusters = got.map(_ % 4)
    assert(clusters.size == 1, s"nprobe=1 crossed lists: $clusters")
  }

  test("k-means codebooks: distortion non-increasing, beats raw seeds") {
    def distortion(codebook: org.apache.spark.sql.DataFrame): Double = {
      val codes = Pq.encode(vecs, codebook, "vec_id", "embedding", dim, m = 4)
      vecs.select(col("vec_id"), col("embedding").as("__v"))
        .join(codes, "vec_id").as("x")
        .join(codebook.as("c"),
          col("x.j") === col("c.j") && col("x.code") === col("c.cid"))
        .select(Pq.sqDist(
          slice(col("__v"), col("x.j") * 4 + 1, lit(4)), col("c.subvec"))
          .as("d"))
        .agg(sum(col("d"))).collect().head.getDouble(0)
    }
    val d0 = distortion(cb)
    val d1 = distortion(Pq.codebookKMeans(vecs, "vec_id", "embedding",
      dim, m = 4, nseeds = 8, iters = 1))
    val d2 = distortion(Pq.codebookKMeans(vecs, "vec_id", "embedding",
      dim, m = 4, nseeds = 8, iters = 3))
    assert(d1 <= d0 + 1e-9, s"one Lloyd round worsened distortion: $d0 -> $d1")
    assert(d2 <= d1 + 1e-9, s"more rounds worsened distortion: $d1 -> $d2")
    // on the planted clusters refinement is a real win, not a wash
    assert(d2 < d0 * 0.9, s"refinement too weak: $d0 -> $d2")
  }

  test("full-resolution codebook degenerates ADC to exact L2 search") {
    // nseeds = |corpus|: every vector encodes to itself (own-subvector
    // distance 0), so ADC(q, v) is the exact distance up to round-6 —
    // PQ's accuracy knob demonstrated at its endpoint
    val cbFull = Pq.codebook(vecs, "vec_id", "embedding", dim, m = 4,
      nseeds = 80)
    val codesFull = Pq.encode(vecs, cbFull, "vec_id", "embedding", dim, m = 4)
    val queries = vecs.filter(col("vec_id") >= 40L && col("vec_id") < 45L)
    val exact = queries.as("a").crossJoin(vecs.as("b"))
      .where(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("n"),
        Pq.sqDist(col("a.embedding"), col("b.embedding")).as("d"))
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("q")).orderBy(col("d"), col("n"))))
      .where(col("r") <= 5).select("q", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.adcSearch(queries, codesFull, cbFull, "vec_id", "vec_id",
        "embedding", dim, m = 4, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == exact, s"full-codebook ADC != exact: ${approx diff exact}")
  }
}

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Knn, Quantize}

  // clustered corpus: 10 topic centroids + small per-member noise.
  // Truncation preserves CLUSTER structure (centroids stay separated in
  // any 12-dim prefix), which is what real embedding spaces look like —
  // on iid noise, neighbours are tail-noise artefacts and truncation
  // recall is legitimately poor (measured 0.36; not a regression)
  private val corpus = {
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(10)(Array.fill(16)(rnd.nextDouble() - 0.5))
    (0 until 150).map { i =>
      val c = cents(i % 10)
      (i.toLong, Array.tabulate(16)(d =>
        (c(d) + 0.05 * (rnd.nextDouble() - 0.5)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("l2Normalize yields unit norms; zero vectors stay zero") {
    val withZero = corpus.unionByName(
      Seq((999L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding"))
    val norms = withZero
      .select(col("vec_id"), Knn.norm(Quantize.l2Normalize(col("embedding"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(norms(0L) - 1.0) < 1e-9)
    assert(norms(999L) == 0.0)
    assert(norms.filterKeys(_ != 999L).values.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("energy ratio is in [0,1] and hits 1 at full dimension") {
    val audit = Quantize.matryoshkaAudit(corpus, "vec_id", "embedding", d = 8)
      .collect().map(_.getDouble(3))
    assert(audit.forall(r => r >= 0.0 && r <= 1.0))
    val full = Quantize.matryoshkaAudit(corpus, "vec_id", "embedding", d = 16)
      .collect().map(_.getDouble(3))
    assert(full.forall(_ == 1.0))
  }

  test("truncated-vector search keeps most full-vector neighbours (12/16)") {
    val trunc = corpus.select(col("vec_id"),
      org.apache.spark.sql.functions.slice(col("embedding"), 1, 12).as("embedding"))
    val queries = corpus.filter(col("vec_id") < 5)
    val tQueries = trunc.filter(col("vec_id") < 5)
    def top5(c: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) =
      Knn.bruteForceTopK(c, q, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
    val full = top5(corpus, queries)
    val truncated = top5(trunc, tQueries)
    // within-cluster rank order is noise-determined, so exact top-5
    // identity is the wrong metric; the structural property truncation
    // must keep is that neighbours stay CLUSTER-MATES of the query
    def clusterRecall(tops: Map[Long, Set[Long]]) = tops.map { case (q, ns) =>
      ns.count(n => n % 10 == q % 10) / 5.0
    }.sum / tops.size
    assert(clusterRecall(full) >= 0.9, s"full-dim sanity ${clusterRecall(full)}")
    assert(clusterRecall(truncated) >= 0.9,
      s"truncated cluster recall ${clusterRecall(truncated)}")
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned fact write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val facts = (1 to 100).map(i => (20240101 + (i % 5), i.toLong, i * 1.5))
      .toDF("date_key", "id", "value")
    Sinks.writePartitionedFact(facts, s"$dir/fact")
    val back = spark.read.parquet(s"$dir/fact")
    assert(back.count() == 100)
    val one = back.filter(col("date_key") === 20240103)
    // partition pruning: the physical plan carries the partition filter and
    // reads a single directory
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("date_key"))
    assert(one.count() == 20)
    // dynamic overwrite of one partition leaves the others intact
    Sinks.writePartitionedFact(
      Seq((20240103, 999L, 0.0)).toDF("date_key", "id", "value"), s"$dir/fact")
    val after = spark.read.parquet(s"$dir/fact")
    assert(after.filter(col("date_key") === 20240103).count() == 1)
    assert(after.filter(col("date_key") =!= 20240103).count() == 80)
  }

  test("compaction shrinks file count, preserves rows, survives re-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/tbl"
    // accrete many small files the way a micro-batch sink does
    for (b <- 1 to 6)
      (1 to 50).map(i => (b * 100L + i, s"v$b-$i")).toDF("id", "v")
        .repartition(4).write.mode("append").parquet(path)
    val want = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val (before, after) = Sinks.compact(spark, path, targetFiles = 2)
    assert(before >= 20 && after <= 2, s"files $before -> $after")
    val got = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("scaled partitioned write spreads a hot partition over several files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sinkscaled").toString
    // one hot date (800 rows) + two small ones: the single-task-per-value
    // hazard the scaled variant exists for
    val facts = ((1 to 800).map(i => (20240101, i.toLong, i * 1.0)) ++
      (1 to 20).map(i => (20240102, i.toLong, 0.0)) ++
      (1 to 20).map(i => (20240103, i.toLong, 0.0)))
      .toDF("date_key", "id", "value").repartition(8)
    Sinks.writePartitionedFactScaled(facts, s"$dir/fact",
      tasksPerPartition = 4, maxRecordsPerFile = 100L)
    // values and pruning are unchanged vs the simple writer
    val back = spark.read.parquet(s"$dir/fact")
    assert(back.count() == 840)
    val one = back.filter(col("date_key") === 20240101)
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(one.count() == 800)
    // the hot directory holds MULTIPLE files (salt spread x records cap) —
    // a repartition(col) write would produce exactly one
    val hotFiles = new java.io.File(s"$dir/fact/date_key=20240101")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(hotFiles > 1, s"hot partition written as $hotFiles file(s)")
  }
}

class ExactDedupAggSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Dedup

  test("agg form of exact dedup equals the window form, skewed corpus included") {
    // one hot text duplicated 500x + 100 distinct rows
    val rows = (1 to 500).map(i => (i.toLong, "hot text")) ++
      (501 to 600).map(i => (i.toLong, s"text $i"))
    val df = rows.toDF("id", "text").repartition(8)
    val win = Dedup.markExactDuplicates(df, "text", "id")
      .select("id", "is_duplicate").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val agg = Dedup.markExactDuplicatesAgg(df, "text", "id")
      .select("id", "is_duplicate").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(agg == win)
    assert(agg(1L) == false && agg(2L) == true && agg(500L) == true)
    assert((501L to 600L).forall(agg(_) == false))
  }
}

class SketchSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Sketch

  // 1000 distinct values, each appearing 1-3 times
  private val values = (1 to 1000).flatMap(i => Seq.fill(1 + i % 3)(s"val-$i"))
    .toDF("v")

  test("linear counting estimates distinct count within a few percent") {
    for (portable <- Seq(false, true)) {
      val r = Sketch.linearCountDistinct(values, "v", m = 4096,
        portable = portable).collect().head
      assert(r.getAs[Long]("occupied") <= 1000)
      val est = r.getAs[Double]("est_distinct")
      assert(math.abs(est - 1000) / 1000.0 < 0.05,
        s"estimate $est too far from 1000 (portable=$portable)")
    }
  }

  test("linear counting reports saturation as NULL, not infinity") {
    val r = Sketch.linearCountDistinct(values, "v", m = 4).collect().head
    assert(r.getAs[Long]("occupied") == 4)
    assert(r.isNullAt(r.fieldIndex("est_distinct")))
  }

  test("count-min never underestimates and is exact without collisions") {
    val trueFreq = values.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // narrow sketch: collisions certain -> estimate >= truth everywhere
    val narrow = Sketch.cmsHeavyHitters(values, "v", k = 1000, depth = 4,
      width = 64).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(narrow.keySet == trueFreq.keySet)
    assert(narrow.forall { case (v, est) => est >= trueFreq(v) })
    // wide sketch: 1000 keys in 4x65536 counters -> whp no row has all
    // four cells collided, so min-over-rows equals the exact count
    val wide = Sketch.cmsHeavyHitters(values, "v", k = 1000, depth = 4,
      width = 65536).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == trueFreq)
  }

  test("count-min reports 0 for candidates the corpus never saw") {
    val candidates = Seq("val-1", "never-seen-a", "never-seen-b").toDF("v")
    val est = Sketch.cmsHeavyHitters(values, "v", k = 10, depth = 4,
        width = 65536, candidates = Some(candidates))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set("val-1", "never-seen-a", "never-seen-b"))
    assert(est("val-1") == 2)           // true count survives
    assert(est("never-seen-a") == 0)    // absent candidate reports 0,
    assert(est("never-seen-b") == 0)    // not a collision's count
  }

  test("hll estimates 20k distincts within 5% in the raw regime") {
    val big = (1 to 20000).flatMap(i => Seq.fill(1 + i % 2)(s"id-$i")).toDF("v")
    for (portable <- Seq(false, true)) {
      val r = Sketch.hllDistinct(big, "v", p = 12, portable = portable)
        .collect().head
      // n/m ~ 5 >> linear-counting range: the raw harmonic path must fire
      assert(r.getAs[Long]("occupied") > 4096 * 9 / 10)
      val est = r.getAs[Double]("est_distinct")
      // std err 1.04/sqrt(4096) ~ 1.6%; 5% is 3 sigma
      assert(math.abs(est - 20000) / 20000.0 < 0.05,
        s"estimate $est too far from 20000 (portable=$portable)")
    }
  }

  test("hll small-range correction matches linear counting on sparse input") {
    val small = (1 to 50).map(i => s"id-$i").toDF("v")
    val r = Sketch.hllDistinct(small, "v", p = 12).collect().head
    val occupied = r.getAs[Long]("occupied")
    val expected = BigDecimal(4096.0 * math.log(4096.0 / (4096 - occupied)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("est_distinct") == expected)
  }

  test("hll registers merge by bucket-wise max: merged halves == whole") {
    val all = (1 to 5000).map(i => s"id-$i").toDF("v")
    val a = (1 to 3000).map(i => s"id-$i").toDF("v")    // overlapping halves
    val b = (2000 to 5000).map(i => s"id-$i").toDF("v")
    val whole = Sketch.hllEstimate(Sketch.hllRegisters(all, "v"), p = 12)
      .collect().head
    val merged = Sketch.hllEstimate(
      Sketch.hllMerge(Sketch.hllRegisters(a, "v"), Sketch.hllRegisters(b, "v")),
      p = 12).collect().head
    assert(whole.toSeq == merged.toSeq)
  }

  test("grouped hll equals the per-group batch estimator") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"id-${i % 700}"))
      .toDF("g", "v")
    val grouped = Sketch.hllDistinctBy(df, "g", "v", p = 12)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketch.hllDistinct(df.filter(col("g") === g), "v", p = 12)
        .collect().head
      assert(grouped(g) ==
        ((solo.getAs[Long]("occupied"), solo.getAs[Double]("est_distinct"))))
    }
  }

  test("hll set algebra: union/intersection track exact set sizes") {
    // A = 1..4000, B = 3001..7000, C = 9001..9800 (disjoint from both):
    // |A∩B| = 1000, |A∪B| = 7000, |A∩C| = 0.
    val df = ((1 to 4000).map(i => ("A", s"id-$i")) ++
        (3001 to 7000).map(i => ("B", s"id-$i")) ++
        (9001 to 9800).map(i => ("C", s"id-$i"))).toDF("k", "v")
    val got = Sketch.hllSetAlgebra(df, "k", "v", p = 12)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("A", "B"))
    // std err ~1.6% per estimate; intersection stacks three -> loose 10%
    assert(math.abs(ab.getAs[Double]("est_union") - 7000) / 7000.0 < 0.05)
    assert(math.abs(ab.getAs[Double]("est_intersect") - 1000) / 1000.0 < 0.30)
    val ac = got(("A", "C"))
    // disjoint: intersection estimate is near zero (may be negative —
    // reported raw, unclamped)
    assert(math.abs(ac.getAs[Double]("est_intersect")) < 4800 * 0.10)
    // union of registers can never estimate below either side
    assert(ac.getAs[Double]("est_union") >=
      math.max(ac.getAs[Double]("est_a"), ac.getAs[Double]("est_b")) - 1e-6)
  }

  test("hll set algebra: pair union == registers built on the unioned data") {
    val df = ((1 to 2000).map(i => ("A", s"id-$i")) ++
        (1001 to 3000).map(i => ("B", s"id-$i"))).toDF("k", "v")
    val pair = Sketch.hllSetAlgebra(df, "k", "v", p = 12).collect().head
    val whole = Sketch.hllDistinct(df, "v", p = 12).collect().head
    assert(pair.getAs[Double]("est_union") ==
      whole.getAs[Double]("est_distinct"))
  }

  test("hll on empty input estimates 0, not NaN") {
    val empty = Seq.empty[String].toDF("v")
    val r = Sketch.hllDistinct(empty, "v", p = 12).collect().head
    assert(r.getAs[Long]("occupied") == 0L)
    assert(r.getAs[Double]("est_distinct") == 0.0)
  }

  test("histogram quantiles land within one bin of the exact percentile") {
    // values 1.00 .. 100.00 dollars (cents 100..10000), $1 bins
    val cents = (1 to 10000 by 100).flatMap(c => Seq.fill(3)(c.toLong)).toDF("c")
    val est = Sketch.histogramQuantiles(cents, col("c"), binWidthCents = 100L,
        quantilesBp = Seq(5000, 9000, 9900, 10000))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sorted = cents.collect().map(_.getLong(0)).sorted
    for ((bp, e) <- est) {
      val exact = sorted(math.ceil(bp / 10000.0 * sorted.length).toInt - 1) / 100.0
      assert(math.abs(e - exact) <= 1.0, s"q$bp: est $e vs exact $exact")
    }
  }

  test("persisted histogram table: replayed appends dedup away; equals one-shot; compacts") {
    val cents = (1 to 10000 by 100).flatMap(c => Seq.fill(3)(c.toLong))
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "c")
    val path = java.nio.file.Files
      .createTempDirectory("graft_histq").resolve("t").toString
    Sketch.appendHistogram(cents.filter(col("id") % 2 === 0), col("c"),
      binWidthCents = 100L, path, batchId = "even")
    Sketch.appendHistogram(cents.filter(col("id") % 2 === 1), col("c"),
      binWidthCents = 100L, path, batchId = "odd")
    // at-least-once: the odd batch lands twice — read-side dedup absorbs it
    Sketch.appendHistogram(cents.filter(col("id") % 2 === 1), col("c"),
      binWidthCents = 100L, path, batchId = "odd")
    val qsBp = Seq(5000, 9000, 9900)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val oneShot = m(Sketch.histogramQuantiles(cents, col("c"),
      binWidthCents = 100L, quantilesBp = qsBp))
    assert(m(Sketch.histogramQuantilesFromTable(spark, path, 100L, qsBp))
      == oneShot)
    // value-preserving fold
    val (before, after) = Sketch.compactHistogram(spark, path)
    assert(after <= before && after >= 1)
    assert(m(Sketch.histogramQuantilesFromTable(spark, path, 100L, qsBp))
      == oneShot)
  }

  test("persisted CMS counter table: replayed appends dedup; probe == one-shot; compacts") {
    val occ = (1 to 300).map(i => s"tok${i % 17}").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_cms").resolve("t").toString
    Sketch.appendCmsCounters(occ.filter(col("id") % 2 === 0), "v", path,
      batchId = "even", depth = 3, width = 64)
    Sketch.appendCmsCounters(occ.filter(col("id") % 2 === 1), "v", path,
      batchId = "odd", depth = 3, width = 64)
    Sketch.appendCmsCounters(occ.filter(col("id") % 2 === 1), "v", path,
      batchId = "odd", depth = 3, width = 64) // at-least-once replay
    val cand = occ.select(col("v")).distinct()
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val oneShot = m(Sketch.cmsHeavyHitters(occ, "v", k = 17, depth = 3,
      width = 64))
    assert(m(Sketch.cmsHeavyHittersFromTable(spark, path, cand, "v",
      k = 17, depth = 3, width = 64)) == oneShot)
    val (b, a) = Sketch.compactCms(spark, path)
    assert(a <= b && a >= 1)
    assert(m(Sketch.cmsHeavyHittersFromTable(spark, path, cand, "v",
      k = 17, depth = 3, width = 64)) == oneShot)
  }

  test("persisted HLL register table: max-merge absorbs replays; estimate == one-shot") {
    val rows = (1 to 500).map(i => (i.toLong, s"user${i % 311}"))
      .toDF("id", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_hll").resolve("t").toString
    Sketch.appendHllRegisters(rows.filter(col("id") % 2 === 0), "v", path,
      batchId = "even", p = 8)
    Sketch.appendHllRegisters(rows.filter(col("id") % 2 === 1), "v", path,
      batchId = "odd", p = 8)
    Sketch.appendHllRegisters(rows.filter(col("id") % 2 === 1), "v", path,
      batchId = "odd", p = 8) // replay — max is idempotent AND deduped
    def one(df: org.apache.spark.sql.DataFrame) = df.collect().head
    val fromTable = one(Sketch.hllDistinctFromTable(spark, path, p = 8))
    val oneShot = one(Sketch.hllDistinct(rows, "v", p = 8))
    assert(fromTable == oneShot)
    val (b, a) = Sketch.compactHll(spark, path)
    assert(a <= b && a >= 1)
    assert(one(Sketch.hllDistinctFromTable(spark, path, p = 8)) == oneShot)
  }

  test("joinEstimate: uniform-containment estimate near the true join size; broadcast side") {
    // fact: 2000 rows over 100 distinct keys; dim: one row per key
    val fact = (1 to 2000).map(i => (i.toLong, i % 100)).toDF("id", "k")
    val dim = (0 until 100).map(i => (i, s"d$i")).toDF("k", "name")
    val est = Sketch.joinEstimate(
        Sketch.columnProfile(fact, Seq("k"), p = 12), "k",
        Sketch.columnProfile(dim, Seq("k"), p = 12), "k")
      .collect().head
    val trueRows = fact.join(dim, "k").count() // = 2000
    val predicted = est.getAs[Double]("est_join_rows")
    assert(math.abs(predicted - trueRows) / trueRows < 0.05,
      s"predicted $predicted vs true $trueRows")
    assert(est.getAs[String]("broadcast_side") == "right") // dim is smaller
    // an all-null key side estimates zero joinable rows
    val nulls = (1 to 50).map(_ => null: Integer).toDF("k")
    val zero = Sketch.joinEstimate(
        Sketch.columnProfile(nulls, Seq("k"), p = 12), "k",
        Sketch.columnProfile(dim, Seq("k"), p = 12), "k")
      .collect().head
    assert(zero.getAs[Double]("est_join_rows") == 0.0)
  }

  test("columnProfile: exact base counts, HLL estimate near truth, all-null column kept") {
    val df = (1 to 500).map(i =>
        (i.toLong, s"cat${i % 7}", if (i % 5 == 0) null else s"v$i",
          null: String))
      .toDF("id", "cat", "sparse", "dead")
    val prof = Sketch.columnProfile(df, Seq("id", "cat", "sparse", "dead"),
        p = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(prof.keySet == Set("id", "cat", "sparse", "dead"))
    // exact counts: every column sees all 500 rows; nulls counted per column
    assert(prof("id")._1 == 500 && prof("id")._2 == 0)
    assert(prof("sparse")._2 == 100)
    assert(prof("dead") == ((500L, 500L, 0.0))) // all-null column kept, est 0
    // estimates: low-cardinality exact-ish, high-cardinality within 10%
    assert(math.abs(prof("cat")._3 - 7.0) < 1.0)
    assert(math.abs(prof("id")._3 - 500.0) / 500.0 < 0.10)
  }

  test("persisted profile table: mixed SUM/MAX fold absorbs replays; profile == one-shot; compacts") {
    val df = (1 to 500).map(i =>
        (i.toLong, s"cat${i % 7}", if (i % 5 == 0) null else s"v$i"))
      .toDF("id", "cat", "sparse")
    val cols = Seq("id", "cat", "sparse")
    val path = java.nio.file.Files
      .createTempDirectory("graft_prof").resolve("t").toString
    Sketch.appendColumnProfile(df.filter(col("id") % 2 === 0), cols, path,
      batchId = "even", p = 10)
    Sketch.appendColumnProfile(df.filter(col("id") % 2 === 1), cols, path,
      batchId = "odd", p = 10)
    Sketch.appendColumnProfile(df.filter(col("id") % 2 === 1), cols, path,
      batchId = "odd", p = 10) // replay — the SUM half NEEDS the dedup
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getDouble(5))).toMap
    val oneShot = m(Sketch.columnProfile(df, cols, p = 10))
    assert(m(Sketch.columnProfileFromTable(spark, path, p = 10)) == oneShot)
    // a replayed SUM row would have doubled n_rows — prove it did not
    assert(oneShot("id")._1 == 500)
    val (b, a) = Sketch.compactProfile(spark, path)
    assert(a <= b && a >= 1)
    assert(m(Sketch.columnProfileFromTable(spark, path, p = 10)) == oneShot)
  }

  test("persisted Bloom bit table: OR-merge absorbs replays; probe == one-shot; no false negatives") {
    val rows = (1 to 400).map(i => (i.toLong, s"val${i % 211}"))
      .toDF("id", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_bloom").resolve("t").toString
    Sketch.appendBloomBits(rows.filter(col("id") % 2 === 0), "v", path,
      batchId = "even", mBits = 1 << 12, numHashes = 3)
    Sketch.appendBloomBits(rows.filter(col("id") % 2 === 1), "v", path,
      batchId = "odd", mBits = 1 << 12, numHashes = 3)
    Sketch.appendBloomBits(rows.filter(col("id") % 2 === 1), "v", path,
      batchId = "odd", mBits = 1 << 12, numHashes = 3) // replay — OR is idempotent
    val probe = (0 until 300).map(i => (i.toLong, s"val$i"))
      .toDF("pid", "v") // vals 0..210 present, 211..299 unseen
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val oneShot = m(Sketch.bloomProbe(probe, "v",
      Sketch.bloomBits(rows, "v", mBits = 1 << 12, numHashes = 3),
      mBits = 1 << 12, numHashes = 3))
    val fromTable = m(Sketch.bloomProbeFromTable(spark, path, probe, "v",
      mBits = 1 << 12, numHashes = 3))
    assert(fromTable == oneShot)
    // the bloom contract itself: every truly-present value flags true
    assert((0 until 211).forall(i => fromTable(i.toLong)))
    // value-preserving fold
    val (b, a) = Sketch.compactBloom(spark, path)
    assert(a <= b && a >= 1)
    assert(m(Sketch.bloomProbeFromTable(spark, path, probe, "v",
      mBits = 1 << 12, numHashes = 3)) == oneShot)
  }

  test("histogram quantiles reject negative cents (DIV truncation domain)") {
    val cents = Seq(-100L, 100L, 200L).toDF("c")
    val e = intercept[Exception] {
      Sketch.histogramQuantiles(cents, col("c"), binWidthCents = 100L,
        quantilesBp = Seq(5000)).collect()
    }
    assert(e.getMessage.contains("negative cents")
      || e.getCause != null && e.getCause.getMessage.contains("negative cents"))
  }

  test("histogram quantile ranks use rational ceil, not double ceil") {
    // 15000 rows: ceil(0.9 * 15000) must be 13500 — the double product
    // rounds UP to 13500.000000000002 and a double ceil would skip to
    // 13501. All rows in one bin -> est depends directly on r.
    val cents = (1 to 15000).map(_ => 100L).toDF("c")
    val est = Sketch.histogramQuantiles(cents, col("c"), binWidthCents = 100L,
        quantilesBp = Seq(9000))
      .collect().head.getDouble(1)
    // bin 1, cum_before 0, cnt 15000: est = (100 + 100*13500 div 15000)/100
    assert(est == (100L + 100L * 13500L / 15000L) / 100.0)
  }

  test("bloom filter has no false negatives; false positives stay bounded") {
    val present = (1 to 1000).map(i => s"val-$i").toDF("v")
    val absent = (1 to 1000).map(i => s"other-$i").toDF("v")
    // small filter (4096 bits, ~1 bit per key at k=4) to make false
    // positives measurable; theoretical FPR ~ (1-exp(-4*1000/4096))^4 ~ 15%
    val bits = Sketch.bloomBits(present, "v", mBits = 4096, numHashes = 4)
    val inFlags = Sketch.bloomProbe(present, "v", bits, mBits = 4096,
      numHashes = 4)
    assert(inFlags.filter(!col("maybe_present")).count() == 0) // no FN, ever
    val fp = Sketch.bloomProbe(absent, "v", bits, mBits = 4096, numHashes = 4)
      .filter(col("maybe_present")).count()
    assert(fp < 400, s"false-positive count $fp out of theory's ballpark")
    // duplicate probe rows must STILL flag present (the sum===k form
    // regressed here: a collapsed duplicate group summed to 2k matches)
    val dupProbe = present.limit(10).unionAll(present.limit(10))
    val dupFlags = Sketch.bloomProbe(dupProbe, "v", bits, mBits = 4096,
      numHashes = 4)
    assert(dupFlags.count() == 10) // duplicates collapse, documented
    assert(dupFlags.filter(!col("maybe_present")).count() == 0)
  }
}

class RobustSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Robust

  test("MAD fences catch planted outliers and resist masking") {
    // 100 values near 50 (spread 0..9) + 20 plants at 1000: heavy enough
    // contamination that a 3-sigma rule MASKS (sigma inflates past the
    // plants' own deviation and flags nothing); the MAD fence, with its
    // 50% breakdown point, still flags exactly the 20 plants.
    val base = (1 to 100).map(i => ("a", 50.0 + (i % 10)))
    val plants = Seq.fill(20)(("a", 1000.0))
    val out = Robust.madOutlierStats((base ++ plants).toDF("g", "v"), "g", "v")
      .collect().head
    assert(out.getAs[Long]("n") == 120L)
    assert(out.getAs[Long]("n_outliers") == 20L)
    assert(out.getAs[Double]("med") >= 50.0 && out.getAs[Double]("med") <= 59.0)
    // the mean/sigma rule on the same data: fully masked
    val vs = (base ++ plants).map(_._2)
    val mean = vs.sum / vs.size
    val sigma = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
    assert(vs.count(v => math.abs(v - mean) > 3 * sigma) == 0)
  }

  test("constant column: MAD 0, everything off-median is an outlier") {
    val df = (Seq.fill(20)(("k", 7.0)) ++ Seq(("k", 8.0))).toDF("g", "v")
    val out = Robust.madOutlierStats(df, "g", "v").collect().head
    assert(out.getAs[Double]("mad") == 0.0)
    assert(out.getAs[Long]("n_outliers") == 1L)
  }
}

class DsirSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Split

  // two disjoint vocabularies: docs 1-20 speak the target's language,
  // docs 21-40 speak another; the target corpus is drawn from vocab A
  private val vocabA = "alpha beta gamma delta epsilon"
  private val vocabB = "zork quux blarg wibble frotz"
  private val raw = ((1 to 20).map(i => (i.toLong, vocabA)) ++
    (21 to 40).map(i => (i.toLong, vocabB))).toDF("id", "text")
  private val target = (1 to 10).map(i => (100L + i, vocabA)).toDF("id", "text")

  test("dsir: target-matching docs outweigh off-distribution docs") {
    val w = Split.dsirLogWeights(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 40)
    val aMin = (1 to 20).map(i => w(i.toLong)).min
    val bMax = (21 to 40).map(i => w(i.toLong)).max
    assert(aMin > bMax,
      s"target-vocab min $aMin should beat off-vocab max $bMax")
    // identical text -> identical weight (pure function of content)
    assert(w(1L) == w(2L) && w(21L) == w(22L))
  }

  test("dsir: empty-text docs are absent, not scored") {
    val withEmpty = raw.union(Seq((99L, "")).toDF("id", "text"))
    val ids = Split.dsirLogWeights(withEmpty, target, "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(99L) && ids.size == 40)
  }

  test("dsir resample: exactly k rows, deterministic, keeps the key order") {
    val w = Split.dsirLogWeights(raw, target, "id", "text")
    val s1 = Split.dsirResample(w, "id", k = 15).collect()
    val s2 = Split.dsirResample(w, "id", k = 15).collect()
    assert(s1.length == 15)
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    val keys = s1.map(_.getAs[Double]("gumbel_key")).toSeq
    assert(keys == keys.sorted.reverse, "rows must come highest-key first")
    // weights dominate noise here: the selected set leans target-vocab
    assert(s1.count(_.getLong(0) <= 20) >= 10)
  }
}

class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Split

  private val corpus = (1 to 1000).map(i =>
    (i.toLong, Seq("a", "b", "c")(i % 3))).toDF("id", "src")

  test("largest-remainder allocation hits the exact total and hand counts") {
    // 7 * 101 / 10000 floors to 0.0707 -> floors 70/29/1 = 100, remainders
    // 0.07/0.29/0.01 of 101: floor 70+29+1=100, leftover 1 goes to the
    // largest remainder
    val out = Split.mixtureSample(corpus, "src", "id",
      Seq("a" -> 7000, "b" -> 2900, "c" -> 100), total = 101L)
    val counts = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // floors: 70 (rem 7000*101%10000=7000), 29 (rem 2900*101%10000=2900+...)
    // computed: a: 70.7 -> 70 r 7000; b: 29.29 -> 29 r 2900; c: 1.01 -> 1 r 100
    // leftover = 101 - 100 = 1 -> goes to a (largest remainder)
    assert(counts == Map("a" -> 71, "b" -> 29, "c" -> 1))
    assert(out.count() == 101)
  }

  test("a short source contributes everything it has, visibly") {
    val tiny = (1 to 10).map(i => (i.toLong, if (i <= 2) "rare" else "big"))
      .toDF("id", "src")
    val out = Split.mixtureSample(tiny, "src", "id",
      Seq("rare" -> 5000, "big" -> 5000), total = 10L)
    val counts = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") == 2)   // target 5, only 2 exist
    assert(counts("big") == 5)
  }

  test("selection is a pure function of ids: input order cannot change it") {
    val a = Split.mixtureSample(corpus, "src", "id",
      Seq("a" -> 6000, "b" -> 3000, "c" -> 1000), 60L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Split.mixtureSample(corpus.orderBy(rand(123)), "src", "id",
      Seq("a" -> 6000, "b" -> 3000, "c" -> 1000), 60L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.size == 60)
  }

  test("mixtureSample validates weights") {
    intercept[IllegalArgumentException] {
      Split.mixtureSample(corpus, "src", "id", Seq("a" -> 5000), 10L)
    }
    intercept[IllegalArgumentException] {
      Split.mixtureSample(corpus, "src", "id",
        Seq("a" -> 5000, "a" -> 5000), 10L)
    }
  }

  test("family cap: at most cap survivors per family, singletons kept") {
    val docs = (1L to 20L).map(i => (i, s"doc $i")).toDF("id", "text")
    // one 4-family {1,2,3,4} (chained), one pair {10,11}, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Split.capPerFamily(docs, "id", pairs, cap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val byId = got.map(g => g._1 -> g).toMap
    // family label = min id of the component
    assert(Seq(1L, 2L, 3L, 4L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(10L, 11L).map(byId(_)._2).distinct == Seq(10L))
    // exactly cap=2 of the 4-family kept; the pair family keeps both
    assert(got.count(g => g._2 == 1L && g._4) == 2)
    assert(Seq(10L, 11L).forall(byId(_)._4))
    // singletons rank 1, kept
    assert(byId(7L)._3 == 1 && byId(7L)._4 && byId(7L)._2 == 7L)
    // ranks within a family are 1..n without gaps
    assert(got.filter(_._2 == 1L).map(_._3).sorted.toSeq == Seq(1, 2, 3, 4))
    // deterministic under re-run
    val again = Split.capPerFamily(docs, "id", pairs, cap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("token budget: hard ceiling per group, prefix-closed, deterministic") {
    val docs = (1L to 30L).map(i =>
      (i, if (i <= 15) "a" else "b", "ten tokens of text " + ("w " * 6).trim))
      .toDF("id", "grp", "text") // every doc = 10 tokens
    val got = Split.tokenBudgetSample(docs, "grp", "id", "text",
        budgets = Seq("a" -> 45L), defaultBudget = 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // budget 45 over 10-token docs: exactly 4 kept (the 5th would cross)
    val aKept = got.filter(g => g._2 == "a" && g._5)
    assert(aKept.length == 4, s"kept ${aKept.length}")
    assert(aKept.map(_._4).max == 40)
    // kept set is prefix-closed in cum order: every kept cum < every
    // dropped cum within the group
    val aDropped = got.filter(g => g._2 == "a" && !g._5)
    assert(aKept.map(_._4).max < aDropped.map(_._4).min)
    // group b under the default budget keeps all 15 (150 <= 1000)
    assert(got.count(g => g._2 == "b" && g._5) == 15)
    // deterministic under re-run
    val again = Split.tokenBudgetSample(docs, "grp", "id", "text",
        budgets = Seq("a" -> 45L), defaultBudget = 1000L)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).sortBy(_._1)
    assert(again.toSeq == got.map(g => (g._1, g._5)).sortBy(_._1).toSeq)
  }

  test("curriculum shards: equal sizes, monotone quality bands") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = graft.operators.Pack
      .curriculumShards(docs, "doc_id", "text", nShards = 5)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.map(_._1).toSeq == (1 to 5))
    // ntile: shard sizes within one of each other, all docs covered
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    assert(got.map(_._2).sum == docs.count())
    // quality bands are monotone non-increasing across shards
    val bands = got.sortBy(_._1).toSeq
    for (Seq(a, b) <- bands.sliding(2))
      assert(a._3 >= b._4, s"shard ${a._1} min ${a._3} < shard ${b._1} max ${b._4}")
  }

  test("repeat mixture: integer factors exact, fractional near-target, both directions") {
    val docs = (1L to 400L).map(i =>
      (i, if (i <= 200) "up" else "down", "t")).toDF("id", "grp", "text")
    val got = Split.repeatMixture(docs, "grp", "id",
        factors = Seq("up" -> 2.5, "down" -> 0.3))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // every "up" doc appears 2 or 3 times, copies numbered 1..n
    val byId = got.groupBy(_._1)
    for ((id, rows) <- byId if rows.head._2 == "up") {
      assert(rows.length == 2 || rows.length == 3, s"doc $id: ${rows.length}")
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length))
    }
    // fractional halves land near 50% of 200 (hash uniformity, wide band)
    val upTotal = got.count(_._2 == "up")
    assert(upTotal > 200 * 2.2 && upTotal < 200 * 2.8, s"up=$upTotal")
    // down-sampling: ~30% of docs keep one copy, none get two
    val downIds = byId.filter(_._2.head._2 == "down")
    assert(downIds.values.forall(_.length == 1))
    assert(downIds.size > 200 * 0.15 && downIds.size < 200 * 0.45,
      s"down=${downIds.size}")
    // deterministic under re-run
    val again = Split.repeatMixture(docs, "grp", "id",
        factors = Seq("up" -> 2.5, "down" -> 0.3))
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(identity)
    assert(again.toSeq == got.map(g => (g._1, g._4)).sortBy(identity).toSeq)
  }

  test("group-aware split: clusters move atomically, singletons deterministic") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    // two clusters: {1,2,3} (chained) and {50,51}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L)).toDF("id_a", "id_b")
    val got = Split.groupAwareSplit(docs, "id", pairs, trainBp = 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(g => g._1 -> g).toMap
    // cluster members share the representative (the min id) AND the split
    for (c <- Seq(Seq(1L, 2L, 3L), Seq(50L, 51L))) {
      assert(c.map(byId(_)._2).distinct == Seq(c.min))
      assert(c.map(byId(_)._3).distinct.size == 1)
    }
    // singletons represent themselves; re-running yields the identical split
    assert(byId(7L)._2 == 7L)
    val again = Split.groupAwareSplit(docs, "id", pairs, trainBp = 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // the cut is roughly 80/20 over 100 keys (hash uniformity, loose band)
    val train = got.count(_._3 == "train")
    assert(train > 60 && train < 95, s"train=$train of 100")
    // string-keyed corpora work too (no forced numeric cast on the rep)
    val sdocs = Seq(("a", "t"), ("b", "t"), ("c", "t")).toDF("id", "text")
    val spairs = Seq(("a", "b")).toDF("id_a", "id_b")
    val sgot = Split.groupAwareSplit(sdocs, "id", spairs)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(sgot("a")._1 == "a" && sgot("b")._1 == "a" && sgot("c")._1 == "c")
    assert(sgot("a")._2 == sgot("b")._2)
  }
}

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key needs no shuffle") {
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "a")
    val dims = (0 to 99).map(i => (i.toLong, s"d$i")).toDF("k", "b")
    for (tbl <- Seq("bkt_facts", "bkt_dims")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      // a previous JVM's managed-table directory survives while the
      // in-memory catalog does not — creating over the leftover location
      // throws, so clear it explicitly
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    Sinks.writeBucketedTable(facts, "bkt_facts", "k", buckets = 8)
    Sinks.writeBucketedTable(dims, "bkt_dims", "k", buckets = 8)
    // co-located: both sides pre-hashed into the same 8 buckets, so the
    // sort-merge join reads them bucket-by-bucket with ZERO exchanges —
    // the 100 TB lever for repeated fact/fact joins on a stable key
    val joined = spark.table("bkt_facts")
      .join(spark.table("bkt_dims").hint("merge"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1000)
  }
}

class VersionedSpec extends SparkSpec {
  import spark.implicits._
  import graft.etl.Versioned

  private def freshRoot() = java.nio.file.Files
    .createTempDirectory("graft_versioned").resolve("t").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("append/read/time-travel: head sees all commits, old versions stay exact") {
    val root = freshRoot()
    val a = (1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "v")
    val b = (51 to 80).map(i => (i.toLong, s"b$i")).toDF("id", "v")
    assert(Versioned.currentVersion(root) == 0)
    assert(Versioned.append(a, root) == 1)
    assert(Versioned.append(b, root) == 2)
    assert(Versioned.versions(root) == Seq(1L, 2L))
    assert(ids(Versioned.read(spark, root)) == (1L to 80L).toSet)
    assert(ids(Versioned.read(spark, root, Some(1L))) == (1L to 50L).toSet)
  }

  test("compaction rewrites the head without touching prior snapshots") {
    val root = freshRoot()
    Versioned.append((1 to 40).map(i => (i.toLong, i % 5)).toDF("id", "g"), root)
    Versioned.append((41 to 60).map(i => (i.toLong, i % 5)).toDF("id", "g"), root)
    val v1Files = Versioned.read(spark, root, Some(1L)).inputFiles.toSet
    val v3 = Versioned.compact(spark, root, targetFiles = 1)
    assert(v3 == 3)
    assert(ids(Versioned.read(spark, root)) == (1L to 60L).toSet)
    // the head now reads exactly one rewritten file...
    assert(Versioned.read(spark, root).inputFiles.length == 1)
    // ...and version 1 still resolves its ORIGINAL files, byte-identical
    assert(Versioned.read(spark, root, Some(1L)).inputFiles.toSet == v1Files)
    assert(ids(Versioned.read(spark, root, Some(1L))) == (1L to 40L).toSet)
  }

  test("orphans from a crashed commit are invisible to every reader") {
    val root = freshRoot()
    Versioned.append((1 to 30).map(i => (i.toLong, "x")).toDF("id", "v"), root)
    // simulate a crash after the data write, before the manifest rename:
    // a full, valid parquet directory that no manifest references
    val orphan = new java.io.File(root, "data/orphan-crashed-commit")
    (100 to 110).map(i => (i.toLong, "ghost")).toDF("id", "v")
      .write.parquet(orphan.getAbsolutePath)
    assert(ids(Versioned.read(spark, root)) == (1L to 30L).toSet)
    // expire garbage-collects it without disturbing the live snapshot
    val (manifestsDropped, dirsDropped) = Versioned.expire(root, keepLast = 5)
    assert(manifestsDropped == 0 && dirsDropped == 1)
    assert(!orphan.exists())
    assert(ids(Versioned.read(spark, root)) == (1L to 30L).toSet)
  }

  test("expire drops old manifests and their now-unreferenced files") {
    val root = freshRoot()
    Versioned.append((1 to 20).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    Versioned.append((21 to 40).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    Versioned.compact(spark, root, targetFiles = 1)
    val (manifestsDropped, dirsDropped) = Versioned.expire(root, keepLast = 1)
    // v1/v2 manifests dropped; both append commit dirs now unreferenced
    // (the compacted head references only its own rewrite)
    assert(manifestsDropped == 2 && dirsDropped == 2)
    assert(Versioned.versions(root) == Seq(3L))
    assert(ids(Versioned.read(spark, root)) == (1L to 40L).toSet)
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root, Some(1L))
    }
  }

  test("readChanges: per-commit deltas; empty range; fail-loud across a compaction") {
    val root = freshRoot()
    Versioned.append((1 to 40).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    Versioned.append((41 to 70).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    Versioned.append((71 to 90).map(i => (i.toLong, "c")).toDF("id", "v"), root)
    // each commit's delta is exactly its own rows
    assert(ids(Versioned.readChanges(spark, root, 1L, Some(2L)))
      == (41L to 70L).toSet)
    assert(ids(Versioned.readChanges(spark, root, 2L)) == (71L to 90L).toSet)
    // from == to: an empty delta with the right schema
    val empty = Versioned.readChanges(spark, root, 3L, Some(3L))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "v"))
    // a compaction inside the range replaces files: the diff must refuse
    Versioned.compact(spark, root, targetFiles = 1)
    val e = intercept[IllegalStateException] {
      Versioned.readChanges(spark, root, 2L)
    }
    assert(e.getMessage.contains("not append-only"))
    // ...but a post-compaction append diffs fine from the new anchor
    Versioned.append((91 to 95).map(i => (i.toLong, "d")).toDF("id", "v"), root)
    assert(ids(Versioned.readChanges(spark, root, 4L)) == (91L to 95L).toSet)
  }

  test("manifest stats prune whole files; carried stats survive later commits") {
    val root = freshRoot()
    def ranged(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v").repartitionByRange(2, col("id"))
    Versioned.appendWithStats(ranged(1, 100), root, "id")
    Versioned.appendWithStats(ranged(101, 200), root, "id")
    val all = Versioned.read(spark, root).inputFiles.length
    assert(all == 4) // 2 commits x 2 range files
    // a scan of [1, 40] must SKIP commit 2 entirely and half of commit 1
    val pruned = Versioned.readPruned(spark, root, "id", 1L, 40L)
    assert(pruned.inputFiles.length < all / 2 + 1,
      s"expected file skipping, read ${pruned.inputFiles.length}/$all files")
    assert(ids(pruned) == (1L to 40L).toSet) // exact despite pruning
    // a plain append AFTER the stats commits carries their stats forward
    Versioned.append((201 to 210).map(i => (i.toLong, "x")).toDF("id", "v"), root)
    val pruned2 = Versioned.readPruned(spark, root, "id", 150L, 160L)
    // commit 1 skipped by stats; commit 3 (no stats) must still be read
    assert(ids(pruned2) == (150L to 160L).toSet)
    assert(pruned2.inputFiles.length < Versioned.read(spark, root).inputFiles.length)
    // an out-of-range scan over only-stats files reads nothing but keeps schema
    val none = Versioned.readPruned(spark, root, "id", 500L, 600L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
  }

  test("clustered compaction creates prunability ingest never had") {
    val root = freshRoot()
    // ingest-ordered appends: interleaved stripes, no stats recorded
    Versioned.append((1 to 200 by 2).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root)
    Versioned.append((2 to 200 by 2).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v"), root)
    // pre-rewrite: no stats anywhere, a ranged read must open every file
    val before = Versioned.readPruned(spark, root, "id", 1L, 20L)
    assert(before.inputFiles.length ==
      Versioned.read(spark, root).inputFiles.length)
    // OPTIMIZE ... CLUSTER BY id: range-partitioned rewrite + stats
    val v3 = Versioned.compact(spark, root, targetFiles = 4,
      clusterBy = Some("id"))
    assert(v3 == 3)
    val all = Versioned.read(spark, root)
    assert(all.inputFiles.length == 4)
    assert(ids(all) == (1L to 200L).toSet) // rewrite changes no value
    // the SAME ranged read now skips disjoint range files
    val after = Versioned.readPruned(spark, root, "id", 1L, 20L)
    assert(after.inputFiles.length < all.inputFiles.length,
      s"expected pruning after clustered rewrite, " +
        s"read ${after.inputFiles.length}/${all.inputFiles.length}")
    assert(ids(after) == (1L to 20L).toSet)
  }

  test("deleteWhere: CoW row delete with file skipping, null-keep, time travel") {
    val root = freshRoot()
    def ranged(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, if (i % 10 == 0) null else s"v$i"))
      .toDF("id", "v").repartitionByRange(2, col("id"))
    Versioned.appendWithStats(ranged(1, 100), root, "id", Some("lower"))
    Versioned.appendWithStats(ranged(101, 200), root, "id", Some("upper"))
    val upperFiles = Versioned.readPruned(spark, root, "id", 101L, 200L)
      .inputFiles.toSet
    // delete even ids in [1,50]; the prune range spares the upper commit
    val v3 = Versioned.deleteWhere(spark, root,
      col("id") <= 50 && col("id") % 2 === 0,
      pruneRange = Some(("id", 1L, 50L)), key = Some("purge"))
    assert(v3 == 3)
    val expect = (1L to 200L).toSet -- (1L to 50L).filter(_ % 2 == 0)
    assert(ids(Versioned.read(spark, root)) == expect)
    // the upper commit's files are carried BY REFERENCE — byte-identical
    // paths in the new head, zero rewrite IO at 100 TB for a ranged purge
    assert(upperFiles.subsetOf(Versioned.read(spark, root).inputFiles.toSet))
    // rewritten files re-recorded stats: a ranged read still prunes
    assert(Versioned.readPruned(spark, root, "id", 1L, 10L)
      .inputFiles.length < Versioned.read(spark, root).inputFiles.length)
    // the pre-delete snapshot still time-travels intact
    assert(ids(Versioned.read(spark, root, Some(2L))) == (1L to 200L).toSet)
    // keyed replay: the retried delete is a no-op on the same version
    assert(Versioned.deleteWhere(spark, root, col("id") <= 50,
      key = Some("purge")) == 3)
    // a prune range no file can hold elides the commit entirely
    // (every v3 line carries stats: carried upper + re-recorded rewrite)
    assert(Versioned.deleteWhere(spark, root, col("id") > 10000,
      pruneRange = Some(("id", 10001L, 20000L))) == 3)
    // NULL predicate keeps the row (SQL DELETE semantics): deleting
    // where v = 'nope' must not drop the null-v rows
    val v4 = Versioned.deleteWhere(spark, root, col("v") === "nope")
    assert(v4 == 4)
    assert(ids(Versioned.read(spark, root)) == expect)
  }

  test("mergeInto: CoW upsert with file skipping; empty updates no-op") {
    val root = freshRoot()
    def ranged(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v").repartitionByRange(2, col("id"))
    Versioned.appendWithStats(ranged(1, 100), root, "id", Some("lower"))
    Versioned.appendWithStats(ranged(101, 200), root, "id", Some("upper"))
    val upperFiles = Versioned.readPruned(spark, root, "id", 101L, 200L)
      .inputFiles.toSet
    // a lower-half-only batch: its key range [10, 20] skips the upper files
    val updates = (10 to 20).map(i => (i.toLong, s"NEW$i"))
      .toDF("id", "v")
    val v3 = Versioned.mergeInto(spark, root, updates, "id",
      statsCol = Some("id"), key = Some("m1"))
    assert(v3 == 3)
    val head = Versioned.read(spark, root)
    assert(head.count() == 200) // pure update, no inserts yet
    val vById = head.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (10 to 20).foreach(i => assert(vById(i.toLong) == s"NEW$i"))
    assert(vById(9L) == "v9" && vById(21L) == "v21" && vById(150L) == "v150")
    // upper files carried by reference (the updates' key range skipped them)
    assert(upperFiles.subsetOf(head.inputFiles.toSet))
    // keyed replay no-ops
    assert(Versioned.mergeInto(spark, root, updates, "id",
      statsCol = Some("id"), key = Some("m1")) == 3)
    // inserts: unmatched keys append; matched keys replace, in one commit
    val batch2 = Seq((15L, "B15"), (300L, "B300"), (301L, "B301"))
      .toDF("id", "v")
    assert(Versioned.mergeInto(spark, root, batch2, "id",
      statsCol = Some("id")) == 4)
    val head2 = ids(Versioned.read(spark, root))
    assert(head2 == (1L to 200L).toSet ++ Set(300L, 301L))
    assert(Versioned.read(spark, root).filter(col("id") === 15)
      .head().getString(1) == "B15")
    // empty updates: no-op at the current version
    assert(Versioned.mergeInto(spark, root, updates.limit(0), "id") == 4)
    // pre-merge snapshots still time-travel intact
    assert(ids(Versioned.read(spark, root, Some(2L))) == (1L to 200L).toSet)
  }

  test("history: one row per retained version with commit key and file count") {
    val root = freshRoot()
    Versioned.append((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), root,
      key = Some("k1"))
    Versioned.append((11 to 20).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    val h = Versioned.history(spark, root).orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(h.length == 2)
    assert(h(0)._1 == 1L && h(0)._2 == "k1" && h(0)._3 >= 1)
    assert(h(1)._1 == 2L && h(1)._2 == null) // unkeyed commit
    assert(h(1)._3 >= h(0)._3) // v2 carries v1's files plus its own
    // expire trims the history to the retained tail
    Versioned.expire(root, keepLast = 1)
    assert(Versioned.history(spark, root).count() == 1)
  }

  test("schema evolution: a later commit adds a column; merged read backfills nulls") {
    val root = freshRoot()
    Versioned.append((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), root)
    Versioned.append((11 to 20).map(i => (i.toLong, s"v$i", i * 10))
      .toDF("id", "v", "extra"), root)
    val merged = Versioned.read(spark, root, mergeSchema = true)
    assert(merged.columns.sorted.toSeq == Seq("extra", "id", "v"))
    assert(merged.count() == 20)
    // rows from before the column existed read as null, new rows carry it
    assert(merged.filter(col("extra").isNull).count() == 10)
    assert(merged.filter(col("id") === 15L).head().getAs[Int]("extra") == 150)
    // time travel still sees v1's own schema, unwidened
    assert(Versioned.read(spark, root, Some(1L)).columns.toSeq == Seq("id", "v"))
  }

  test("consumeChanges: checkpointed at-least-once consumer over the change feed") {
    val root = freshRoot()
    val ck = new java.io.File(root, "consumer/last.version").getAbsolutePath
    var seen = Set.empty[Long]
    def drain() = Versioned.consumeChanges(spark, root, ck) { delta =>
      seen ++= delta.select("id").collect().map(_.getLong(0))
    }
    assert(drain().isEmpty) // nothing committed yet
    Versioned.append((1 to 20).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    assert(drain().contains((0L, 1L))) // first run = full snapshot
    assert(seen == (1L to 20L).toSet)
    Versioned.append((21 to 30).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    Versioned.append((31 to 35).map(i => (i.toLong, "c")).toDF("id", "v"), root)
    seen = Set.empty
    assert(drain().contains((1L, 3L))) // two pending commits in one delta
    assert(seen == (21L to 35L).toSet) // ONLY the delta, no rescan
    assert(drain().isEmpty) // caught up
  }

  test("keyed commits are idempotent: a replayed append no-ops at the commit level") {
    val root = freshRoot()
    val a = (1 to 30).map(i => (i.toLong, "a")).toDF("id", "v")
    val b = (31 to 50).map(i => (i.toLong, "b")).toDF("id", "v")
    assert(Versioned.append(a, root, key = Some("batch-a")) == 1)
    assert(Versioned.append(b, root, key = Some("batch-b")) == 2)
    // the replay: same key -> returns the existing version, no new commit
    assert(Versioned.append(b, root, key = Some("batch-b")) == 2)
    assert(Versioned.versions(root) == Seq(1L, 2L))
    assert(ids(Versioned.read(spark, root)) == (1L to 50L).toSet)
    assert(Versioned.versionForKey(root, "batch-a").contains(1L))
    assert(Versioned.versionForKey(root, "nope").isEmpty)
    // versioned profile rides this: replayed batch, still == one-shot
    val df = (1 to 200).map(i => (i.toLong, s"c${i % 5}")).toDF("id", "c")
    val proot = freshRoot()
    graft.operators.Sketch.appendColumnProfileVersioned(
      df.filter(col("id") <= 100), Seq("id", "c"), proot, "b1", p = 10)
    graft.operators.Sketch.appendColumnProfileVersioned(
      df.filter(col("id") > 100), Seq("id", "c"), proot, "b2", p = 10)
    graft.operators.Sketch.appendColumnProfileVersioned(
      df.filter(col("id") > 100), Seq("id", "c"), proot, "b2", p = 10)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(m(graft.operators.Sketch.columnProfileFromVersioned(spark, proot,
      p = 10)) == m(graft.operators.Sketch.columnProfile(df, Seq("id", "c"),
      p = 10)))
  }

  test("the manifest publish is a fail-loud CAS against a second writer") {
    val root = freshRoot()
    Versioned.append((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), root)
    // a second writer races us from the same base (version 1) and wins:
    // its v2 manifest lands between our base read and our publish
    val stolen = new java.io.File(root, "_manifests/v00002.manifest")
    val w = new java.io.FileWriter(stolen)
    try w.write("data/someone-elses-commit/part-0.parquet\n") finally w.close()
    val e = intercept[IllegalStateException] {
      Versioned.publishAt(root, 2L, Seq("data/our-commit/part-0.parquet"))
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the loser's attempt must not have clobbered the winner
    assert(Versioned.currentVersion(root) == 2L)
    // a writer that instead REBASES (rereads the head) commits cleanly
    val v3 = Versioned.append(
      (11 to 20).map(i => (i.toLong, "b")).toDF("id", "v"), root)
    assert(v3 == 3L)
  }

  test("keyed commits survive a same-JVM table rebuild: no stale key-cache hit") {
    // the r9 ADVICE scenario: a table at `root` is deleted and recreated
    // in the same JVM; a keyed append whose key matched a PRE-rebuild
    // version must land as a real commit, not no-op off a stale memo
    val root = freshRoot()
    val a = (1 to 10).map(i => (i.toLong, "a")).toDF("id", "v")
    assert(Versioned.append(a, root, key = Some("batch-1")) == 1)
    assert(Versioned.versionForKey(root, "batch-1").contains(1L))
    // nuke and recreate the table at the same root
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmAll)
      f.delete(); ()
    }
    rmAll(new java.io.File(root))
    val b = (11 to 20).map(i => (i.toLong, "b")).toDF("id", "v")
    assert(Versioned.append(b, root, key = Some("other")) == 1)
    // same (root, version) pair as the pre-rebuild keyed commit, but a
    // DIFFERENT manifest: batch-1 must be unknown here
    assert(Versioned.versionForKey(root, "batch-1").isEmpty)
    val v2 = Versioned.append(a, root, key = Some("batch-1"))
    assert(v2 == 2L)
    assert(ids(Versioned.read(spark, root)) == (1L to 20L).toSet)
  }

  test("mergeInto rejects pruning stats recorded on a non-key column") {
    val root = freshRoot()
    Versioned.appendWithStats(
      (1 to 10).map(i => (i.toLong, i.toLong * 2)).toDF("id", "w"),
      root, "w")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark,
        root, Seq((1L, 99L)).toDF("id", "w"), keyCol = "id",
        statsCol = Some("w"))
    }
    assert(e.getMessage.contains("merge key"))
  }
}
