package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, SemanticDedup}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // 200 seeded random unit-ish vectors (dim 16) + a noisy copy of every
  // tenth (id + 10000) — the planted semantic duplicates
  private def corpus() = {
    val rnd = new scala.util.Random(42)
    val base = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() - 0.5).toFloat))
    }
    val planted = base.filter(_._1 % 10 == 0).map { case (id, v) =>
      (id + 10000L, v.map(x => x + 0.01f * (x.hashCode % 3)))
    }
    (base ++ planted).toDF("vec_id", "embedding")
  }

  test("semanticDedup drops planted duplicates, keeps the original ids") {
    val df = corpus()
    val kept = SemanticDedup.semanticDedup(df, nlist = 8, iters = 2,
        threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val plantedIds = (0 until 200 by 10).map(_ + 10000L).toSet
    val dropped = plantedIds.filterNot(kept)
    // representatives are min-id, so every surviving group keeps its
    // ORIGINAL; originals must never be dropped in favour of a plant
    assert((0 until 200).forall(i => kept(i.toLong)))
    // within-cluster recall on near-identical plants: >= 90%
    assert(dropped.size >= plantedIds.size * 9 / 10,
      s"only ${dropped.size}/${plantedIds.size} planted dups removed")
  }

  test("reported pairs are real: every pair's exact cosine >= threshold") {
    val pairs = SemanticDedup.semanticDupPairs(corpus(), nlist = 8,
      iters = 2, threshold = 0.95)
    val exact = pairs.join(corpus().select(col("vec_id").as("id_a"),
        col("embedding").as("va")), "id_a")
      .join(corpus().select(col("vec_id").as("id_b"),
        col("embedding").as("vb")), "id_b")
      .withColumn("c", Knn.cosine(col("va"), col("vb")))
    assert(exact.filter(col("c") < 0.95).count() == 0)
    assert(pairs.count() > 0)
  }

  test("threshold 1.0 keeps everything when no exact duplicates exist") {
    val df = corpus()
    // cosine of distinct random vectors is < 1; nothing may be dropped
    val kept = SemanticDedup.semanticDedup(df, nlist = 8, iters = 1,
      threshold = 0.9999999)
    assert(kept.count() == df.count())
  }

  test("prebuilt-index overload: identical keep-set, caller keeps the index") {
    val df = corpus()
    val fresh = SemanticDedup.semanticDedup(df, nlist = 8, iters = 2,
      threshold = 0.95).select("vec_id").collect().map(_.getLong(0)).toSet
    val index = Knn.ivfIndexKMeans(df, nlist = 8, iters = 2)
    val reused = SemanticDedup.semanticDedup(df, "vec_id", index,
      threshold = 0.95, maxIter = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(reused == fresh)
    // the caller-owned index must still be usable for SEARCH afterwards —
    // the "one index serves search AND dedup" contract
    val hits = Knn.ivfSearch(index, df.filter(col("vec_id") < 3), k = 3,
      nprobe = 8)
    assert(hits.count() > 0)
    index.unpersist()
  }

  test("both variants only ever drop genuine brute-force near-dups") {
    val df = corpus()
    val clustered = SemanticDedup.semanticDedup(df, nlist = 8, iters = 2,
      threshold = 0.98).select("vec_id").collect().map(_.getLong(0)).toSet
    val portable = SemanticDedup.semanticDedupPortable(df, threshold = 0.98)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // both paths prune candidates differently (k-means lists vs SRP
    // buckets) but may only ever drop GENUINE near-dups: the drop sets
    // must both be subsets of the brute-force near-dup loser set
    val brute = {
      val v = df.select(col("vec_id").as("id"), col("embedding").as("v"))
      val losers = v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
        .withColumn("c", Knn.cosine(col("l.v"), col("r.v")))
        .filter(col("c") >= 0.98)
        .select(col("r.id")).distinct()   // keep-min: the larger id loses
        .collect().map(_.getLong(0)).toSet
      losers
    }
    val all = df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert((all -- clustered).subsetOf(brute))
    assert((all -- portable).subsetOf(brute))
  }
}
