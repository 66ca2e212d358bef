package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Pins [[Knn.ivfSearchBudgets]]'s prefix-property equivalence: one
  * assignment at the largest budget + `probe_rank <= p` filters must
  * reproduce a separate [[Knn.ivfSearch]] per budget row for row — the
  * q186/q201 probe-sweep collapse rides on exactly this. */
class IvfBudgetsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("ivfSearchBudgets == per-budget ivfSearch, every budget, row for row") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val idx = Knn.ivfIndex(emb, nlist = 8)
    try {
      val budgets = Seq(1, 2, 4, 8)
      val swept = Knn.ivfSearchBudgets(idx, queries, k = 5, budgets = budgets)
      for (p <- budgets) {
        val one = Knn.ivfSearch(idx, queries, k = 5, nprobe = p)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            col("cosine_sim"))
          .orderBy("query_id", "rank").collect().toSeq
        val block = swept.filter(col("nprobe") === p)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            col("cosine_sim"))
          .orderBy("query_id", "rank").collect().toSeq
        assert(block == one, s"budget $p diverged from ivfSearch")
      }
    } finally idx.unpersist()
  }
}

/** Regression for the r07 bench-JVM failure: q112 run FIRST on a fresh
  * session used to nest `ivfCache.computeIfAbsent` (the "reload" closure
  * built the "seed" entry on the SAME ConcurrentHashMap — a forbidden
  * recursive update that threw or livelocked whenever the two keys
  * shared a bin, which is exactly the bench's sorted execution order).
  * The fix hoists the seed build out of the closure; this pins it by
  * replaying the bench order on a session with no warm cache entries. */
class Ivf112FirstSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q112 as the session's first IVF query completes and matches brute force") {
    val fresh = spark.newSession() // distinct ivfCache key: nothing warm
    val out = Queries.q112KnnIvfReload(fresh, dir)
    val got = out.select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(got.nonEmpty)
    // nprobe = nlist must equal exact brute force (the q59 guarantee),
    // so the reloaded-index result is value-checked, not just non-empty.
    val emb = fresh.read.parquet(s"$dir/embeddings.parquet")
    val brute = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(got == brute)
  }
}
