package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH
  * (random-hyperplane) bucketed variant as the scale path.
  *
  * Scale design: the query set is small and broadcast; the corpus streams
  * through scoring map-side (no shuffle of vectors), and only (query_id,
  * corpus_id, sim) tuples — 24 bytes — reach the top-k shuffle. The LSH
  * variant prunes scoring to same-bucket rows so corpus scans drop from
  * O(Q×N) to O(Q×N/2^bits) expected. Hyperplanes are pseudo-random but
  * deterministic (hash-derived), so results are reproducible with no RNG
  * state shipped to executors.
  */
object Knn {

  /** Dot product of two equal-length float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0, 0.0).otherwise(d / n)
  }

  /** Exact brute-force top-k: for each row of `queries`, the k nearest
    * corpus rows by cosine. Queries are broadcast (small side); ties break
    * on corpus id for determinism.
    * Output: query_id, neighbor_id, rank, cosine_sim. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1] for
    * (plane p, dimension d): derived from xxhash64 — no RNG object. */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** Sign-bit bucket id from `numPlanes` random hyperplanes: bit p is 1 iff
    * dot(vec, plane_p) > 0. Vectors in the same bucket are likely close in
    * angle (classic SRP-LSH). Column form — for bulk bucketing use
    * [[withSrpBucket]] (higher-order functions are interpreted per plane). */
  def srpBucket(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bulk SRP bucketing: posexplode the vectors once and compute every
    * plane projection in ONE codegen'd hash aggregation (map-side partial
    * agg, so the shuffle carries one row per vector per partition), then
    * join the bucket back by id. ~10x the Column form on bulk data. */
  def withSrpBucket(df: DataFrame, idCol: String, vecCol: String,
                    numPlanes: Int, out: String = "__bucket"): DataFrame = {
    val exploded = df.select(col(idCol).as("__bid"), posexplode(col(vecCol)))
      .toDF("__bid", "__d", "__x")
    val projs = exploded.groupBy(col("__bid"))
      .agg(sum(col("__x").cast("double") * planeComponent(0, col("__d"))).as("__p0"),
        (1 until numPlanes).map(p =>
          sum(col("__x").cast("double") * planeComponent(p, col("__d"))).as(s"__p$p")): _*)
    val bucket = (0 until numPlanes)
      .map(p => when(col(s"__p$p") > 0, shiftleft(lit(1L), p)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    df.join(projs.select(col("__bid"), bucket.as(out)),
      col(idCol) === col("__bid")).drop("__bid")
  }

  /** Approximate top-k: score only corpus rows whose SRP bucket matches the
    * query's (single-probe). Recall < 1.0 by construction; raise
    * `numPlanes` for smaller buckets or lower it for higher recall.
    * Same output shape as [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = withSrpBucket(queries, idCol, vecCol, numPlanes, "__qb")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__qb"))
    val c = withSrpBucket(corpus, idCol, vecCol, numPlanes, "__cb")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__cb"))
    val scored = c.join(broadcast(q), col("__qb") === col("__cb") &&
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
  }

  /** IVF index: (centroids, inverted lists). Centroids = the first `nlist`
    * corpus vectors by id (deterministic seeding; real deployments would
    * run k-means — the assignment/probe machinery is identical either way).
    * Each corpus vector lands in its nearest centroid's list.
    *
    * IVF economics, measured at 20k vectors / 64 lists: building the index
    * costs corpus x nlist similarity evaluations — MORE than brute-forcing
    * a handful of queries (10 queries = corpus x 10). The index pays off
    * when it is built ONCE (persist the returned frames) and queried many
    * times, or when the query set is large relative to nlist.
    */
  def ivfIndex(corpus: DataFrame, nlist: Int, idCol: String = "vec_id",
               vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val centroids = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("__cent_id"), col(vecCol).as("__cent"))
    val lists = assignToCentroids(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      centroids, "neighbor_id", "__cv", keep = 1)
    (centroids, lists)
  }

  private def assignToCentroids(df: DataFrame, centroids: DataFrame,
                                id: String, vec: String, keep: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id))
      .orderBy(col("__csim").desc, col("__cent_id").asc)
    df.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine(col(vec), col("__cent")))
      .withColumn("__crank", row_number().over(w))
      .filter(col("__crank") <= keep)
      .drop("__cent", "__csim", "__crank")
  }

  /** Search a pre-built IVF index: each query probes its `nprobe` nearest
    * lists, scanning ~nprobe/nlist of the corpus. */
  def ivfSearch(index: (DataFrame, DataFrame), queries: DataFrame, k: Int,
                nprobe: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (centroids, lists) = index
    val probes = assignToCentroids(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
      centroids, "query_id", "__qv", keep = nprobe)
    val scored = lists.join(broadcast(probes), Seq("__cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
  }

  /** Convenience: build + search in one call (index amortization lost —
    * see [[ivfIndex]] for when that matters). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    ivfSearch(ivfIndex(corpus, nlist, idCol, vecCol), queries, k, nprobe,
      idCol, vecCol)

  /** Embedding-cosine near-duplicate pairs: all (a,b) pairs with cosine >=
    * threshold, bucket-pruned by SRP-LSH (pairs must share a bucket). */
  def cosineNearDups(df: DataFrame, threshold: Double = 0.95, numPlanes: Int = 8,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = withSrpBucket(df, idCol, vecCol, numPlanes, "__b")
      .select(col(idCol).as("__id"), col(vecCol).as("__v"), col("__b"))
    v.as("l").join(v.as("r"),
        col("l.__b") === col("r.__b") && col("l.__id") < col("r.__id"))
      .withColumn("cosine_sim", cosine(col("l.__v"), col("r.__v")))
      .filter(col("cosine_sim") >= threshold)
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
  }
}
