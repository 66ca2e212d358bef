package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column (SemDeDup, Abbas et al.
  * 2023, arXiv:2303.09540): k-means-cluster the embedding space, find
  * cosine-near-duplicate pairs WITHIN each cluster only, connected-
  * components the pair graph, keep one representative (min id) per group.
  *
  * Why clustering, not LSH, at 100 TB: the within-cluster self-join is
  * the SemDeDup trick — candidate generation cost drops from corpus^2 to
  * sum over clusters of |cluster|^2, and the cluster assignment reuses the
  * IVF k-means machinery ([[Knn.ivfIndexKMeans]]) that the ANN path
  * already maintains, so the same index serves search AND dedup. The
  * shuffle key is the cluster id (ints), partial aggregation everywhere;
  * skewed clusters are bounded by nlist sizing (SemDeDup's paper uses
  * k ~ sqrt(n)).
  *
  * [[semanticDedupPortable]] is the verification twin: SRP-bucketed
  * portable-hash pairs ([[Knn.cosineNearDupsPortable]]) + exact min-label
  * CC + keep-min, every float a deterministic fold — DuckDB replays the
  * whole composition (q80). The k-means default is rows-only checkable
  * (Lloyd centroids are not SQL-expressible); SemanticDedupSpec pins its
  * recall on planted noisy duplicates instead.
  */
object SemanticDedup {

  /** Within-cluster cosine-near-dup pairs over a PREBUILT k-means IVF
    * index (the "index built once, serves search AND dedup" path — an ANN
    * pipeline that already maintains [[Knn.ivfIndexKMeans]]'s index pays
    * zero extra clustering cost for dedup). The caller owns the index
    * lifecycle: its cached lists are NOT released here, and the returned
    * pairs read them lazily. */
  def semanticDupPairs(index: Knn.IvfIndex, threshold: Double): DataFrame = {
    // lists: (neighbor_id, __cv, __cent_id), persisted+materialized
    val side = index.lists.select(col("neighbor_id").as("__id"),
        col("__cv").as("__v"), col("__cent_id"))
      .withColumn("__n", Knn.norm(col("__v")))
    side.as("l").join(side.as("r"),
        col("l.__cent_id") === col("r.__cent_id") &&
          col("l.__id") < col("r.__id"))
      .withColumn("cosine_sim",
        when(col("l.__n") * col("r.__n") === 0.0, lit(0.0))
          .otherwise(Knn.dot(col("l.__v"), col("r.__v")) /
            (col("l.__n") * col("r.__n"))))
      .filter(col("cosine_sim") >= threshold)
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
  }

  /** Within-cluster cosine-near-dup pairs: (id_a, id_b, cosine_sim),
    * id_a < id_b, both members of the same k-means cluster. Builds a
    * throwaway index; prefer the [[Knn.IvfIndex]] overload when the ANN
    * path already maintains one. */
  def semanticDupPairs(corpus: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", nlist: Int = 16,
                       iters: Int = 3, threshold: Double = 0.95): DataFrame = {
    val index = Knn.ivfIndexKMeans(corpus, nlist, iters, idCol, vecCol)
    // pin the pair set before releasing the index's cached lists — a
    // lazy consumer would otherwise recompute the whole k-means lineage
    val pairs = semanticDupPairs(index, threshold).transform(Checkpoints.ckpt)
    index.unpersist()
    pairs
  }

  /** SemDeDup keep-set over a PREBUILT index (see the pairs overload for
    * the lifecycle contract): `corpus` must be the frame the index was
    * built from, `idCol` its id column. */
  def semanticDedup(corpus: DataFrame, idCol: String,
                    index: Knn.IvfIndex, threshold: Double,
                    maxIter: Int): DataFrame =
    keepRepresentatives(corpus, idCol,
      semanticDupPairs(index, threshold), maxIter)

  /** SemDeDup keep-set: corpus rows minus every non-representative member
    * of a semantic-duplicate group (min id per connected component is the
    * representative — deterministic, no centroid-distance tie-break). */
  def semanticDedup(corpus: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding", nlist: Int = 16,
                    iters: Int = 3, threshold: Double = 0.95,
                    maxIter: Int = 10): DataFrame = {
    val pairs = semanticDupPairs(corpus, idCol, vecCol, nlist, iters, threshold)
    keepRepresentatives(corpus, idCol, pairs, maxIter)
  }

  /** The verification twin: portable-hash SRP buckets instead of k-means
    * (every arithmetic step a deterministic fold), exact CC, keep-min. */
  def semanticDedupPortable(corpus: DataFrame, idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            threshold: Double = 0.9,
                            numPlanes: Int = 8,
                            maxIter: Int = 10): DataFrame = {
    val pairs = Knn.cosineNearDupsPortable(corpus, threshold, numPlanes,
      idCol, vecCol)
    keepRepresentatives(corpus, idCol, pairs, maxIter)
  }

  private def keepRepresentatives(corpus: DataFrame, idCol: String,
                                  pairs: DataFrame, maxIter: Int): DataFrame = {
    val losers = Dedup.connectedComponents(pairs, maxIter)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("__loser"))
    corpus.join(losers, col(idCol) === col("__loser"), "left_anti")
  }
}
