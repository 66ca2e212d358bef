package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding ANN (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): split each vector into `m`
  * subvectors, quantize every subvector to its nearest codeword from a
  * per-subspace codebook, and answer queries with asymmetric distance
  * computation (ADC) — the query stays exact, the corpus is `m` small
  * integer codes per vector (64-dim float32 → 4 bytes at m=4: 64x
  * compression, the memory shape that lets a 100 TB vector corpus fit an
  * ANN serving tier at all).
  *
  * Everything is relational — codebooks are FRAMES (bounded at
  * m x nseeds rows), broadcast into every join; the corpus is touched
  * once to encode and once per query batch to score. No driver-side
  * collect anywhere (the complementary shape to [[Knn.IvfIndex]]'s
  * bounded centroid metadata). Codebook training here is deterministic
  * seeding (the first `nseeds` corpus vectors by id — [[Knn.ivfIndex]]'s
  * convention); Lloyd refinement of codebooks composes exactly like
  * [[Knn.ivfIndexKMeans]] and changes nothing downstream, since every
  * consumer sees only the (cid, j, subvec) frame.
  *
  * Cross-engine float discipline: subvector distances are left-fold
  * sums of (x-y)*(x-y) doubles (IEEE-order-identical in the oracle's
  * list_reduce); ADC sums the m per-subspace terms through
  * round-6 DECIMAL(25,6) — order-independent — and ranks tie-break on
  * the neighbor id.
  */
object Pq {

  /** Squared L2 distance between two equal-length vectors — the native
    * codegen kernel ([[graft.expr.VectorSqDist]]; bit-identical to the
    * HOF fold [[sqDistComposed]], which stays as the executable spec). */
  def sqDist(a: Column, b: Column): Column =
    graft.expr.GraftFunctions.vectorSqDist(a, b)

  /** The pure-Column composition of [[sqDist]] (the spec form). */
  def sqDistComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  private def subvec(vec: Column, j: Column, subDim: Int): Column =
    slice(vec, j * subDim + 1, lit(subDim))

  /** Per-subspace codebook from deterministic seeds: the first `nseeds`
    * corpus vectors by id, split into `m` subvectors of `dim / m` dims.
    * Output: (cid 0-based, j 0-based, subvec) — m x nseeds rows of
    * bounded index metadata. */
  def codebook(corpus: DataFrame, idCol: String, vecCol: String,
               dim: Int, m: Int, nseeds: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"codebook: m must divide dim ($dim % $m)")
    require(nseeds >= 1, "codebook: nseeds >= 1")
    val subDim = dim / m
    val seeds = corpus.where(size(col(vecCol)) === dim)
      .orderBy(col(idCol)).limit(nseeds)
      .withColumn("cid", row_number().over(Window.orderBy(col(idCol))) - 1)
    seeds.select(col("cid"),
        explode(sequence(lit(0), lit(m - 1))).as("j"), col(vecCol).as("__v"))
      .select(col("cid"), col("j"),
        subvec(col("__v"), col("j"), subDim).as("subvec"))
  }

  /** Lloyd-refined per-subspace codebooks: seed with [[codebook]], then
    * `iters` rounds of encode → per-(subspace, code) mean — k-means run
    * independently in each subspace, which is exactly how FAISS trains PQ
    * codebooks. Refinement only touches the codebook FRAME, so every
    * consumer ([[encode]], [[adcSearch]], [[save]]) is unchanged; empty
    * codes keep their previous centroid (the [[Knn.ivfIndexKMeans]]
    * convention). Training cost per round is one encode pass (corpus x
    * m x nseeds, map-side-combined argmin) + one bounded mean agg;
    * distortion is non-increasing per Lloyd's guarantee (PqSpec measures
    * it). Means are float k-means — the refined variant is rows-only in
    * the driver gate (the q55 convention); the ADC machinery it feeds is
    * hash-verified via the seeded twin (q134/q135/q143). */
  def codebookKMeans(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, nseeds: Int, iters: Int): DataFrame = {
    require(iters >= 0, "codebookKMeans: iters >= 0")
    val subDim = dim / m
    val base = corpus.where(size(col(vecCol)) === dim)
      .select(col(idCol), col(vecCol).as("__v"))
    var cb = codebook(corpus, idCol, vecCol, dim, m, nseeds)
      .transform(Checkpoints.ckpt)
    for (_ <- 0 until iters) {
      val codes = encode(base, cb, idCol, "__v", dim, m)
      // per-(j, code) mean of member subvectors, dim-exploded so the agg
      // is (j, code, d) scalar cells — bounded at m x nseeds x subDim
      val means = base.join(codes, idCol)
        .select(col("j"), col("code"),
          posexplode(subvec(col("__v"), col("j"), subDim)))
        .toDF("j", "code", "d", "x")
        .groupBy(col("j"), col("code"), col("d"))
        .agg(avg(col("x").cast("double")).as("mx"))
        .groupBy(col("j"), col("code"))
        .agg(transform(sort_array(collect_list(struct(col("d"), col("mx")))),
          s => s.getField("mx")).as("subvec"))
      cb = cb.as("c")
        .join(means.as("n"),
          col("c.cid") === col("n.code") && col("c.j") === col("n.j"), "left")
        .select(col("c.cid").as("cid"), col("c.j").as("j"),
          coalesce(col("n.subvec"), col("c.subvec")).as("subvec"))
        .transform(Checkpoints.ckpt)
    }
    cb
  }

  /** Encode the corpus: nearest codeword per (vector, subspace), ties
    * broken on the lower cid. Output: (idCol, j, code) — the exploded
    * scalar shape (m rows per vector; pack with one id-keyed agg when a
    * serving sink wants arrays, as [[TextOps.encodeTokensPacked]] does
    * for tokens). The codebook joins broadcast; the corpus is scanned
    * once. */
  def encode(corpus: DataFrame, cb: DataFrame, idCol: String, vecCol: String,
             dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    corpus.where(size(col(vecCol)) === dim)
      .select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(cb))
      .withColumn("__d", sqDist(subvec(col("__v"), col("j"), subDim),
        col("subvec")))
      // argmin as a lexicographic struct-min hash agg (dist, then cid as
      // the tie-break): map-side combined, no sort — the shuffle carries
      // one partial row per (vector, subspace), never the nseeds fan-out
      // a window-rank formulation would sort
      .groupBy(col(idCol), col("j"))
      .agg(min(struct(col("__d"), col("cid"))).as("__m"))
      .select(col(idCol), col("j"), col("__m.cid").as("code"))
  }

  /** IVFADC (Jégou et al. 2011 §IV): coarse quantizer + PQ on RESIDUALS —
    * the composition that actually serves billion-vector corpora. Each
    * vector is assigned to its nearest of `nlist` coarse centroids
    * (deterministic id-order seeds, [[Knn.ivfIndex]]'s convention), its
    * residual (v - centroid) is PQ-encoded with ONE shared residual
    * codebook, and a query probes the `nprobe` nearest coarse lists,
    * scoring only their members by residual-ADC. Approximation is in
    * list coverage AND quantization; the ARITHMETIC is value-exact and
    * replayed end-to-end by the q135 oracle.
    *
    * Scale shape: coarse table (nlist rows) and residual codebook
    * (m x nseeds rows) broadcast everywhere; the corpus is touched twice
    * at index time (assign, encode — both map-side-combined struct-min
    * aggs) and only the probed lists join the query table at search
    * time (the (lid, j, code) equi-join keys make it a broadcast hash
    * join, never a corpus scan per query).
    * Output: (query_id, neighbor_id, rank, adc_dist). */
  def ivfadcSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, dim: Int, nlist: Int, m: Int,
                   nseeds: Int, k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nlist >= 1, "ivfadcSearch: nprobe, nlist >= 1")
    val base = corpus.where(size(col(vecCol)) === dim)
      .select(col(idCol), col(vecCol).as("__v"))
    // coarse centroids: first nlist vectors by id, lid 0-based
    val coarse = base.orderBy(col(idCol)).limit(nlist)
      .withColumn("lid", row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("lid"), col("__v").as("__cv"))
    def residual(v: Column, c: Column): Column =
      zip_with(v, c, (x, y) => x.cast("double") - y.cast("double"))
    // assign: argmin over coarse as a struct-min hash agg, then one
    // broadcast join back for the centroid to form the residual
    val assigned = base.crossJoin(broadcast(coarse))
      .withColumn("__d", sqDist(col("__v"), col("__cv")))
      .groupBy(col(idCol), col("__v"))
      .agg(min(struct(col("__d"), col("lid"))).as("__m"))
      .select(col(idCol), col("__v"), col("__m.lid").as("lid"))
      .join(broadcast(coarse), "lid")
      .select(col(idCol), col("lid"), residual(col("__v"), col("__cv"))
        .as("__r"))
    // one SHARED residual codebook + codes (standard IVFADC)
    val rcb = codebook(assigned, idCol, "__r", dim, m, nseeds)
    val rcodes = encode(assigned, rcb, idCol, "__r", dim, m)
      .join(assigned.select(col(idCol), col("lid")), idCol)
    // probe: nprobe nearest coarse lists per query, residual query per list
    val probes = queries.where(size(col(vecCol)) === dim)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(coarse))
      .withColumn("__cd", sqDist(col("__qv"), col("__cv")))
      .withColumn("__pr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("__cd"), col("lid"))))
      .where(col("__pr") <= nprobe)
      .select(col("query_id"), col("lid"),
        residual(col("__qv"), col("__cv")).as("__rq"))
    val qtab = probes.crossJoin(broadcast(rcb))
      .select(col("query_id"), col("lid"), col("j"), col("cid"),
        round(sqDist(subvec(col("__rq"), col("j"), dim / m), col("subvec")), 6)
          .cast("decimal(25,6)").as("__d"))
    rcodes.select(col(idCol).as("neighbor_id"), col("lid"), col("j"),
        col("code")).as("c")
      .join(broadcast(qtab.as("q")),
        col("c.lid") === col("q.lid") && col("c.j") === col("q.j") &&
          col("c.code") === col("q.cid"))
      .where(col("q.query_id") =!= col("c.neighbor_id"))
      .groupBy(col("q.query_id").as("query_id"),
        col("c.neighbor_id").as("neighbor_id"))
      .agg(sum(col("__d")).as("__adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__adc"), col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__adc").cast("double"), 6).as("adc_dist"))
  }

  /** Persist a PQ index (codebook + codes) as a table under `path` —
    * the serving shape: `codes/` is the corpus at m ints per vector,
    * `codebook/` is m x nseeds bounded metadata, `meta/` pins (dim, m)
    * so save and search can never disagree. The production analogue of
    * the in-session frames, like [[Knn.ivfSave]] for IVF. */
  def save(cb: DataFrame, codes: DataFrame, idCol: String, path: String,
           dim: Int, m: Int): Unit = {
    val spark = cb.sparkSession
    import spark.implicits._
    Seq((dim, m)).toDF("dim", "m").write.mode("overwrite")
      .parquet(s"$path/meta")
    cb.write.mode("overwrite").parquet(s"$path/codebook")
    codes.select(col(idCol), col("j"), col("code"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Reload a saved PQ index: (codebook, codes, dim, m). */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): (DataFrame, DataFrame, Int, Int) = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    (spark.read.parquet(s"$path/codebook"),
      spark.read.parquet(s"$path/codes"),
      meta.getAs[Int]("dim"), meta.getAs[Int]("m"))
  }

  /** ADC top-k: exact query subvectors against the codebook build the
    * per-query distance table (bounded m x nseeds rows per query,
    * broadcast); the encoded corpus joins it on (j, code) and sums the m
    * terms per (query, vector) through exact DECIMAL — one shuffle keyed
    * on (query, vector), then per-query top-k.
    * Output: (query_id, neighbor_id, rank, adc_dist). */
  def adcSearch(queries: DataFrame, codes: DataFrame, cb: DataFrame,
                queryIdCol: String, idCol: String, vecCol: String,
                dim: Int, m: Int, k: Int): DataFrame = {
    require(k >= 1, "adcSearch: k >= 1")
    val subDim = dim / m
    val qtab = queries.where(size(col(vecCol)) === dim)
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cb))
      .select(col("query_id"), col("j"), col("cid"),
        round(sqDist(subvec(col("__qv"), col("j"), subDim), col("subvec")), 6)
          .cast("decimal(25,6)").as("__d"))
    codes.select(col(idCol).as("neighbor_id"), col("j"), col("code")).as("c")
      .join(broadcast(qtab.as("q")),
        col("c.code") === col("q.cid") && col("c.j") === col("q.j"))
      .where(col("q.query_id") =!= col("c.neighbor_id"))
      .groupBy(col("q.query_id").as("query_id"),
        col("c.neighbor_id").as("neighbor_id"))
      .agg(sum(col("__d")).as("__adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__adc"), col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__adc").cast("double"), 6).as("adc_dist"))
  }
}
