package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the standard n-gram-overlap check every
  * pretraining pipeline runs before training (GPT-3 appendix C /
  * PaLM-style 8-gram collision rule): a training document is contaminated
  * if it shares at least one k-token shingle with the evaluation
  * benchmark, and must be dropped (or flagged) so test answers are not
  * memorized from the corpus.
  *
  * Scale shape: the benchmark side is SMALL by definition (eval suites,
  * not corpora) — its distinct shingle set broadcasts, so the training
  * corpus is scanned once, exploded to (doc, shingle), and semi-joined
  * with NO corpus-sized shuffle. At 100 TB replace the raw shingle
  * strings with xxhash64(shingle) on both sides (the join key drops from
  * ~50 bytes to 8; collision risk 2^-64 per pair is acceptable for a
  * drop-list); the string form here is the oracle-verifiable twin (q85).
  */
object Decontaminate {

  /** Contaminated training docs: (idCol, n_hits) where n_hits = how many
    * DISTINCT benchmark shingles the doc contains (>= 1 by construction —
    * clean docs don't appear; dropContaminated anti-joins them away). */
  def overlaps(training: DataFrame, benchmark: DataFrame, idCol: String,
               textCol: String, k: Int = 8): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingles(col(textCol), k)).as("__sh")).distinct()
    training
      .select(col(idCol), explode(array_distinct(
        Dedup.shingles(col(textCol), k))).as("__sh"))
      .join(broadcast(bench), "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Training corpus minus contaminated docs. */
  def dropContaminated(training: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, k: Int = 8): DataFrame =
    training.join(overlaps(training, benchmark, idCol, textCol, k)
        .select(col(idCol).as("__cid")),
      col(idCol) === col("__cid"), "left_anti")

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram rule: a paraphrased benchmark answer shares no 8-gram with
    * the eval set but sits right next to it in embedding space. Flags
    * every corpus row whose max cosine similarity against ANY benchmark
    * embedding reaches `threshold` (the Phi/FineWeb-style "semantic
    * overlap with eval" filter).
    *
    * Scale shape: the benchmark side is bounded (eval suites) — it
    * broadcasts, the corpus streams through map-side, and the per-corpus-
    * row argmax is ONE struct-max hash aggregation (the q134 convention —
    * no window, no corpus shuffle of vectors: the agg keys on the corpus
    * id, and partial aggregation collapses the |bench| candidates per row
    * map-side). Cost is |corpus| x |bench| dot products of codegen'd
    * kernels; for benchmark sets too big to broadcast, pre-bucket both
    * sides with SRP-LSH ([[Knn.cosineNearDupsPortable]]'s machinery) and
    * run this verify stage on candidates only.
    *
    * Ties on sim break toward the SMALLEST benchmark id (struct-max on
    * (sim, -bench_id)). `contaminated` compares the UNROUNDED sim (q81's
    * threshold convention); `max_sim` is reported rounded to 6.
    * Output: (idCol, best_bench_id, max_sim, contaminated). */
  def semanticOverlaps(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val bench = broadcast(benchmark
      .select(col(idCol).as("__bid"), col(vecCol).as("__bv"))
      .filter(col("__bv").isNotNull))
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull)
      .crossJoin(bench)
      .select(col(idCol),
        struct(Knn.cosine(col("__v"), col("__bv")).as("sim"),
          (-col("__bid")).as("negb")).as("__s"))
      .groupBy(col(idCol))
      .agg(max(col("__s")).as("m"))
      .select(col(idCol),
        (-col("m.negb")).as("best_bench_id"),
        round(col("m.sim"), 6).as("max_sim"),
        (col("m.sim") >= threshold).as("contaminated"))
  }

  /** Corpus minus semantically-contaminated rows (anti-join on the
    * flagged ids — the drop form of [[semanticOverlaps]]). */
  def dropSemanticContaminated(corpus: DataFrame, benchmark: DataFrame,
                               idCol: String, vecCol: String,
                               threshold: Double): DataFrame =
    corpus.join(
      semanticOverlaps(corpus, benchmark, idCol, vecCol, threshold)
        .filter(col("contaminated")).select(col(idCol).as("__cid")),
      col(idCol) === col("__cid"), "left_anti")

  /** Normalization-insensitive contamination check: [[overlaps]] after
    * canonicalizing BOTH sides with [[TextOps.normalizeForDedup]]
    * (lowercase, punctuation runs to spaces) — catches the leaks exact
    * shingling misses when the benchmark text was re-cased, re-punctuated
    * or re-flowed on its way into the crawl (the common real-world leak
    * shape: a quiz site reformatting benchmark questions). Same
    * broadcast-benchmark scale shape as [[overlaps]]. */
  def overlapsNormalized(training: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 8): DataFrame = {
    def norm(df: DataFrame) = df.select(col(idCol),
      TextOps.normalizeForDedup(col(textCol)).as(textCol))
    overlaps(norm(training), norm(benchmark), idCol, textCol, k)
  }

  /** Train/eval split-leakage audit: after any split (including the
    * family-safe [[Split.groupAwareSplit]]), count the k-token shingles
    * that occur on BOTH sides and the eval docs touched by one — the
    * n-gram-level check that catches what family-level safety cannot
    * (quotes, shared boilerplate, copied passages BELOW the near-dup
    * similarity threshold). A nonzero count is the signal to extend the
    * pair graph (containment pairs, winnowing) before trusting eval
    * numbers. `assignments` carries (idCol, splitCol ∈ {train, eval}).
    *
    * Scale shape: per-doc DISTINCT shingles explode once; ONE
    * shingle-keyed presence agg (two max flags, map-side combined — hot
    * boilerplate shingles collapse early); leaking docs via a semi-join
    * of the same exploded frame against the shared-shingle set. At
    * 100 TB shingles travel as xxhash64 digests (q85 note). Output: one
    * row (n_train_docs, n_eval_docs, n_shared_ngrams,
    * n_leaking_eval_docs). */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   assignments: DataFrame, splitCol: String,
                   k: Int = 8): DataFrame = {
    val sh = docs.select(col(idCol),
        explode(array_distinct(
          graft.expr.GraftFunctions.wordShingles(col(textCol), k))).as("__ng"))
      .join(assignments.select(col(idCol), col(splitCol).as("__sp")), idCol)
      .transform(Checkpoints.ckpt) // consumers: presence agg + leak semi-join
    val shared = sh.groupBy(col("__ng"))
      .agg(max(when(col("__sp") === "train", 1).otherwise(0)).as("__tr"),
        max(when(col("__sp") === "eval", 1).otherwise(0)).as("__ev"))
      .filter(col("__tr") === 1 && col("__ev") === 1)
      .select(col("__ng"))
      .transform(Checkpoints.ckpt) // consumers: count + semi-join
    val nShared = shared.agg(count(lit(1)).as("n_shared_ngrams"))
    val nLeaking = sh.filter(col("__sp") === "eval")
      .join(shared, "__ng", "left_semi")
      .select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_leaking_eval_docs"))
    val nBySplit = assignments.agg(
      sum(when(col(splitCol) === "train", 1L).otherwise(0L)).as("n_train_docs"),
      sum(when(col(splitCol) === "eval", 1L).otherwise(0L)).as("n_eval_docs"))
    nBySplit.crossJoin(nShared).crossJoin(nLeaking)
  }
}
