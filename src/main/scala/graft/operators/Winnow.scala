package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003; the MOSS algorithm). The guarantee the scheme buys over
  * plain k-gram sampling: any shared substring of length >= k + w - 1
  * chars between two documents is CAUGHT by at least one shared
  * fingerprint (every window of w consecutive k-gram hashes contributes
  * its minimum, so a long-enough match contains a full shared window and
  * therefore a shared minimum). Expected density is 2/(w+1) of all
  * k-grams — a position-independent sample with a locality guarantee
  * that uniform (mod-p) hash sampling lacks.
  *
  * Where this sits in the dedup ladder: exact digest < normalized digest
  * < span (paragraph) digest < WINNOWING (substring-level, guaranteed
  * local) < MinHash/SimHash (whole-doc set similarity, probabilistic).
  * It is the right tool for "document B embeds two paragraphs of
  * document A verbatim inside otherwise-new text": whole-doc MinHash
  * dilutes the match below tau, span dedup needs identical paragraph
  * boundaries, winnowing catches any >= k+w-1 char run at any
  * alignment. Reference scope: Mat-hack/edu-data-pipeline fingerprints
  * duplicates only at whole-row granularity (src/quality/dedup.py); this
  * is the substring-granular generalization from the published
  * literature.
  *
  * Physical shape (the 100 TB path): fingerprints are computed entirely
  * PER ROW with nested higher-order functions — no char-level explode,
  * no per-character shuffle, no window function. Each doc emits only its
  * ~2n/(w+1) DISTINCT fingerprints; the only shuffles in the overlap
  * report are the fingerprint-keyed candidate self-join (64-bit keys,
  * AQE-splittable) and the bounded per-pair count agg. The gram-hash
  * array is bound once per row and the sliding minima read it back
  * (slice), so each gram pays exactly one md5 — map-side CPU traded for
  * ZERO extra shuffle rows, the right trade when the shuffle, not the
  * CPU, is the scale bottleneck.
  *
  * Normalization: k-grams are taken over the canonical token stream
  * (lowercased words joined by single spaces), so whitespace runs and
  * case never break a match — the same canonical form the normalized
  * dedup rung uses. The hash is the portable md5 chain
  * ([[Dedup.portableHash64]]) so the DuckDB oracle replays it exactly.
  */
object Winnow {

  /** DISTINCT winnowing fingerprints per document: (idCol, `fp`).
    *
    * `k` = char-gram length, `w` = window size (match guarantee
    * threshold t = k + w - 1 chars). A doc shorter than k chars
    * contributes its whole canonical text as one gram; one with fewer
    * than w grams contributes the single minimum over all of them. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4, seed: Int = 17): DataFrame = {
    require(k >= 2 && w >= 1, "winnow: k >= 2, w >= 1")
    val s = concat_ws(" ", TextOps.tokens(lower(col(textCol))))
    // n k-gram start positions; substr truncates at the end so a short
    // doc yields exactly one whole-text gram. The gram-hash array is
    // BOUND as its own projection so each md5 evaluates once per gram;
    // the sliding minima then read the materialized array (slice), not
    // re-derive the hash — 1 md5/gram instead of w (measured 2.4 s ->
    // sub-second on the sf0.1 overlap query).
    val sc = col("__s")
    val n = greatest(length(sc) - lit(k - 1), lit(1))
    val hashes = transform(sequence(lit(1), n),
      i => Dedup.portableHash64(sc.substr(i, lit(k)), seed))
    df.select(col(idCol), s.as("__s"))
      .filter(length(sc) > 0)
      .select(col(idCol), hashes.as("__hs"))
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(1), greatest(size(col("__hs")) - lit(w - 1), lit(1))),
          j => array_min(slice(col("__hs"), j, lit(w)))))).as("fp"))
  }

  /** Write a corpus's winnowing fingerprints as a maintained parquet
    * table — (id, fp, ingest) plus a one-row `meta` subtable freezing
    * (k, w, seed) so probes can never drift from the build parameters.
    * The production analogue of recomputing the corpus's fingerprints
    * every batch (the [[Dedup.writeBucketTable]] convention applied to
    * the winnowing rung): ingestion cost becomes O(batch), never
    * O(corpus). `ingestStamp` -1 marks the seed build. */
  def writeFingerprintTable(existing: DataFrame, path: String,
                            idCol: String, textCol: String,
                            k: Int = 8, w: Int = 4, seed: Int = 17,
                            ingestStamp: Long = -1L): Unit = {
    val spark = existing.sparkSession
    fingerprints(existing, idCol, textCol, k, w, seed)
      .select(col(idCol).as("id"), col("fp"))
      .withColumn("ingest", lit(ingestStamp))
      .write.mode("overwrite").parquet(s"$path/fps")
    import spark.implicits._
    Seq((k, w, seed)).toDF("k", "w", "seed")
      .write.mode("overwrite").parquet(s"$path/meta")
    metaCache.remove(path)
  }

  /** Append a batch's fingerprints under its stamp (parameters come from
    * the table's meta — callers cannot desynchronize them). */
  def appendToFingerprintTable(batch: DataFrame, path: String,
                               idCol: String, textCol: String,
                               ingestStamp: Long): Unit = {
    val m = readMeta(batch.sparkSession, path)
    fingerprints(batch, idCol, textCol, m.k, m.w, m.seed)
      .select(col(idCol).as("id"), col("fp"))
      .withColumn("ingest", lit(ingestStamp))
      .write.mode("append").parquet(s"$path/fps")
  }

  /** Incoming batch vs the PERSISTED fingerprint table: pairs
    * (incoming_id, existing_id, shared, n_in, n_ex, overlap) with
    * shared >= `minShared`. The existing side is READ — its text is
    * never rescanned, its fingerprints never recomputed. `beforeIngest`
    * bounds the visible corpus for exactly-once streaming replay
    * (re-processed batches must not match rows they themselves wrote —
    * the [[Dedup.minhashNearDupsAgainstTable]] convention). */
  def overlapAgainstTable(incoming: DataFrame, path: String,
                          idCol: String, textCol: String,
                          minShared: Int = 3,
                          beforeIngest: Option[Long] = None): DataFrame = {
    val spark = incoming.sparkSession
    val m = readMeta(spark, path)
    val all = spark.read.parquet(s"$path/fps")
    val ex = beforeIngest.map(b => all.filter(col("ingest") < b)).getOrElse(all)
      .select(col("id").as("existing_id"), col("fp")).distinct()
    val inc = fingerprints(incoming, idCol, textCol, m.k, m.w, m.seed)
      .select(col(idCol).as("incoming_id"), col("fp"))
      .transform(Checkpoints.ckpt) // consumers: sizes + join
    val nIn = inc.groupBy(col("incoming_id")).agg(count(lit(1)).as("n_in"))
    val nEx = ex.groupBy(col("existing_id")).agg(count(lit(1)).as("n_ex"))
    inc.join(ex, "fp")
      .groupBy(col("incoming_id"), col("existing_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(nIn, "incoming_id")
      .join(nEx, "existing_id")
      .select(col("incoming_id"), col("existing_id"), col("shared"),
        col("n_in"), col("n_ex"),
        (col("shared").cast("double") / least(col("n_in"), col("n_ex")))
          .as("overlap"))
  }

  /** Drop incoming docs whose substring overlap with the persisted
    * corpus crosses (`minShared`, `minOverlap`) — the filter form of
    * [[overlapAgainstTable]] for ingestion: survivors are the docs NOT
    * substantially contained in (or containing) anything already
    * ingested. */
  def dropAgainstTable(incoming: DataFrame, path: String,
                       idCol: String, textCol: String,
                       minShared: Int = 3, minOverlap: Double = 0.5,
                       beforeIngest: Option[Long] = None): DataFrame = {
    val hits = overlapAgainstTable(incoming, path, idCol, textCol,
        minShared, beforeIngest)
      .filter(col("overlap") >= minOverlap)
      .select(col("incoming_id").as(idCol)).distinct()
    incoming.join(hits, Seq(idCol), "left_anti")
  }

  private case class Meta(k: Int, w: Int, seed: Int)
  // meta is immutable for a table's lifetime (writeFingerprintTable
  // invalidates) — probes skip the one-row parquet read after first touch
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Meta]()
  private def readMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String): Meta =
    metaCache.computeIfAbsent(path, _ => {
      val r = spark.read.parquet(s"$path/meta").head()
      Meta(r.getAs[Int]("k"), r.getAs[Int]("w"), r.getAs[Int]("seed"))
    })

  /** Pairwise substring-overlap report over a corpus: doc pairs sharing
    * at least `minShared` winnowing fingerprints, with the containment
    * ratio shared / min(|A|, |B|) (1.0 = the smaller doc's sampled
    * content appears wholly in the larger).
    *
    * Output: (id_a, id_b, shared, n_a, n_b, overlap) with id_a < id_b.
    * At corpus scale the candidate join must be preceded by dropping
    * stop-fingerprints (fingerprints appearing in > F docs are
    * boilerplate, q156's finding, and only fan out the join); the
    * `maxDocFreq` knob does exactly that. */
  def overlapReport(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, w: Int = 4, seed: Int = 17,
                    minShared: Int = 3,
                    maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w, seed)
      .transform(Checkpoints.ckpt) // consumers: per-doc sizes, join (x2)
    val sizes = fps.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val usable =
      if (maxDocFreq == Long.MaxValue) fps
      else {
        val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDocFreq).select("fp")
        fps.join(hot, Seq("fp"), "left_anti")
      }
    val pairs = usable.as("a")
      .join(usable.as("b"),
        col("a.fp") === col("b.fp") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(sizes.select(col(idCol).as("id_a"), col("__n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("__n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared"),
        col("n_a"), col("n_b"),
        (col("shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("overlap"))
  }
}
