package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus: TF-IDF term weighting and BM25
  * keyword search (Robertson/Sparck Jones probabilistic relevance — the
  * reference's analytics layer has no search operator, but any corpus
  * pipeline that feeds retrieval-augmented training needs one; reference
  * transformations.py's text cleaning is the upstream of this family).
  *
  * Physical shape at 100 TB:
  *  - the (doc, token) term-frequency aggregate is the only corpus-sized
  *    shuffle, keyed by (doc_id, token) with map-side partial aggregation;
  *  - document-frequency and corpus-stat tables are VOCABULARY-sized and
  *    row-count-sized respectively — broadcast to the tf side, never
  *    shuffling the corpus again;
  *  - BM25 filters the term list to the query terms BEFORE any join, so
  *    the search path aggregates only matching postings (predicate pushes
  *    to the scan; a 3-term query over 100 TB touches the token explode
  *    but joins only the 3-term slice).
  *
  * Cross-engine float discipline (every score replays in DuckDB):
  * constants are decimal literals parsed identically by both engines
  * (0.75 / 0.25 are exact binary fractions; 1.2 / 2.2 parse to the same
  * nearest-double from the SAME literal text — never computed as k1+1 in
  * Scala, which can land one ulp away); every +,*,/ is written in the
  * same association order as the SQL oracle; ln() agrees across engines
  * (established by the q68 linear-counting gate); scores are rounded to 6
  * decimals BEFORE ranking so order-sensitive window ties cannot straddle
  * an ulp, and ties break on the token / doc_id column.
  */
object Rank {

  /** The (doc_id, token, tf) term-frequency frame — the ONE corpus-sized
    * aggregation every retrieval statistic derives from, materialized
    * eagerly (localCheckpoint) because its consumers (df, dl, postings)
    * are different aggregates over it: Catalyst prunes them into
    * NON-identical subtrees, so exchange reuse can never kick in and a
    * lazy tf would re-tokenize and re-shuffle the whole corpus once per
    * consumer (verified in RankSpec's plan assertion). At production
    * scale this frame is the inverted-index table you'd persist/bucket by
    * token once per corpus version and share across every query. */
  private def termFreq(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(Checkpoints.ckpt)

  /** Per-document top-k TF-IDF terms: tf * ln((N+1)/(df+1)), rounded to 6
    * decimals, ranked per document (score desc, token asc).
    * Output: (doc_id, rank, token, score). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("token"), col("score"))
  }

  /** BM25 top-k search for a fixed bag of query terms (k1 = 1.2,
    * b = 0.75): per matching document,
    *   sum_t idf(t) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl/avgdl)))
    * with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).
    *
    * The per-term partial scores are summed in the FIXED order of `terms`
    * (one pivoted column per term, coalesced to 0, added left-to-right) —
    * a groupBy sum over doubles would be partition-order-dependent and
    * unverifiable cross-engine.
    * Output: (rank, doc_id, dl, score), top `topK` by score desc / doc_id
    * asc. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "bm25: 1..8 literal terms")
    // a repeated term would produce two pivot columns holding the same
    // partial score, both summed — double-counting that term
    require(terms.distinct.size == terms.size, "bm25: terms must be distinct")
    // ONE corpus pass, query terms filtered BEFORE any exchange (r14;
    // formerly the full vocab x doc term-frequency table was aggregated
    // and checkpointed just to read <= 8 terms' postings out of it).
    // Per doc the pass keeps only (dl = total token count — identical to
    // the old sum-of-tf — and the matching tokens), so the shuffled and
    // materialized state shrinks by the vocabulary factor; docs with no
    // tokens are dropped exactly as before (they had no tf rows).
    val tok = graft.operators.TextOps.tokens(lower(col(textCol)))
    val base = docs
      .select(col(idCol).as("doc_id"), size(tok).cast("long").as("dl"),
        filter(tok, t => terms.map(x => t === lit(x)).reduce(_ || _))
          .as("__m"))
      .filter(col("dl") > 0)
      .transform(Checkpoints.ckpt) // consumers: stats + postings + tf
    val dl = base.select(col("doc_id"), col("dl"))
    // corpus stats (avgdl = exact long sum / exact count, one double
    // division — identical in any engine)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    val tf = base.select(col("doc_id"), col("dl"), explode(col("__m")).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val postings = tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats.select(col("n_docs"), col("avgdl"))))
    bm25Rank(postings, terms, topK)
  }

  /** The shared BM25 scoring tail over a postings frame carrying
    * (token, doc_id, tf, dl, n_docs, avgdl, df) — one row per matching
    * (doc, term). Association order is fixed and mirrored by the SQL
    * oracle (see the object scaladoc). */
  private def bm25Rank(postings: DataFrame, terms: Seq[String],
                       topK: Int): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("token") === t, col("st"))).as(s"s$i")
    }
    val perTerm = postings.withColumn("st", termScore)
      .groupBy(col("doc_id"), col("dl"))
      .agg(pivots.head, pivots.tail: _*)
    val total = terms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    // top-k FIRST (TakeOrderedAndProject — per-partition heaps, no global
    // sort), then rank the k survivors; a bare global row_number window
    // would funnel every matching doc through one partition.
    // The unpartitioned window below is safe: it ranks only the `topK`
    // rows surviving the limit, never the corpus (WindowExec's single-
    // partition warning is about the k-row frame, not a data path).
    perTerm.withColumn("score", round(total, 6))
      .orderBy(col("score").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("dl"), col("score"))
  }

  /** Exact PHRASE search over a positional posting list: per document,
    * phrase_tf = |positions(t0) ∩ (positions(t1) − 1) ∩ ... ∩
    * (positions(tn) − n)| — the classic positional-index intersection,
    * done with integer array ops (no floats anywhere, so every count
    * replays cross-engine exactly).
    *
    * Physical shape: ONE corpus pass (posexplode of the token stream,
    * filtered to the phrase's terms BEFORE the aggregate), one
    * vocabulary-bounded (doc, term)->positions aggregate shared by all
    * terms via an eager checkpoint, then |phrase|−1 joins on doc_id
    * over frames already shrunk to docs containing each term. Repeated
    * phrase terms are fine: each slot joins its own alias of the same
    * positions row. Output: (doc_id, phrase_tf) for phrase_tf > 0,
    * top `topK` by tf desc / doc_id asc. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String], topK: Int = 20): DataFrame = {
    require(phrase.size >= 2 && phrase.size <= 6,
      "phraseSearch: 2..6 literal terms")
    val grouped = docs.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(lower(col(textCol))))
          .as(Seq("pos", "token")))
      .filter(col("token").isin(phrase.distinct: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(collect_list(col("pos")).as("ps"))
      .transform(Checkpoints.ckpt)
    val joined = phrase.zipWithIndex.map { case (t, i) =>
      grouped.filter(col("token") === t)
        .select(col("doc_id"), col("ps").as(s"ps$i"))
    }.reduceLeft(_.join(_, "doc_id")) // inner: every term must occur
    val matches = phrase.indices.tail.foldLeft(col("ps0")) { (acc, i) =>
      array_intersect(acc, transform(col(s"ps$i"), x => x - i))
    }
    joined.withColumn("phrase_tf", size(matches).cast("long"))
      .filter(col("phrase_tf") > 0)
      .select(col("doc_id"), col("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id").asc).limit(topK)
  }

  /** Append a batch of documents' postings to the PERSISTED inverted
    * index at `path`: (batch_id, doc_id, token, tf, dl) with the doc
    * length DENORMALIZED onto every posting (Lucene's norms) — a
    * term-filtered probe then has everything it needs without ever
    * touching the unfiltered table. Append-only contract: a doc enters
    * the index in exactly one batch; a REPLAYED batch (same batch_id)
    * is absorbed by the probe's read-side dedup. Per batch this is the
    * same one corpus-sized (doc, token) aggregate as the one-shot
    * search — paid once per batch instead of once per query. */
  def appendPostings(docs: DataFrame, idCol: String, textCol: String,
                     path: String, batchId: String): Unit =
    termFreq(docs, idCol, textCol)
      .withColumn("dl", sum(col("tf")).over(
        Window.partitionBy(col("doc_id"))))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(path)

  /** BM25 top-k from the persisted inverted index — the maintained-
    * index completion of [[bm25Search]]: the corpus is NOT on hand
    * (the point — at 100 TB each query reads the term-filtered slice
    * of the index, with the token predicate pushed to the parquet
    * scan, never re-tokenizing anything). Corpus stats (N, avgdl) come
    * from the index's doc-length projection — index-sized, not
    * corpus-sized. Must equal the one-shot [[bm25Search]] over
    * everything ever appended, bit for bit (q228's proof, anchored on
    * q76's oracle). */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    terms: Seq[String], topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "bm25: 1..8 literal terms")
    require(terms.distinct.size == terms.size, "bm25: terms must be distinct")
    val idx = spark.read.parquet(path)
      .dropDuplicates("batch_id", "doc_id", "token") // replay absorption
    val stats = idx.select(col("doc_id"), col("dl")).dropDuplicates("doc_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    val hits = idx.filter(col("token").isin(terms: _*))
      .transform(Checkpoints.ckpt) // shared by df + the scoring join
    val dfreq = hits.groupBy(col("token")).agg(count(lit(1)).as("df"))
    bm25Rank(hits
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats.select(col("n_docs"), col("avgdl")))),
      terms, topK)
  }
}
