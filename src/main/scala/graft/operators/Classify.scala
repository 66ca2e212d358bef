package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closed-form text classification — the trainable quality/language
  * filter rung of the curation ladder (Joulin et al. 2016's fastText is
  * the production tool; CCNet routes docs through exactly this kind of
  * cheap linear classifier). Naive Bayes is the closed-form member of
  * that family: training is two counting aggregations (no iteration, no
  * optimizer state), so the whole train-and-score pass stays one
  * declarative Catalyst plan — the right first rung before shipping an
  * external model through the enrichment seam
  * ([[ExternalEnrichment]]).
  *
  * Scale shape: training = ONE corpus-sized (label, token) count
  * aggregate (map-side combined) — the model is vocab x nLabels rows of
  * bounded metadata, broadcast back for scoring; scoring = the corpus's
  * (doc, token) tf frame joined against the broadcast model, then one
  * per-doc aggregation. The corpus never joins itself; label cardinality
  * is assumed small (languages, quality tiers). If vocab x nLabels ever
  * outgrows broadcast, the model join degrades gracefully to a shuffled
  * hash join on token — nothing else changes.
  *
  * Cross-engine float discipline (the q99 pattern): every log term is
  * `round(tf * ln(ratio), 6)` cast to DECIMAL(25,6) and summed exactly,
  * so per-doc scores are order-independent; the argmax tie-breaks on
  * label ascending.
  */
object Classify {

  /** Train a multinomial NB model on `labelCol` (add-one smoothing) and
    * classify every row of the SAME corpus (resubstitution — the
    * self-trained-filter shape of [[TextOps.unigramLogProb]]; to score a
    * different corpus, see the two-frame overload).
    * Output: (idCol, pred_label, score, labelCol, correct). */
  def nbSelfClassify(df: DataFrame, idCol: String, textCol: String,
                     labelCol: String): DataFrame = {
    val out = nbClassify(df, df, idCol, textCol, labelCol)
    out.join(df.select(col(idCol), col(labelCol)), idCol)
      .withColumn("correct", col("pred_label") === col(labelCol))
  }

  /** Train on `train` (labels from `labelCol`), score every row of
    * `score`. Output: (idCol, pred_label, score) — score is the winning
    * posterior log-probability (rounded; comparable within a doc, not a
    * calibrated probability). */
  def nbClassify(train: DataFrame, score: DataFrame, idCol: String,
                 textCol: String, labelCol: String): DataFrame = {
    val tok = train
      .select(col(labelCol).as("__lab"),
        explode(TextOps.tokens(lower(col(textCol)))).as("__token"))
    // model: per-(label, token) counts; per-label totals; vocab size
    val cnt = tok.groupBy(col("__lab"), col("__token"))
      .agg(count(lit(1)).as("__c"))
      .transform(Checkpoints.ckpt) // consumers: totals, vocab, score join
    val tot = cnt.groupBy(col("__lab")).agg(sum(col("__c")).as("__tot"))
    val vocab = cnt.select(countDistinct(col("__token")).as("__v"))
    val ndl = train.groupBy(col(labelCol).as("__lab"))
      .agg(count(lit(1)).as("__ndl"))
    val nd = train.select(count(lit(1)).as("__nd"))
    // per-label scoring constants: prior + smoothing denominator (a
    // label whose docs are all empty still classifies — left join)
    val lab = ndl.join(tot, Seq("__lab"), "left")
      .select(col("__lab"), coalesce(col("__tot"), lit(0L)).as("__tot"),
        col("__ndl"))
      .crossJoin(vocab).crossJoin(nd)
      .select(col("__lab"), col("__tot"), col("__v"),
        round(log(col("__ndl").cast("double") / col("__nd")), 6)
          .cast("decimal(25,6)").as("__prior"))
    val tf = score
      .select(col(idCol), explode(TextOps.tokens(lower(col(textCol))))
        .as("__token"))
      .groupBy(col(idCol), col("__token")).agg(count(lit(1)).as("__tf"))
    // every (doc-token, label) pair scores: seen tokens via the model
    // count, unseen via the same add-one smoothing with c = 0
    val terms = tf.crossJoin(broadcast(lab))
      .join(broadcast(cnt), Seq("__lab", "__token"), "left")
      .withColumn("__t",
        round(col("__tf") * log((coalesce(col("__c"), lit(0L)) + lit(1))
            .cast("double") / (col("__tot") + col("__v"))), 6)
          .cast("decimal(25,6)"))
      .groupBy(col(idCol), col("__lab")).agg(sum(col("__t")).as("__s"))
    // empty docs score on priors alone
    val scores = score.select(col(idCol)).crossJoin(broadcast(lab))
      .join(terms, Seq(idCol, "__lab"), "left")
      .withColumn("__score",
        col("__prior") + coalesce(col("__s"), lit(0).cast("decimal(25,6)")))
    scores
      .withColumn("__r", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("__score").desc, col("__lab").asc)))
      .where(col("__r") === 1)
      .select(col(idCol), col("__lab").as("pred_label"),
        round(col("__score").cast("double"), 6).as("score"))
  }
}
