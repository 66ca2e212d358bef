package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Sampling at 100 TB must be a pure function of the row key — never
  * rand(): random sampling changes under retries/re-runs and cannot be
  * reproduced by a downstream consumer or an oracle. The bucket hash here
  * is Knuth multiplicative hashing on the key, portable to any engine
  * (plain 64-bit integer arithmetic), so a split is re-derivable anywhere.
  */
object Split {

  /** Deterministic bucket in [0, buckets) for an integer key column. */
  def bucket(key: Column, buckets: Int): Column =
    pmod((key.cast("long") * lit(2654435761L)) % lit(4294967296L),
      lit(buckets.toLong)).cast("int")

  /** Train/validation/test assignment by percentage cut-points over the
    * deterministic bucket (e.g. 80/10/10). */
  def assign(key: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    val b = bucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "valid")
      .otherwise("test")
  }

  /** Split a frame into (train, valid, test) on a key column. */
  def trainValidTest(df: DataFrame, keyCol: String, trainPct: Int = 80,
                     validPct: Int = 10): (DataFrame, DataFrame, DataFrame) = {
    val tagged = df.withColumn("__split", assign(col(keyCol), trainPct, validPct))
    (tagged.filter(col("__split") === "train").drop("__split"),
     tagged.filter(col("__split") === "valid").drop("__split"),
     tagged.filter(col("__split") === "test").drop("__split"))
  }

  /** Deterministic p-percent sample (keeps rows whose bucket < pct). */
  def sample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(bucket(col(keyCol), 100) < pct)

  /** Deterministic mixture sampling — the pretraining "data mixing" step:
    * draw an exact-size corpus from weighted sources (weights in basis
    * points, summing to 10000) with no randomness anywhere.
    *
    * Per-source counts use the LARGEST-REMAINDER method in pure integer
    * arithmetic: floor(w*total/10000) each, then the `total - sum(floors)`
    * leftover slots go to the largest remainders (ties: source asc) — the
    * allocation is exact, deterministic, and engine-portable. Selection
    * within a source ranks documents by (portable hash of the id, id) and
    * keeps the first target_n — a reproducible "random" sample any engine
    * can re-derive (q87).
    *
    * A source with fewer rows than its target contributes everything it
    * has (the shortfall is visible to the caller by counting).
    *
    * Scale shape: the allocation table is #sources rows of driver-side
    * metadata computed relationally (no collect); the selection is one
    * per-source window over the hash order — shuffle keyed by source,
    * WindowGroupLimit prunes to target_n per partition before any full
    * sort materializes.
    *
    * Output: the selected rows as (sourceCol, idCol). */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
                    weightsBp: Seq[(String, Int)], total: Long): DataFrame = {
    require(weightsBp.map(_._2).sum == 10000,
      "mixtureSample: weights must sum to 10000 bp")
    require(weightsBp.map(_._1).distinct.size == weightsBp.size,
      "mixtureSample: duplicate source")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsBp.toDF("__src", "__wbp")
      .withColumn("__floor", expr(s"CAST(__wbp AS BIGINT) * $total DIV 10000"))
      .withColumn("__rem", expr(s"CAST(__wbp AS BIGINT) * $total % 10000"))
    val leftover = w.withColumn("__left",
        lit(total) - sum(col("__floor")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__rrank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__rem").desc, col("__src").asc)))
      .withColumn("target_n",
        col("__floor") + when(col("__rrank") <= col("__left"), 1L).otherwise(0L))
      .select(col("__src"), col("target_n"))
    val ranked = df.select(col(sourceCol).as("__src"), col(idCol).as("__id"))
      .withColumn("__h", Dedup.portableHash64(col("__id").cast("string"), 77))
      .withColumn("__rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__src"))
          .orderBy(col("__h").asc, col("__id").asc)))
      // the per-source target is data-dependent (join below), which
      // WindowGroupLimit cannot use — but no target exceeds `total`, so
      // this LITERAL bound lets the rank window drop each partition to at
      // most `total` rows before the join (verified: WindowGroupLimit in
      // the plan only with this filter present)
      .filter(col("__rank") <= lit(total))
    ranked.join(broadcast(leftover), "__src")
      .filter(col("__rank") <= col("target_n"))
      .select(col("__src").as(sourceCol), col("__id").as(idCol))
  }

  /** Leakage-safe (group-aware) split: every member of a near-duplicate
    * cluster lands in the SAME split. A row-wise split re-creates the
    * contamination problem dedup exists to prevent — a near-dup pair
    * straddling train/eval leaks eval content into training and inflates
    * eval scores. Cluster membership comes from connected components over
    * the caller's verified pair set (any of the near-dup families);
    * assignment hashes the cluster REPRESENTATIVE (the CC min-member
    * label; docs in no pair represent themselves), so a cluster moves
    * between splits atomically and the split stays a pure function of
    * the corpus version (portable hash, no rand()).
    *
    * Scale shape: CC is id-keyed rounds (Dedup.connectedComponents);
    * the assignment itself is one left join against the label frame
    * (pair-member-sized, usually a small fraction of the corpus — Spark
    * broadcasts it when it fits) plus a per-row hash.
    * Output: (idCol, rep, split ∈ {train, eval}). */
  def groupAwareSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                      trainBp: Int = 8000, seed: Int = 99,
                      maxIter: Int = 10): DataFrame = {
    require(trainBp > 0 && trainBp < 10000, "groupAwareSplit: trainBp in (0, 10000)")
    val labels = Dedup.connectedComponents(pairs, maxIter)
      .select(col("id").as("__cid"), col("cluster_id"))
    // no cast on the fallback: cluster_id carries the pair-id type, which
    // matches idCol's by construction — a forced long cast would null out
    // string-keyed corpora
    df.join(labels, col(idCol) === col("__cid"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col(idCol)))
      .select(col(idCol), col("rep"),
        when(pmod(Dedup.portableHash64(col("rep").cast("string"), seed),
            lit(10000L)) < trainBp, "train")
          .otherwise("eval").as("split"))
  }

  /** Stratified deterministic sampling: per-stratum percentage targets
    * (strata absent from the map keep `defaultPct`). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       pcts: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pctExpr = pcts.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, p).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), 100) < pctExpr)
  }
}
