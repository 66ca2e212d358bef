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
}
