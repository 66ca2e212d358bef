package graft.tools

/** Executed-plan audit over a named query list: join strategies and
  * shuffle counts after AQE re-planning (run the query first so the
  * adaptive plan is final). `runMain graft.tools.Audit7 [sfDir] [q...]`
  * — defaults to the round-7 session-7 additions. Counts both the
  * pre-AQE `Exchange` nodes and the materialized `ShuffleQueryStage`s:
  * under AQE the former largely rewrite into the latter, so the pair
  * together is the honest shuffle count. */
object Audit7 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.localSession(4, "graft-audit")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q174_kneser_ney", "q176_dedup_ladder", "q179_sft_assembly",
        "q181_vocab_drift", "q182_split_leakage", "q184_line_scrub",
        "q185_datasheet", "q186_recall_curve", "q191_token_ledger",
        "q193_hash_uniformity")
    for (n <- names) {
      val df = graft.Queries.all(n)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).length
      println(f"AUDIT $n%-24s SMJ=${c("SortMergeJoin")}%2d " +
        f"BHJ=${c("BroadcastHashJoin")}%2d " +
        f"BNLJ=${c("BroadcastNestedLoop")}%2d " +
        f"EX=${c("Exchange hashpartitioning")}%2d " +
        f"SQS=${c("ShuffleQueryStage")}%2d")
    }
    spark.stop()
  }
}
