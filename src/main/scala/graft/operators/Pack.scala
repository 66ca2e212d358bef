package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign documents, in a
  * deterministic order, to fixed-token-budget training sequences. This is
  * the CONTIGUOUS packing used by GPT-style pipelines (documents
  * concatenated in order, sequence boundaries every `seqLen` tokens,
  * documents may straddle a boundary) — not first-fit bin packing, which
  * is inherently sequential and order-fragile.
  *
  * A document's sequence is floor(tokens_before_it / seqLen) — a pure
  * function of the running token count, so the whole plan is one window
  * cumulative sum over exact longs plus integer division: replayable
  * cross-engine (q83) and deterministic under retries.
  *
  * Scale shape: packing runs PER SHARD (`shardCol`), so the cumulative-sum
  * window partitions by shard and parallelizes across them —
  * embarrassingly parallel, no global total order. At 100 TB the shard is
  * the unit a trainer reads (file / date / hash range); a single global
  * ordering would funnel the corpus through one partition for no
  * training-relevant gain.
  *
  * Output: one row per (shard, seq_id): doc and token counts, the first/
  * last document, and the tokens the sequence holds of its budget
  * (tail sequences underfill; mid sequences hold exactly `seqLen` minus
  * straddle carryover accounting, all integers). */
object Pack {

  /** Spark's ntile(k) as a closed-form function of (1-based rank, frame
    * row count): the first n mod k tiles take ceil(n/k) rows, the rest
    * floor(n/k). Pure integer arithmetic (bit-parity with the window
    * function pinned in PackSpec across (n, k) grids), which is what lets
    * an exact ntile ride [[DimRank.ranked]] instead of a global sort.
    * When n < k the ELSE branch is never reached (rem = n, q = 0), so
    * its DIV 0 is never evaluated. */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    require(k >= 1, "ntileOf: k >= 1")
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val q = idiv(n, lit(k.toLong)) // n DIV k, exact integer division
    val rem = n % lit(k.toLong)
    val r0 = rank - lit(1L)
    when(r0 < rem * (q + lit(1L)), idiv(r0, q + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(r0 - rem * (q + lit(1L)), q) + lit(1L))
      .cast("int")
  }

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "packSequences: seqLen > 0")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val counted = docs.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("cum_before", col("cum") - col("n_tok"))
      .withColumn("seq_id", expr(s"cum_before DIV $seqLen"))
    counted.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Length-grouped batching — the dynamic-padding loader shape: batching
    * documents of similar token length together bounds per-batch padding
    * waste (padding cost is batch_max_len - doc_len; mixing a 10-token
    * doc into a 500-token batch wastes 98% of its rows). Documents land
    * in `bucketWidth`-token length bands, then fixed-size batches are
    * numbered inside each band in deterministic id order.
    *
    * Scale shape: one projection (token count — codegen'd kernel), then a
    * per-bucket numbering. Doc lengths CONCENTRATE (the dominant length
    * band holds most of the corpus), so a plain per-bucket window would
    * serialize that band through one task — numbering rides
    * [[DimRank.rankedWithin]] instead (range partition on (bucket, id);
    * a dominant bucket spreads over many partitions, its rank stitched
    * from the bounded per-(partition, bucket) ledger). Batch ids stay a
    * total order per bucket, bit-identical to the naive window. All
    * outputs are exact integers; replayable cross-engine (q102).
    * Output: (idCol, n_tokens, bucket, batch_id, pos_in_batch). */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    bucketWidth: Int = 64, batchSize: Int = 8): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      "lengthBatches: bucketWidth and batchSize > 0")
    val counted = docs.select(col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens DIV $bucketWidth"))
    DimRank.rankedWithin(counted, Seq("bucket"), Seq(col(idCol)), "__r1")
      .withColumn("__r", col("__r1") - 1)
      .select(col(idCol), col("n_tokens"), col("bucket"),
        expr(s"__r DIV $batchSize").cast("int").as("batch_id"),
        expr(s"__r % $batchSize").cast("int").as("pos_in_batch"))
  }

  /** Curriculum sharding: partition the corpus into `nShards` equal-count
    * shards by quality rank (shard 1 = highest [[TextOps.qualityScore]],
    * ties broken on the id), with per-shard aggregates — the layout a
    * curriculum schedule consumes (train easy/clean shards first, or
    * anneal toward the high-quality tail; quality-ordered shards also
    * serve plain quality ablations). ntile keeps shard sizes within one
    * doc of each other regardless of the score distribution.
    *
    * Scale shape: the quality score is a per-row codegen kernel; the
    * exact ntile is NOT a global sort here — it is [[DimRank.ranked]]'s
    * range-partitioned rank plus the closed-form ntile rule (the first
    * n mod k shards take ceil(n/k) rows, the rest floor(n/k) — a pure
    * function of (rank, n), bit-parity with Spark's ntile pinned in
    * PackSpec), so the corpus never funnels through one window task.
    * Output: (shard, n_docs, min_quality, max_quality, total_tokens). */
  def curriculumShards(docs: DataFrame, idCol: String, textCol: String,
                       nShards: Int): DataFrame = {
    require(nShards >= 1, "curriculumShards: nShards >= 1")
    val ranked = DimRank.ranked(
      docs.select(col(idCol),
        TextOps.qualityScore(col(textCol)).as("__q"),
        TextOps.tokenCount(col(textCol)).cast("long").as("__nt")),
      Seq(col("__q").desc, col(idCol).asc), "__rk",
      countCol = Some("__n"))
    ranked
      .withColumn("shard", ntileOf(col("__rk"), col("__n"), nShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("__q")).as("min_quality"), max(col("__q")).as("max_quality"),
        sum(col("__nt")).as("total_tokens"))
      .orderBy(col("shard"))
  }

  /** Context-window occupancy audit — the token-accurate complement of
    * [[packSequences]]: packSequences assigns each DOC to the chunk where
    * it starts; this reports each CHUNK's composition, with straddling
    * documents split token-exactly across the chunks they span. The
    * numbers a trainer cares about before switching on cross-document
    * attention masking: how many documents share a context window, how
    * many windows start mid-document (`n_straddle_in`), and how dominated
    * each window is by its largest contributor (`max_doc_tokens` vs
    * `seqLen`).
    *
    * Same cumulative-sum machinery as packSequences (per-shard window
    * over exact longs), then each doc explodes into the [first_chunk ..
    * last_chunk] range it covers — bounded by ceil(n_tok/seqLen)+1 rows
    * per doc, NOT corpus x chunk. tok_in_chunk = min(cum, (c+1)L) -
    * max(cum_before, cL): pure integer arithmetic, replayable
    * cross-engine. Zero-token docs occupy nothing and are excluded.
    * Output: (shard, chunk_id, n_docs, n_tokens, n_straddle_in,
    * max_doc_tokens, first_doc, last_doc). */
  def chunkOccupancy(docs: DataFrame, idCol: String, textCol: String,
                     shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "chunkOccupancy: seqLen > 0")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("cum_before", col("cum") - col("n_tok"))
      .withColumn("chunk_id",
        explode(sequence(expr(s"cum_before DIV $seqLen"),
          expr(s"(cum - 1) DIV $seqLen"))))
      .withColumn("tok_in_chunk",
        least(col("cum"), (col("chunk_id") + 1) * seqLen)
          - greatest(col("cum_before"), col("chunk_id") * lit(seqLen.toLong)))
      .withColumn("straddle_in",
        when(col("cum_before") < col("chunk_id") * lit(seqLen.toLong), 1L)
          .otherwise(0L))
      .groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in_chunk")).as("n_tokens"),
        sum(col("straddle_in")).as("n_straddle_in"),
        max(col("tok_in_chunk")).as("max_doc_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Context-length truncation-loss audit: for each candidate context
    * length L, how many tokens would per-document truncation at L throw
    * away? The number a pipeline reads before choosing between
    * truncation and [[packSequences]]-style straddle packing (which
    * loses nothing), and the cheap screen for "are our documents longer
    * than the context we train at". All cells exact integers —
    * kept = Σ min(n, L) — except the final waste percentage.
    *
    * Scale shape: one codegen token count per doc, a broadcast of the
    * |lengths|-row grid (each doc emits one partial per L), ONE bounded
    * aggregation keyed by L. Output per L: (ctx_len, n_docs,
    * docs_truncated, total_tokens, kept_tokens, waste_pct). */
  def truncationLoss(df: DataFrame, textCol: String,
                     lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty, "truncationLoss: lengths non-empty")
    val grid = df.sparkSession.range(1)
      .select(explode(array(lengths.map(l => lit(l)): _*)).as("ctx_len"))
    df.select(TextOps.tokenCount(col(textCol)).cast("long").as("__n"))
      .crossJoin(broadcast(grid))
      .groupBy(col("ctx_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("__n") > col("ctx_len")).cast("long")).as("docs_truncated"),
        sum(col("__n")).as("total_tokens"),
        sum(least(col("__n"), col("ctx_len").cast("long"))).as("kept_tokens"))
      .withColumn("waste_pct",
        (col("total_tokens") - col("kept_tokens")).cast("double") * 100.0 /
          col("total_tokens").cast("double"))
  }
}
