package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pack, TextOps}

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("contiguous packing: hand-computed sequence assignment") {
    // shard A token counts by doc order: 3, 4, 2 -> cum_before 0, 3, 7
    // with seqLen 5 -> seqs 0, 0, 1; shard B independent: 6 tokens -> seq 0
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "d e f g", "A"), (3L, "h i", "A"),
      (4L, "p q r s t u", "B"))
      .toDF("doc_id", "text", "src")
    val out = Pack.packSequences(docs, "doc_id", "text", "src", seqLen = 5)
      .orderBy("shard", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("A", 0L, 2L, 7L, 1L, 2L),   // docs 1+2 start inside seq 0
      ("A", 1L, 1L, 2L, 3L, 3L),
      ("B", 0L, 1L, 6L, 4L, 4L)))
  }

  test("packing conserves documents and tokens, shards stay independent") {
    val docs = (1 to 300)
      .map(i => (i.toLong, ("tok " * (1 + i % 17)).trim, s"s${i % 4}"))
      .toDF("doc_id", "text", "src")
    val out = Pack.packSequences(docs, "doc_id", "text", "src", seqLen = 64)
    val totTok = docs.select(sum(TextOps.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    assert(out.agg(sum(col("n_docs"))).collect().head.getLong(0) == 300L)
    assert(out.agg(sum(col("n_tokens"))).collect().head.getLong(0) == totTok)
    // every shard's sequence ids are contiguous from 0
    val bad = out.groupBy("shard")
      .agg(min(col("seq_id")).as("lo"), max(col("seq_id")).as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("empty documents take no budget but keep their slot") {
    val docs = Seq((1L, "a b", "A"), (2L, "", "A"), (3L, "c d e", "A"))
      .toDF("doc_id", "text", "src")
    val out = Pack.packSequences(docs, "doc_id", "text", "src", seqLen = 4)
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // cum_before: 0, 2, 2 -> all in seq 0 (empty doc contributes 0 tokens)
    assert(out.toSeq == Seq((0L, 3L, 5L)))
  }

  test("ntileOf: bit-parity with Spark's ntile across (n, k) grids") {
    import org.apache.spark.sql.expressions.Window
    // every frame size 1..40 at once (partition by n), for each k:
    // the closed-form rule and the window function must agree on every row
    val rows = spark.range(1, 41).select(col("id").as("n"))
      .withColumn("r", explode(sequence(lit(1L), col("n"))))
    for (k <- Seq(1, 2, 3, 5, 8, 13)) {
      val diff = rows
        .withColumn("want", ntile(k).over(
          Window.partitionBy(col("n")).orderBy(col("r"))))
        .withColumn("got", Pack.ntileOf(col("r"), col("n"), k))
        .filter(col("want") =!= col("got"))
      assert(diff.count() == 0, s"ntileOf diverges from ntile($k)")
    }
  }

  test("curriculum shards: kernel form matches the naive global-ntile form") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1 to 137)
      .map(i => (i.toLong, ("tok " * (1 + (i * 7) % 23)).trim + (if (i % 3 == 0) "!!" else "")))
      .toDF("doc_id", "text")
    val got = Pack.curriculumShards(docs, "doc_id", "text", nShards = 8)
    val naive = docs.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("__q"),
        TextOps.tokenCount(col("text")).cast("long").as("__nt"))
      .withColumn("shard", ntile(8).over(
        Window.orderBy(col("__q").desc, col("doc_id").asc)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("__q")).as("min_quality"), max(col("__q")).as("max_quality"),
        sum(col("__nt")).as("total_tokens"))
    assert(got.exceptAll(naive.select(got.columns.map(col): _*)).isEmpty &&
      naive.select(got.columns.map(col): _*).exceptAll(got).isEmpty)
  }

  test("length batches: band assignment, batch caps, id-ordered numbering") {
    // token counts 1..20, bucketWidth 4 -> buckets 0 (1-3 tok), 1, ... 5
    val docs = (1 to 20).map(i => (i.toLong, ("t " * i).trim))
      .toDF("doc_id", "text")
    val out = Pack.lengthBatches(docs, "doc_id", "text",
        bucketWidth = 4, batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))
    assert(out.length == 20)
    // bucket = n_tokens DIV 4; n_tokens == doc_id here
    assert(out.forall { case (id, n, b, _, _) => n == id && b == id / 4 })
    // within a bucket: ids ascend through (batch_id, pos); batches hold
    // at most batchSize and positions stay below it
    out.groupBy(_._3).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._5))
      assert(ordered.map(_._1).toSeq == ordered.map(_._1).sorted.toSeq)
      assert(rows.groupBy(_._4).values.forall(_.size <= 2))
      assert(rows.forall(_._5 < 2))
    }
  }
}
