package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, TextOps}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (900L, "what is the capital of france paris is the answer here"),
    (901L, "compute the sum of the first hundred natural numbers now"))
    .toDF("doc_id", "text")

  test("verbatim and embedded benchmark text is flagged; clean docs are not") {
    val train = Seq(
      (1L, "a perfectly clean training document about cooking pasta well"),
      // full benchmark doc pasted inside a longer training doc
      (2L, "intro words what is the capital of france paris is the answer here outro"),
      (3L, "another unrelated document describing garden maintenance tips"),
      // verbatim copy
      (4L, "compute the sum of the first hundred natural numbers now"))
      .toDF("doc_id", "text")
    val hits = Decontaminate.overlaps(train, bench, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(2L, 4L))
    assert(hits.values.forall(_ >= 1))
    val kept = Decontaminate.dropContaminated(train, bench, "doc_id", "text", k = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("sub-k-gram overlap does not flag (only full k-gram collisions)") {
    val train = Seq(
      // shares a 5-token span with bench 900 but never 8 consecutive tokens
      (1L, "the capital of france paris but reworded in different surroundings"))
      .toDF("doc_id", "text")
    assert(Decontaminate.overlaps(train, bench, "doc_id", "text", k = 8)
      .count() == 0)
  }

  test("repetitionStats: dup ratio and keep flag, degenerate docs safe") {
    val docs = Seq(
      (1L, "a a a a a"),                    // 3 shingles, 1 distinct
      (2L, "one two three four five six"),  // all distinct
      (3L, "hi"), (4L, ""))                 // < k tokens -> single shingle
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "doc_id", "text", k = 3,
        maxDupRatio = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    // dup_ratio is the UNROUNDED count ratio since the r8 round()-tie
    // audit (docs/NOTES.md): 1 - 1/3 as plain double arithmetic
    assert(out(0) == ((1L, 3, 1, 1.0 - 1.0 / 3.0, false)))
    assert(out(1) == ((2L, 4, 4, 0.0, true)))
    assert(out(2)._4 == 0.0 && out(2)._5)
    assert(out(3)._4 == 0.0 && out(3)._5)
  }
}
