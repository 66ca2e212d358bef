package graft

import org.apache.spark.sql.functions._

/** Pins the invariants the 10x timing study rests on (docs/PLANS_r10.md):
  * replication is join-consistent, replica 0 is the source verbatim,
  * text rotation preserves within-replica structure while making
  * cross-replica shingles disjoint, and the embedding transform is
  * orthogonal (within-replica geometry exactly preserved). */
class ScaleDataSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def strides = Map(
    "cust" -> 100000L, "supp" -> 100000L, "part" -> 100000L,
    "order" -> 1000000L, "event" -> 1000000L, "user" -> 100000L,
    "doc" -> 100000L)

  test("row counts scale by the replica factor; keys stay disjoint") {
    val src = Tables.load(spark, sf, "orders")
    val out = ScaleData.scaledTable(src, "orders", 3, strides)
    assert(out.count() == 3 * src.count())
    assert(out.select("o_orderkey").distinct().count() == out.count())
    // FK stride matches the customer PK stride: every replica's orders
    // join exactly its own replica's customers
    val cust3 = ScaleData.scaledTable(
      Tables.load(spark, sf, "customer"), "customer", 3, strides)
    assert(out.join(cust3, col("o_custkey") === col("c_custkey"), "left_anti")
      .count() == 0)
  }

  test("replica 0 is the source verbatim (planted fixtures survive)") {
    val src = Tables.load(spark, sf, "documents")
    val out = ScaleData.scaledTable(src, "documents", 2, strides)
      .filter(col("doc_id") < strides("doc"))
    assert(out.exceptAll(src).count() == 0 && src.exceptAll(out).count() == 0)
  }

  test("text rotation is a length-preserving bijection: within-replica " +
      "duplicate structure replicates, cross-replica tokens are disjoint") {
    val src = Tables.load(spark, sf, "documents")
    val out = ScaleData.scaledTable(src, "documents", 2, strides)
    // per-replica exact-duplicate group histogram identical to the source
    def dupHist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").count().groupBy("count").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val srcHist = dupHist(src)
    assert(dupHist(out.filter(col("doc_id") < strides("doc"))) == srcHist)
    assert(dupHist(out.filter(col("doc_id") >= strides("doc"))) == srcHist)
    // length preserved -> n_chars stays consistent
    assert(out.filter(length(col("text")) =!= col("n_chars")).count() ==
      src.filter(length(col("text")) =!= col("n_chars")).count() * 2)
    // no word of replica 1 collides with any word of replica 0
    val w0 = out.filter(col("doc_id") < strides("doc"))
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val w1 = out.filter(col("doc_id") >= strides("doc"))
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    assert(w0.join(w1, Seq("w")).count() == 0)
  }

  test("heaps mode: vocabulary grows ~x3 at x10 replicas, replicas share " +
      "the pool but are not near-duplicates of each other") {
    val src = Tables.load(spark, sf, "documents")
    def vocab(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0).select("w").distinct()
    val v1 = vocab(src).count().toDouble
    val out10 = ScaleData.scaledTable(src, "documents", 10, strides,
      textMode = "heaps")
    val v10 = vocab(out10).count().toDouble
    // the 3-shift pool bounds cumulative vocab at ~3x (Heaps beta ~0.5
    // at one decade); allow the hash draw +-20%
    assert(v10 / v1 >= 2.4 && v10 / v1 <= 3.3,
      s"heaps vocab ratio ${v10 / v1} (v1=$v1 v10=$v10)")
    // default mode for contrast: every replica mints a full new vocab
    val rot10 = ScaleData.scaledTable(src, "documents", 10, strides)
    assert(vocab(rot10).count().toDouble / v1 >= 9.0)
    // replica 0 is verbatim in heaps mode too
    assert(out10.filter(col("doc_id") < strides("doc")).exceptAll(src)
      .count() == 0)
    // no near-dup structure planted: two replicas of the SAME base doc
    // agree on ~1/3 of token positions (never a majority)
    val t1 = out10.filter(col("doc_id") >= strides("doc") &&
        col("doc_id") < 2 * strides("doc"))
      .select((col("doc_id") - strides("doc")).as("id"),
        split(col("text"), " ").as("a"))
    val t2 = out10.filter(col("doc_id") >= 2 * strides("doc") &&
        col("doc_id") < 3 * strides("doc"))
      .select((col("doc_id") - 2 * strides("doc")).as("id"),
        split(col("text"), " ").as("b"))
    val agree = t1.join(t2, "id")
      .select(avg(aggregate(zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)),
        lit(0.0), (acc, v) => acc + v) / size(col("a"))).as("frac"))
      .head().getDouble(0)
    assert(agree > 0.15 && agree < 0.5, s"replica agreement $agree")
    // within-replica duplicate structure still replicates exactly (the
    // token map is per-replica deterministic on the token)
    def dupHist2(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").count().groupBy("count").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dupHist2(out10.filter(col("doc_id") >= strides("doc") &&
      col("doc_id") < 2 * strides("doc"))) ==
      dupHist2(src))
  }

  test("embedding transform is orthogonal: norms and a sampled pairwise " +
      "dot product are bit-preserved within a replica") {
    val src = Tables.load(spark, sf, "embeddings").limit(50)
    val out = ScaleData.scaledTable(src, "embeddings", 2, strides)
    def normsOf(df: org.apache.spark.sql.DataFrame, shift: Long) =
      df.select((col("vec_id") - shift).as("id"),
          aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val n0 = normsOf(out.filter(col("vec_id") < strides("doc")), 0L)
    val n1 = normsOf(out.filter(col("vec_id") >= strides("doc")), strides("doc"))
    assert(n0.keySet == n1.keySet)
    // float ops reordered by the shift still sum to the same double total
    // within 1e-6 relative (the sum is over the same 64 float squares)
    n0.foreach { case (id, v) => assert(math.abs(v - n1(id)) <= 1e-6 * (1 + v)) }
    // a pairwise dot product is likewise preserved (rigid motion)
    val rows = out.orderBy("vec_id").limit(2)
      .select("embedding").collect().map(_.getSeq[Float](0))
    val r1 = out.filter(col("vec_id") >= strides("doc")).orderBy("vec_id")
      .limit(2).select("embedding").collect().map(_.getSeq[Float](0))
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(math.abs(dot(rows(0), rows(1)) - dot(r1(0), r1(1))) <= 1e-6)
  }
}
