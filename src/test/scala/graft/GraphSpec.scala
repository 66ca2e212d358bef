package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Robust, TextOps}

/** Specs for PageRank (integer fixed-point), PMI collocations, and the
  * moment battery. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: star center outranks leaves; symmetric nodes tie exactly") {
    // star: 0 — {1,2,3,4}
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("id_a", "id_b")
    val r = Graph.pageRank(star, maxIter = 10).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L))
    // integer arithmetic: the four leaves are EXACTLY equal, not close
    assert(Set(r(1L), r(2L), r(3L), r(4L)).size == 1)
    // total mass bounded by n (floor divisions only shed mass)
    assert(r.values.sum <= 5L * 1000000L)
  }

  test("pagerank is deterministic and never exceeds the mass bound") {
    val pairs = (1 to 200).map(i => (i.toLong, (i % 50 + 300).toLong))
      .toDF("id_a", "id_b")
    val a = Graph.pageRank(pairs, maxIter = 8).orderBy("id").collect().toSeq
    val b = Graph.pageRank(pairs, maxIter = 8).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("pmi: an always-adjacent pair scores far above an independent pair") {
    // "alpha beta" always adjacent; "gamma"/"delta" co-occur independently
    val docs = (1 to 60).map { i =>
      (i.toLong, s"alpha beta gamma x$i delta filler${i % 7} gamma delta end")
    }.toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, "doc_id", "text",
      minCount = 20, topK = 10).collect()
    val pmiOf = out.map(r => (r.getString(1), r.getString(2)) ->
      r.getAs[Double]("pmi")).toMap
    assert(pmiOf.contains(("alpha", "beta")))
    // perfect collocation: every alpha is followed by beta
    val perfect = pmiOf(("alpha", "beta"))
    assert(pmiOf.filterNot(_._1 == ("alpha", "beta")).values
      .forall(_ < perfect))
    // ranks are 1..k in pmi order
    assert(out.map(_.getAs[Int]("rnk")).toSeq == (1 to out.length))
  }

  test("moment battery: uniform 0..9 has skew 0 and kurtosis -1.2242...") {
    val rows = (0 until 1000).map(i => ("u", i.toLong, (i % 10).toLong))
    val r = Robust.momentStats(rows.toDF("source", "doc_id", "score")
      .select("source", "score"), "source", "score").collect()(0)
    assert(r.getAs[Double]("mean") == 4.5)
    assert(math.abs(r.getAs[Double]("std") - math.sqrt(8.25)) < 1e-6)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-9)
    // excess kurtosis of discrete uniform over 10 points: 120.8625/68.0625 - 3
    assert(math.abs(r.getAs[Double]("kurtosis_excess") -
      (120.8625 / 68.0625 - 3.0)) < 1e-6)
  }

  test("subsampling thins frequent tokens, keeps rare ones whole, is deterministic") {
    // "the" floods the corpus; "zephyr" (every 4th doc only) stays
    // under the t threshold: f = 50/N < t = 1/100
    val docs = (1 to 200).map(i =>
      (i.toLong, ("the " * 50) +
        (if (i % 4 == 0) "zephyr " else "") + s"word$i end"))
      .toDF("doc_id", "text")
    val run = () => graft.operators.TextOps.subsampleFrequent(
      docs, "doc_id", "text", tNum = 1, tDen = 100, topK = 5)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val out = run()
    val (before, after, ppm) = out("the")
    assert(ppm < 1000000L)      // frequent token gets a real threshold
    assert(after < before)      // and is actually thinned
    assert(after > 0)           // but not annihilated
    // rare tokens (f < t) keep everything: threshold saturates at 1e6
    out.get("zephyr").foreach { case (b, a, p) =>
      assert(p == 1000000L && a == b)
    }
    assert(run() == out)        // hash-Bernoulli: no run-to-run drift
  }

  test("token entropy: repeated-token doc scores 0, uniform doc scores ln(k)") {
    val docs = Seq(
      ("s", 1L, "spam spam spam spam spam spam spam spam"),   // H = 0
      ("s", 2L, "a b c d e f g h"),                           // H = ln 8
      ("t", 3L, "x y x y x y x y")).toDF("source", "doc_id", "text")
    val out = graft.operators.TextOps.tokenEntropyStats(
      docs, "source", "doc_id", "text", lowH = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert(s.getAs[Double]("min_entropy") == 0.0)
    assert(math.abs(s.getAs[Double]("max_entropy") - math.log(8.0)) < 1e-4)
    assert(s.getAs[Long]("n_low") == 1L) // only the spam doc
    assert(math.abs(out("t")(0 max out("t").fieldIndex("max_entropy"))
      .asInstanceOf[Double] - math.log(2.0)) < 1e-4)
  }

  test("embedding outliers: a planted far vector is fenced, tight cluster is not") {
    val rnd = new scala.util.Random(7)
    def near(c: Float): Array[Float] =
      Array.fill(8)(c + rnd.nextFloat() * 0.01f)
    val rows = (1 to 40).map(i => (0, i.toLong, near(0.5f))) :+
      ((0, 99L, Array.fill(8)(25.0f))) // the misroute
    val df = rows.toDF("label", "vec_id", "embedding")
    val out = graft.operators.Embeddings.centroidOutlierStats(
      df, "label", "vec_id", "embedding").collect()(0)
    assert(out.getAs[Long]("n") == 41L)
    // the misroute sits ~40 median-distances out (it drags the centroid
    // ~0.6/dim, so the CLUSTER's median distance is ~1.7 and its tiny
    // MAD lets a few edge members trip the fence too — the planted
    // vector is always caught, and the fence never inverts)
    val outliers = out.getAs[Long]("n_outliers")
    assert(outliers >= 1L && outliers < 41L / 2)
    assert(out.getAs[Double]("med") < 5.0)
  }

  test("triangleStats: counts on a known graph (K4 + pendant)") {
    // K4 on 1-4 (4 triangles, 6 edges) plus pendant 4-5; duplicate and
    // reversed pairs must canonicalize away
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L), (4L, 5L)).toDF("id_a", "id_b")
    val r = Graph.triangleStats(pairs).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    // degrees 3,3,3,4,1 -> wedges 3+3+3+6+0 = 15; clustering = 12/15
    assert(r.getAs[Long]("n_wedges") == 15L)
    assert(r.getAs[Double]("clustering") == 12.0 / 15.0)
  }

  test("triangleStatsOriented: same census as triangleStats, hub wedges gone") {
    // K4 + pendant: every shared column must equal the id-oriented form
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L), (4L, 5L)).toDF("id_a", "id_b")
    val naive = Graph.triangleStats(k4).collect()(0)
    val o = Graph.triangleStatsOriented(k4).collect()(0)
    for (c <- Seq("n_nodes", "n_edges", "n_wedges", "n_triangles"))
      assert(o.getAs[Long](c) == naive.getAs[Long](c), c)
    assert(o.getAs[Double]("clustering") == naive.getAs[Double]("clustering"))
    // oriented wedges are a subset of wedges: each triangle is exactly one
    // oriented wedge plus the closing edge, so n_wedges_oriented >= T
    assert(o.getAs[Long]("n_wedges_oriented") >= o.getAs[Long]("n_triangles"))
    assert(o.getAs[Long]("n_wedges_oriented") <= o.getAs[Long]("n_wedges"))

    // star + one rim edge: hub 0 with 60 spokes holds C(60,2)=1770 of the
    // 1771 id-oriented wedges but has out-degree 0 under degree
    // orientation — the oriented census does ~rim-only work yet counts
    // the same single triangle
    val star = (1 to 60).map(i => (0L, i.toLong)) :+ (1L, 2L)
    val so = Graph.triangleStatsOriented(star.toDF("id_a", "id_b")).collect()(0)
    assert(so.getAs[Long]("n_triangles") == 1L)
    assert(so.getAs[Long]("n_wedges") == 1770L + 1L + 1L) // hub + nodes 1,2
    // hub contributes ZERO oriented wedges: spokes each have one out-edge
    // (into the hub) except 1 and 2, which also point at each other
    assert(so.getAs[Long]("n_wedges_oriented") == 1L)
  }

  test("triangle census of an empty edge set is the all-zero row") {
    // ADVICE r10: sum over zero rows is NULL — both census forms must
    // coalesce n_wedges so an empty graph yields 0s and clustering 0.0,
    // matching the oriented-wedge column's convention
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val r = Graph.triangleStats(empty).collect()(0)
    for (c <- Seq("n_nodes", "n_edges", "n_wedges", "n_triangles"))
      assert(r.getAs[Long](c) == 0L, c)
    assert(r.getAs[Double]("clustering") == 0.0)
    val o = Graph.triangleStatsOriented(empty).collect()(0)
    for (c <- Seq("n_nodes", "n_edges", "n_wedges", "n_wedges_oriented",
        "n_triangles"))
      assert(o.getAs[Long](c) == 0L, c)
    assert(o.getAs[Double]("clustering") == 0.0)
  }

  test("kCore: pendant chain peels away, clique survives with degrees") {
    // K4 on 1-4 plus a tail 4-5-6: the tail cascades out of the 2-core?
    // no — 4-5-6 is a path: deg(6)=1 peels, then deg(5)=1 peels; K4 stays
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val core = Graph.kCore(pairs, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=5 over-peels everything (K4 max degree is 3)
    assert(Graph.kCore(pairs, k = 5, rounds = 3).count() == 0L)
  }

  test("moment battery: constant group reports zero spread and shape") {
    val r = Robust.momentStats(
      (1 to 50).map(_ => ("c", 7L)).toDF("source", "score"),
      "source", "score").collect()(0)
    assert(r.getAs[Double]("std") == 0.0)
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("kurtosis_excess") == 0.0)
    assert(r.getAs[Long]("n") == 50L)
  }
}
