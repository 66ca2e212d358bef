package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** Properties pinning the PCA family (q151/q152): the covariance query is
  * the hash-verified value oracle; these specs carry the parts a SQL
  * oracle cannot (power-iteration results are float-iteration-dependent —
  * the q55/q146 float-means convention). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // Seeded anisotropic cloud: dim 8, variance concentrated on axes 0
  // and 1 (sigma 4 and 2) with small isotropic noise — the top-2
  // components are knowable up to rotation noise.
  private lazy val cloud = {
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val v = Array.fill(8)((rnd.nextGaussian() * 0.1).toFloat)
      v(0) = (rnd.nextGaussian() * 4.0).toFloat
      v(1) = (rnd.nextGaussian() * 2.0).toFloat
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("covariance emits exactly the upper triangle with variance on the diagonal") {
    val cov = Embeddings.covariance(cloud, "embedding").collect()
    assert(cov.length == 8 * 9 / 2)
    assert(cov.forall(r => r.getInt(0) <= r.getInt(1)))
    val diag = cov.filter(r => r.getInt(0) == r.getInt(1))
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(diag.values.forall(_ > 0))
    // the planted anisotropy shows up: var(0) > var(1) > every noise axis
    assert(diag(0) > diag(1))
    assert((2 until 8).forall(i => diag(1) > diag(i)))
  }

  test("components are orthonormal, eigenvalues descend, and Av = lambda*v holds") {
    val (comps, eigs) = Embeddings.pcaComponents(cloud, "embedding", k = 3)
    // orthonormal
    for (a <- comps.indices; b <- comps.indices) {
      val d = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-6, s"dot($a,$b)=$d")
    }
    // descending spectrum, dominated by the planted axes
    assert(eigs(0) >= eigs(1) && eigs(1) >= eigs(2))
    assert(eigs(0) > 10 && eigs(1) > 2 && eigs(2) < 1)
    // eigenpair residual on the original covariance
    val cells = Embeddings.covariance(cloud, "embedding").collect()
    val m = Array.ofDim[Double](8, 8)
    cells.foreach { r =>
      m(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      m(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
    }
    for (c <- 0 until 3) {
      val av = Array.tabulate(8)(i => (0 until 8).map(j => m(i)(j) * comps(c)(j)).sum)
      val res = math.sqrt(av.zip(comps(c)).map { case (a, v) =>
        val d = a - eigs(c) * v; d * d }.sum)
      assert(res < 1e-4 * math.max(1.0, eigs(c)), s"residual($c)=$res")
    }
  }

  test("pcaComponents is deterministic run-over-run") {
    val (c1, e1) = Embeddings.pcaComponents(cloud, "embedding", k = 2)
    val (c2, e2) = Embeddings.pcaComponents(cloud, "embedding", k = 2)
    assert(e1.sameElements(e2))
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("projection variance per component tracks its eigenvalue") {
    val (comps, eigs) = Embeddings.pcaComponents(cloud, "embedding", k = 2)
    val mv = Embeddings.means(cloud, "embedding").collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    val proj = Embeddings.pcaProject(cloud, "vec_id", "embedding", comps, mv)
      .select(col("proj")(0).as("p1"), col("proj")(1).as("p2"))
    val r = proj.agg(
      (sum(col("p1") * col("p1")) / (count(lit(1)) - 1)).as("v1"),
      (sum(col("p2") * col("p2")) / (count(lit(1)) - 1)).as("v2"),
      (sum(col("p1")) / count(lit(1))).as("m1")).head
    // centered projections: mean ~ 0; variance along comp c ~ lambda_c
    assert(math.abs(r.getDouble(2)) < 1e-6)
    assert(math.abs(r.getDouble(0) - eigs(0)) / eigs(0) < 0.02)
    assert(math.abs(r.getDouble(1) - eigs(1)) / eigs(1) < 0.02)
  }

  test("explainedVariance shares are ordered and bounded by 1") {
    val ev = Embeddings.explainedVariance(cloud, "embedding", k = 3)
      .orderBy("component").collect()
    val shares = ev.map(_.getDouble(2))
    assert(shares(0) >= shares(1) && shares(1) >= shares(2))
    assert(shares.sum <= 1.0 + 1e-9)
    assert(shares(0) > 0.5) // the sigma-4 axis dominates
  }
}
