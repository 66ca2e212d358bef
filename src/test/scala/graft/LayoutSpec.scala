package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is a bijection: unzValue inverts it over the full grid") {
    val grid = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val z = grid.select(col("a"), col("b"),
      Layout.zValue(col("a"), col("b"), bits = 5).as("z"))
    assert(z.select("z").distinct().count() == 32 * 32)
    assert(z.agg(min("z"), max("z")).collect().head.toSeq == Seq(0L, 1023L))
    val (ra, rb) = Layout.unzValue(col("z"), bits = 5)
    assert(z.filter(ra =!= col("a") || rb =!= col("b")).count() == 0)
  }

  test("bucketize clamps, spreads, and stays in [0, 2^bits)") {
    val vals = Seq(-5L, 0L, 100L, 199L, 250L).toDF("v")
    val out = vals.select(Layout.bucketize(col("v"), 0L, 199L, 3).as("b"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 0L, 4L, 7L, 7L)) // clamped at both ends
  }

  test("z-sorted chunks bound BOTH dimensions (the data-skipping property)") {
    val rows = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val chunked = rows
      .select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b"), 6).as("z"))
      .groupBy(expr("z DIV 256"))
      .agg((max(col("a")) - min(col("a"))).as("spread_a"),
        (max(col("b")) - min(col("b"))).as("spread_b"))
    // every 256-z chunk of a 64x64 grid is EXACTLY one 16x16 tile: both
    // spreads are 15 — a lexicographic (a,b) sort would give spread_b 63
    val bad = chunked.filter(col("spread_a") =!= 15 || col("spread_b") =!= 15)
    assert(bad.count() == 0)
  }

  test("zOrderBy files cover bounded rectangles of the key space") {
    val rows = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val path = new java.io.File("target/rt/zorder_spec").getAbsolutePath
    Layout.zOrderBy(rows, col("a"), col("b"), bits = 6, numFiles = 4)
      .write.mode("overwrite").parquet(path)
    // the write-side contract is z-contiguity: range partitioning by z +
    // sort-within gives every file a DISJOINT z interval, and the tile
    // test above proves bounded z-intervals are bounded (a, b) rectangles.
    // (The intervals themselves come from sampled range boundaries, so a
    // file may straddle a quadrant corner — asserting tight per-file
    // rectangles would race the sampler.)
    val perFile = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .select(col("f"), Layout.zValue(col("a"), col("b"), 6).as("z"))
      .groupBy("f")
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy("lo").collect()
    assert(perFile.length == 4)
    assert(perFile.map(_.getLong(3)).sum == 64L * 64L)
    perFile.sliding(2).foreach { case Array(prev, next) =>
      assert(prev.getLong(2) < next.getLong(1),
        s"file z-ranges overlap: $prev vs $next")
    }
  }
}
