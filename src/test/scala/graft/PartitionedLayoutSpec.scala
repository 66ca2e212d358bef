package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val path = new java.io.File(
    "target/rt/partspec").getAbsolutePath

  private def writeCorpus(): Unit =
    (1 to 500).map(i => (i.toLong, s"text $i", s"lang${i % 5}"))
      .toDF("id", "text", "lang")
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(path)

  test("lang predicate prunes partition directories at planning time") {
    writeCorpus()
    val q = spark.read.parquet(path).filter(col("lang") === "lang3")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // the predicate must land in PartitionFilters (directory-level skip),
    // not DataFilters (open-the-file-and-filter)
    assert(scan.partitionFilters.nonEmpty,
      s"lang predicate not recognized as a partition filter:\n$scan")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of 5 partition dirs, scanned ${scan.selectedPartitions.partitionCount}")
    assert(q.count() == 100)
  }

  test("partition values round-trip from directory names, nulls included") {
    (1 to 20).map(i => (i.toLong, if (i % 4 == 0) null else s"l${i % 2}"))
      .toDF("id", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(path + "_nulls")
    val back = spark.read.parquet(path + "_nulls")
    // Hive layout spells null as __HIVE_DEFAULT_PARTITION__ — it must read
    // back as a real NULL, and non-null values must survive exactly
    assert(back.filter(col("lang").isNull).count() == 5)
    assert(back.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ==
      // i in 1..20: multiples of 4 are null (5); odd i -> l1 (10);
      // even-not-multiple-of-4 -> l0 (5)
      Map(Some("l0") -> 5, Some("l1") -> 10, None -> 5))
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    writeCorpus()
    val before = spark.read.parquet(path).count()
    // static overwrite of one partition's worth of new rows under dynamic
    // mode must leave the other four directories untouched
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((9001L, "fresh", "lang3")).toDF("id", "text", "lang")
        .write.mode("overwrite").partitionBy("lang").parquet(path)
      val after = spark.read.parquet(path)
      assert(after.filter(col("lang") === "lang3").count() == 1)
      assert(after.filter(col("lang") =!= "lang3").count() == before - 100)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }
}
