package graft

/** BucketBench must measure the REAL q267 shape: its inlined ship-latency
  * chain over plain frames has to return the same (priority, n, median,
  * p90) values as the registered query — otherwise the head-to-head
  * numbers in BUCKETBENCH_*.json describe some other plan. (The bench
  * drops q267's min/max columns, so the comparison projects the shared
  * ones.) */
class BucketBenchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bench chain value-parity with the registered q267 query") {
    val bench = BucketBench.shipLatency(
        Tables.load(spark, dir, "lineitem"), Tables.load(spark, dir, "orders"))
      .select("o_orderpriority", "n", "med_days", "p90_days")
    val q267 = Queries.q267ShipLatency(spark, dir)
      .select("o_orderpriority", "n", "med_days", "p90_days")
    assert(bench.exceptAll(q267).isEmpty && q267.exceptAll(bench).isEmpty)
  }
}
