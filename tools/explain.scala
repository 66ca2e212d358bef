// Plan audit: spark-shell -i tools/explain.scala (driver-side tooling)
import graft._

val dir = "/root/testdata/sf0.01"
val interesting = Seq(
  "q01_pricing_summary",   // agg: expect parquet filter pushdown + partial agg
  "q02_customer_360",      // join: expect broadcast or SMJ + pruned scans
  "q03_part_performance",  // dim x fact join
  "q06_top_customers",     // window
  "q13_dedup_exact",       // digest window
  "q21_knn_brute")         // broadcast NLJ

for (name <- interesting) {
  println(s"\n######## $name ########")
  val df = Queries.all(name)(spark, dir)
  df.explain("formatted")
}
System.exit(0)
