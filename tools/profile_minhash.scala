// Profiling script: spark-shell -i tools/profile_minhash.scala
// (driver-side tooling only, not part of the library)
import org.apache.spark.sql.functions._
import graft.operators._

val dir = "/root/testdata/sf0.1"
val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
val planted = docs.filter(col("doc_id") % 25 === 0)
  .select((col("doc_id") + lit(1000000L)).as("doc_id"),
    array_join(slice(TextOps.tokens(col("text")), 3, 100000), " ").as("text"))
val corpus = docs.unionByName(planted)

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"== $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
}

time("corpus count")(println(corpus.count()))
val cands = Dedup.minhashCandidates(corpus, "doc_id", "text", 3, 32, 8)
time("candidates")(println("cand pairs: " + cands.count()))
time("full neardups")(println("near dups: " +
  Dedup.minhashNearDups(corpus, "doc_id", "text", 0.5).count()))
System.exit(0)
