package graft.tools
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.localSession(4, "graft-explain")
    val df = graft.Queries.all(args(0))(spark, "/root/testdata/sf0.001")
    df.count()
    println("==== EXECUTED ====")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
