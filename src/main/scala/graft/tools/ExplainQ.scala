package graft.tools

/** Formatted-plan audit: runMain graft.tools.ExplainQ <sfDir> <name> [name...] */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.Engine.localSession(4, "graft-explain")
    names.foreach { name =>
      println(s"\n######## $name ########")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
