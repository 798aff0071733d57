package graft.tools

/** Dev tool: dump formatted physical plans for plan-quality review
  * (pushdown, broadcast choice, codegen spans). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(8, "graft-explain")
    val sf = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"========== $name ==========")
      graft.SparkEntry.queries(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
