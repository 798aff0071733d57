package graft.tools

import graft.pipeline.EntityResolution
import graft.testgen.WebCorpus

/** Dev tool: fixed-cost (driver/scheduling/codegen) share of a resolve run —
  * times a tiny corpus repeatedly in a warm JVM. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 8
    val spark = graft.GraftSession.create(cpus, "graft-overhead")
    for (i <- 1 to 3) {
      val pages = WebCorpus.pages(spark, 2000).toDF()
      val t0 = System.nanoTime()
      val r = EntityResolution.resolve(pages)
      r.integrated.count()
      println(f"[overhead] run $i (n=2000, local[$cpus]): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r.scoredPairs.unpersist()
    }
    spark.stop()
  }
}
