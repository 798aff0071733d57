package graft.tools

/** Dev tool: run the incremental probe with a per-stage listener so the
  * fold's (and the full side's) wall can be attributed stage by stage —
  * [inc-phase] gives phase walls (SPARK_GRAFT_PHASES=1), this adds
  * [stage] rows with run/cpu/shuffle bytes and the graft frame that
  * planned each stage.
  *
  * Usage: runMain graft.tools.FoldProfile <corpusParquet> [cpus] [mod]
  */
object FoldProfile {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 16
    val mod = if (args.length > 2) args(2).toInt else 25
    val spark = graft.GraftSession.create(cpus, "graft-fold-profile")
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val run = si.taskMetrics.executorRunTime / 1000.0
        if (run > 0.15) {
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
          val shr = si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0
          val shw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0
          val graftFrame = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("FoldProfile") &&
              !l.contains("IncrementalProbe"))
            .map(_.trim.stripPrefix("at ").take(70))
            .getOrElse(si.name.takeWhile(_ != '\n').take(70))
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d wall=$wall%6.2f " +
            f"run=$run%7.2f shR=$shr%7.1f shW=$shw%7.1f $graftFrame")
        }
      }
    })
    println(IncrementalProbe.measure(spark, corpus, mod, maxReps = 1))
    spark.stop()
  }
}
