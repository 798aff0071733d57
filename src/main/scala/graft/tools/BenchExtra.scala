package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/**
 * Extra benchmark main (guide §1.4 isolation — the driver-contract
 * `graft.Bench` is frozen; this one exists for optimization-round evidence).
 *
 * For each named query: one warmup pass, then `reps` timed passes of the
 * SAME action the frozen bench uses (`.count()`), reporting per query
 *   - best wall seconds, and
 *   - min summed executor task-seconds (SparkListener executorRunTime) —
 * task-seconds are the window-robust number on this shared-tenant host
 * (hypervisor steal moves wall 5-10x between windows while summed task time
 * moves far less), so before/after comparisons quote BOTH, measured
 * back-to-back where possible.
 *
 * Usage: runMain graft.tools.BenchExtra <sfDir> <reps> <query...>
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val known = graft.SparkEntry.queries.keySet
    val unknown = names.filterNot(known)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid: ${known.toSeq.sorted.mkString(", ")}")
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-benchextra")
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val stageDiag = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        taskMs.addAndGet(e.taskMetrics.executorRunTime)
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (stageDiag) {
        val si = e.stageInfo
        val run = si.taskMetrics.executorRunTime / 1000.0
        if (run > 0.2) {
          val shr = si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0
          val shw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0
          val in = si.taskMetrics.inputMetrics.bytesRead / 1048576.0
          println(f"[stg] run=$run%7.2f tasks=${si.numTasks}%3d in=$in%6.1f " +
            f"shR=$shr%6.1f shW=$shw%6.1f " +
            si.details.linesIterator.filter(_.startsWith("graft"))
              .take(2).mkString(" <- "))
        }
      }
    })
    graft.testgen.WebCorpus.pagesMaterialized(spark, sfDir)
    for (name <- names) {
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + JIT + page cache
      val samples = (1 to reps).map { _ =>
        // listener events drain asynchronously; settle before sampling
        Thread.sleep(200)
        val c0 = taskMs.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        (wall, (taskMs.get() - c0) / 1000.0)
      }
      println(f"[bx] $name wallBest=${samples.map(_._1).min}%.3f " +
        f"taskSecMin=${samples.map(_._2).min}%.2f " +
        f"walls=${samples.map(s => f"${s._1}%.2f").mkString(",")} " +
        f"taskSecs=${samples.map(s => f"${s._2}%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
