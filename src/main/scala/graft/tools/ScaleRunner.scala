package graft.tools

import graft.pipeline.EntityResolution

/**
 * One "cluster size" of the scaling experiment, in its own JVM: a fresh
 * local[N] session with GC threads ∝ N (spawned by graft.Bench), a warmup
 * pass (JIT + codegen), then the measured full-pipeline run.
 * Prints exactly one line: `[scale] cpus=<n> sec=<t> docs=<d>`.
 */
object ScaleRunner {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpus = args(1)
    val warmupCorpus = args(2)
    val spark = graft.GraftSession.create(cpus, s"graft-scale-$cpus")
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val gcTime = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(e.taskMetrics.executorRunTime)
        gcTime.addAndGet(e.taskMetrics.jvmGCTime)
      }
    })
    def run(path: String): (Double, Long) = {
      val pages = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val result = EntityResolution.resolve(pages)
      val docs = result.integrated.count()
      val secs = (System.nanoTime() - t0) / 1e9
      result.scoredPairs.unpersist()
      spark.sharedState.cacheManager.clearCache()
      (secs, docs)
    }
    run(warmupCorpus) // warm everything: JIT, codegen, page cache, shuffle path
    taskTime.set(0); gcTime.set(0)
    val (sec, docs) = run(corpus) // measured, steady-state
    val util = taskTime.get() / 1000.0 / (sec * cpus)
    println(f"[scale] cpus=$cpus sec=$sec%.3f docs=$docs " +
      f"taskSec=${taskTime.get() / 1000.0}%.1f gcSec=${gcTime.get() / 1000.0}%.1f util=$util%.2f")
    spark.stop()
  }
}
