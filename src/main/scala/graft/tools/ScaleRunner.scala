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
    run(warmupCorpus) // JIT + codegen + shuffle-path warmup
    val (sec, docs) = run(corpus)
    println(f"[scale] cpus=$cpus sec=$sec%.3f docs=$docs")
    spark.stop()
  }
}
