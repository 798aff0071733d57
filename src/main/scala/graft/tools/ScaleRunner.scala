package graft.tools

import graft.pipeline.EntityResolution

/**
 * One "cluster size" of the scaling experiment, in its own JVM: a fresh
 * local[N] session with GC threads ∝ N (spawned by graft.Bench), a warmup
 * pass (JIT + codegen), then the measured full-pipeline run.
 * Prints exactly one line: `[scale] cpus=<n> sec=<t> docs=<d> ...`, plus
 * optional per-stage diagnostics when SPARK_GRAFT_STAGES=1 (stage wall,
 * summed task run time vs task CPU time — separating memory/lock WAIT from
 * genuine CPU inflation).
 */
object ScaleRunner {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def phase(m: String): Unit =
      System.err.println(f"[scale-phase] +${(System.nanoTime() - t0) / 1e9}%.0fs $m")
    phase("main")
    val cpus = args(0).toInt
    val corpus = args(1)
    val warmupCorpus = args(2)
    val stageDiag = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    val spark = graft.GraftSession.create(cpus, s"graft-scale-$cpus")
    phase("session up")
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val cpuTime = new java.util.concurrent.atomic.AtomicLong()
    val gcTime = new java.util.concurrent.atomic.AtomicLong()
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(e.taskMetrics.executorRunTime)
        cpuTime.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
        gcTime.addAndGet(e.taskMetrics.jvmGCTime)
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (stageDiag) {
        val si = e.stageInfo
        val run = si.taskMetrics.executorRunTime / 1000.0
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val shr = si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0
        val shw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0
        stageRows.add(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=$wall%6.2f run=$run%7.2f cpu=$cpu%7.2f shR=$shr%7.1fMB shW=$shw%7.1fMB " +
          si.name.takeWhile(_ != '\n').take(60))
      }
    })
    // Host CPU accounting via HostStat: `steal` is time our vCPUs were
    // runnable but the hypervisor ran someone else — on this shared-tenant
    // Firecracker host the direct cause of the measured 2-4x same-work wall
    // swings. Sampled around the measured section so the bench JSON
    // separates host interference (steal) from pipeline scaling.
    def procStat(): (Double, Double) = HostStat.procStat()
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
    phase("warmup done")
    // The window may have turned during the ~1 min of JVM startup + warmup:
    // re-check steal AT this level's concurrency immediately before the
    // measured run (bounded wait; the wall Bench subtracts as overhead grows
    // by the wait, honestly). Steal observed DURING the measured section is
    // reported regardless.
    HostStat.awaitQuiet(threads = math.min(cpus, 8),
      maxTries = if (cpus >= 32) 2 else 4, // 32-thread windows rarely clear
      okSteal = 0.15, canWait = () => true,
      log = m => System.err.println(s"[scale-gate] $m"))
    taskTime.set(0); cpuTime.set(0); gcTime.set(0); stageRows.clear()
    val (busy0, steal0) = procStat()
    val (sec, docs) = run(corpus) // measured, steady-state
    val (busy1, steal1) = procStat()
    phase("measured done")
    val stealSec = steal1 - steal0
    val busySec = busy1 - busy0
    val measuredTask = taskTime.get()
    val measuredCpu = cpuTime.get()
    val measuredGc = gcTime.get()
    val util = measuredTask / 1000.0 / (sec * cpus)
    if (stageDiag) stageRows.forEach(r => System.out.println(r))
    // Frequency calibration: a fixed pure-CPU probe (no shuffle, no alloc)
    // run at this level's concurrency. On this host the per-core clock drops
    // as more cores go active (turbo), so thread-count stand-ins for N vs 4N
    // EXECUTOR clusters under-measure pipeline scaling by exactly this
    // ratio — separate machines run at the same clock. Bench reports raw
    // efficiency AND the probe-normalized value, with the probe numbers.
    import org.apache.spark.sql.functions._
    def probe(): Double = {
      val c0 = taskTime.get()
      spark.range(0, 150000000L, 1, cpus * 4)
        .select(sum(pmod(xxhash64(xxhash64(xxhash64(col("id")))), lit(1000000007L)))).head()
      (taskTime.get() - c0) / 1000.0
    }
    probe() // JIT warm
    val calCoreSec = probe() // single measured rep — part of per-child overhead
    println(f"[scale] cpus=$cpus sec=$sec%.3f docs=$docs " +
      f"taskSec=${measuredTask / 1000.0}%.1f cpuSec=${measuredCpu / 1000.0}%.1f " +
      f"gcSec=${measuredGc / 1000.0}%.1f util=$util%.2f calCoreSec=$calCoreSec%.2f " +
      f"stealSec=$stealSec%.1f busySec=$busySec%.1f")
    spark.stop()
    // clean up tmpfs stage tables (Bench points java.io.tmpdir at /dev/shm)
    val tmp = System.getProperty("java.io.tmpdir")
    if (tmp != null && tmp.startsWith("/dev/shm/graft-scale"))
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      catch { case _: Exception => }
  }
}
