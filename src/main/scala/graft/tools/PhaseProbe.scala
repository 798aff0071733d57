package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.blocking.Blocking
import graft.cluster.ConnectedComponents
import graft.pipeline.EntityResolution
import graft.testgen.WebCorpus

/** Dev tool: per-phase wall-clock of the ER pipeline at a given parallelism. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val spark = graft.GraftSession.create(cpus, "graft-probe")
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val stageDiag = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskTime.addAndGet(e.taskMetrics.executorRunTime)
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (stageDiag) {
        val si = e.stageInfo
        val run = si.taskMetrics.executorRunTime / 1000.0
        if (run > 0.3) {
          val shr = si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0
          val shw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0
          println(f"[stg] run=$run%7.2f tasks=${si.numTasks}%3d shR=$shr%6.1f shW=$shw%6.1f " +
            si.details.linesIterator.filter(_.startsWith("graft")).take(2).mkString(" <- "))
        }
      }
    })
    def time[T](name: String)(f: => T): T = {
      val c0 = taskTime.get(); val t0 = System.nanoTime(); val r = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"taskSec=${(taskTime.get() - c0) / 1000.0}%.2f"); r
    }
    val cfg = EntityResolution.Config()
    val pages0 = WebCorpus.pages(spark, n).toDF()
    val pages = sys.env.get("SPARK_GRAFT_FIXED_PARTS") match {
      case Some(p) => pages0.repartition(p.toInt)
      case None => pages0
    }
    val recordsRaw = EntityResolution.normalizeWithSig(pages, cfg)
      .select("id", "url", "source", "warc_ts", "lang", "title_norm",
        "domain_key", "sort_key", "sig", "tok", "n_tok")
    val records = if (sys.env.get("SPARK_GRAFT_MAT").contains("parquet")) {
      val p = s"/dev/shm/graft-probe-records-$cpus"
      time("normalize+sig (parquet write)") {
        recordsRaw.write.mode("overwrite").parquet(p)
      }
      spark.read.parquet(p)
    } else {
      val r = recordsRaw.persist(StorageLevel.MEMORY_AND_DISK)
      time("normalize+sig (materialize)") { r.count() }
      r
    }
    val (keys, _) = Blocking.blockKeys(records, cfg.blocking)
    val kp = keys.persist(StorageLevel.MEMORY_AND_DISK)
    time("blockKeys") { kp.count() }
    val pairs = time("candidatePairs+SN") {
      val p = Blocking.candidatePairs(kp)
        .union(Blocking.sortedNeighborhoodPairs(records, cfg.blocking))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  pairs=${p.count()}"); p
    }
    val edges = time("scoring") {
      val e = EntityResolution.scorePairs(pairs, records, cfg)
        .filter(col("score") >= cfg.tau).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  edges=${e.count()}"); e
    }
    time("cc") {
      ConnectedComponents.run(
        edges.select(col("main_id").as("src"), col("sub_id").as("dst"))).count()
    }
    spark.stop()
  }
}
