package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: AQE on, UTC, shuffle partitions = cores,
  * tmpfs-backed shuffle dirs when available (local-mode benchmarking). */
object GraftSession {
  def create(cpus: Int, appName: String = "graft"): SparkSession = {
    // honor an externally-provided master (spark-submit to a real cluster);
    // `cpus` then only sizes shuffle partitions
    val base = SparkSession.builder().appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
    val b = (if (sys.props.contains("spark.master")) base
             else base.master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    val withDir = if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-spark") else b
    val s = withDir.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
