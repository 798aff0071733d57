package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: AQE on, UTC, shuffle partitions = cores,
  * tmpfs-backed shuffle dirs when available (local-mode benchmarking). */
object GraftSession {
  def create(cpus: Int, appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
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
