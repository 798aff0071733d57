package graft.tools

import org.apache.spark.sql.SparkSession
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
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cfg = EntityResolution.Config()
    val pages = WebCorpus.pages(spark, n).toDF()
    val records = EntityResolution.normalizeWithSig(pages, cfg)
      .select("url", "source", "warc_ts", "lang", "text_norm", "title_norm",
        "domain_key", "sort_key", "sig")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("normalize+sig (materialize)") { records.count() }
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
        edges.select(col("main_url").as("src"), col("sub_url").as("dst"))).count()
    }
    spark.stop()
  }
}
