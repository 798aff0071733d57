package graft.tools

import org.apache.spark.sql.functions._

import graft.blocking.Blocking
import graft.pipeline.EntityResolution

/** Dev probe: what fraction of records participate in (a) any candidate
  * pair, (b) any stage-1 funnel survivor? Decides whether pruning the
  * scoring funnel's per-record sides pays on the FULL resolve path.
  * Usage: runMain graft.tools.PairCoverage <nEntities> [cpus] */
object PairCoverage {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cpus = if (args.length > 1) args(1).toInt else 16
    val spark = graft.GraftSession.create(cpus, "graft-paircov")
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/graft-bench-corpus-$n"
    val pages = spark.read.parquet(path)
    val cfg = EntityResolution.Config()
    val records = EntityResolution.normalizeWithSig(pages, cfg)
      .select("id", "source", "title_norm", "domain_key", "sort_key", "sig", "tok", "n_tok")
      .localCheckpoint()
    val (keys, _) = Blocking.blockKeys(records, cfg.blocking)
    val pairs = Blocking.candidatePairs(keys)
      .union(Blocking.sortedNeighborhoodPairs(records, cfg.blocking))
      .distinct().localCheckpoint()
    val nRec = records.count()
    val nPairs = pairs.count()
    val ids = pairs.select(col("main_id").as("id"))
      .union(pairs.select(col("sub_id").as("id"))).distinct().count()
    println(f"[paircov] records=$nRec pairs=$nPairs coveredIds=$ids frac=${ids.toDouble / nRec}%.3f")
    spark.stop()
  }
}
