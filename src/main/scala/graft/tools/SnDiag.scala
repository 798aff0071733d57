package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.EntityResolution
import graft.blocking.Blocking

/** SN determinism probe: recompute the fold's snRecords from a prior dir,
  * run sortedNeighborhoodPairs twice in-session, dump both to parquet.
  * Usage: runMain graft.tools.SnDiag <corpus> <mod> <priorDir> <outDir> */
object SnDiag {
  def main(args: Array[String]): Unit = {
    val Array(corpus, modS, prior, out) = args.take(4)
    val spark = graft.GraftSession.create(16, "graft-sn-diag")
    spark.sparkContext.setLogLevel("WARN")
    val all = spark.read.parquet(corpus)
    val isNew = pmod(xxhash64(col("url")), lit(modS.toInt)) === 0
    val cfg = EntityResolution.Config()
    val batch = EntityResolution.normalizeWithSig(all.filter(isNew), cfg)
    val oldRecords = spark.read.parquet(s"$prior/records.parquet")
    val batchPath = s"$out/records_new.parquet"
    batch.select(oldRecords.columns.map(col): _*)
      .write.mode("overwrite").parquet(batchPath)
    val records = spark.read.parquet(s"$prior/records.parquet", batchPath)
    // seed with ALL records' buckets touched by new ids (superset is fine
    // for the determinism question: fixed input, repeated computation)
    val newIds = spark.read.parquet(batchPath).select("id")
    val bucketOf = substring(col("sort_key"), 1, cfg.blocking.snBucketLen)
    val touched = records.join(newIds, Seq("id"), "left_semi")
      .select(bucketOf.as("b")).distinct()
    val snRecords = records.join(touched, bucketOf === col("b"), "left_semi")
    val sn1 = Blocking.sortedNeighborhoodPairs(snRecords, cfg.blocking)
    val sn2 = Blocking.sortedNeighborhoodPairs(snRecords, cfg.blocking)
    sn1.write.mode("overwrite").parquet(s"$out/sn1.parquet")
    sn2.write.mode("overwrite").parquet(s"$out/sn2.parquet")
    val a = spark.read.parquet(s"$out/sn1.parquet")
    val b = spark.read.parquet(s"$out/sn2.parquet")
    println(s"[sn-diag] snRecords=${snRecords.count()} sn1=${a.count()} sn2=${b.count()} " +
      s"aMinusB=${a.exceptAll(b).count()} bMinusA=${b.exceptAll(a).count()}")
    println("[sn-diag] executed plan of sn:")
    println(sn1.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
