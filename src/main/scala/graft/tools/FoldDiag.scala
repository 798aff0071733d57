package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.EntityResolution

/** Determinism bisection: fold the same batch into a given prior state dir
  * and print candidate-pair counts (use with SPARK_GRAFT_FOLD_COUNTS=1).
  * Usage: runMain graft.tools.FoldDiag <corpus> <mod> <priorDir> */
object FoldDiag {
  def main(args: Array[String]): Unit = {
    val Array(corpus, modS, prior) = args.take(3)
    val spark = graft.GraftSession.create(16, "graft-fold-diag")
    spark.sparkContext.setLogLevel("WARN")
    val all = spark.read.parquet(corpus)
    val isNew = pmod(xxhash64(col("url")), lit(modS.toInt)) === 0
    val work = s"${System.getProperty("java.io.tmpdir")}/graft-folddiag-${System.nanoTime()}"
    val r = EntityResolution.resolveIncremental(all.filter(isNew), prior,
      EntityResolution.Config(workDir = Some(work)))
    println(s"[fold-diag] candidatePairs=${r.candidatePairs.count()}")
    spark.stop()
  }
}
