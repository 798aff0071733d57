package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EntityResolution

/**
 * Incremental resolve contract: folding a new batch into a prior run's
 * durable stage tables yields EXACTLY the clusters of a full re-resolve of
 * old ∪ new — while scoring only new-involving candidate pairs.
 */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("incremental resolve == full re-resolve of old ∪ new (bit-exact)") {
    val all = graft.testgen.WebCorpus.pages(spark, 800).toDF().cache()
    // deterministic content-defined 80/20 split
    val isNew = pmod(xxhash64(col("url")), lit(5)) === 4
    val oldPages = all.filter(!isNew)
    val newPages = all.filter(isNew)
    assert(newPages.count() > 100, "split produced a trivial new batch")

    val d1 = Files.createTempDirectory("graft-inc1").toString
    val d2 = Files.createTempDirectory("graft-inc2").toString
    val d3 = Files.createTempDirectory("graft-inc3").toString

    val prior = EntityResolution.resolve(oldPages,
      EntityResolution.Config(workDir = Some(d1)))
    prior.integrated.count() // force stage tables

    val inc = EntityResolution.resolveIncremental(newPages, d1,
      EntityResolution.Config(workDir = Some(d2)))
    val full = EntityResolution.resolve(all,
      EntityResolution.Config(workDir = Some(d3)))

    val cols = Seq("RecordId", "InputSourceARN", "MatchID", "ConfidenceLevel")
    val a = inc.integrated.select(cols.map(col): _*)
    val b = full.integrated.select(cols.map(col): _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "incremental integrated table differs from full re-resolve")

    // the work proof: no old×old pair was scored in the incremental run
    val oldIds = prior.integrated.select(col("RecordId").as("u"))
    val newUrls = newPages.select(col("url").as("u"))
    val scoredOldOld = inc.candidatePairs
      .join(newUrls.withColumnRenamed("u", "main_url"), Seq("main_url"), "left_anti")
      .join(newUrls.withColumnRenamed("u", "sub_url"), Seq("sub_url"), "left_anti")
    assert(scoredOldOld.count() == 0, "incremental run generated old×old pairs")

    // chained increments: state written by an incremental run is itself
    // valid prior state
    val d4 = Files.createTempDirectory("graft-inc4").toString
    val extra = all.filter(isNew).limit(0) // empty follow-up batch
    val inc2 = EntityResolution.resolveIncremental(extra, d2,
      EntityResolution.Config(workDir = Some(d4)))
    assert(inc2.integrated.count() == full.integrated.count())
  }
}
