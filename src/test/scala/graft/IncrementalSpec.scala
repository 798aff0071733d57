package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.EntityResolution

/**
 * Incremental resolve contract: folding new batches into a prior run's
 * durable stage tables yields EXACTLY the clusters of a full re-resolve of
 * everything — while scoring only new-involving candidate pairs and
 * re-clustering only components touched by a new edge.
 */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("chained incremental resolves == full re-resolve (bit-exact)") {
    val all = graft.testgen.WebCorpus.pages(spark, 800).toDF().cache()
    // deterministic content-defined splits: 60% old, two 20% batches
    val slot = pmod(xxhash64(col("url")), lit(5))
    val oldPages = all.filter(slot < 3)
    val batch1 = all.filter(slot === 3)
    val batch2 = all.filter(slot === 4)
    assert(batch1.count() > 100 && batch2.count() > 100,
      "split produced a trivial batch")

    val Seq(d1, d2, d3, d4) = (1 to 4).map(i =>
      Files.createTempDirectory(s"graft-inc$i").toString)

    val prior = EntityResolution.resolve(oldPages,
      EntityResolution.Config(workDir = Some(d1)))
    prior.integrated.count() // force stage tables

    val inc1 = EntityResolution.resolveIncremental(batch1, d1,
      EntityResolution.Config(workDir = Some(d2)))
    inc1.integrated.count() // force: d2 is the next batch's prior state
    val inc2 = EntityResolution.resolveIncremental(batch2, d2,
      EntityResolution.Config(workDir = Some(d3)))
    val full = EntityResolution.resolve(all,
      EntityResolution.Config(workDir = Some(d4)))

    val cols = Seq("RecordId", "InputSourceARN", "MatchID", "ConfidenceLevel")
    val a = inc2.integrated.select(cols.map(col): _*)
    val b = full.integrated.select(cols.map(col): _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "chained incremental integrated table differs from full re-resolve")

    // the work proof: every pair the second increment scored involves a
    // batch-2 record — no old×old rescoring
    val b2Urls = batch2.select(col("url").as("u"))
    val scoredOldOld = inc2.candidatePairs
      .join(b2Urls.withColumnRenamed("u", "main_url"), Seq("main_url"), "left_anti")
      .join(b2Urls.withColumnRenamed("u", "sub_url"), Seq("sub_url"), "left_anti")
    assert(scoredOldOld.count() == 0, "incremental run generated old×old pairs")

    // an empty follow-up batch is a no-op over valid prior state
    val d5 = Files.createTempDirectory("graft-inc5").toString
    val inc3 = EntityResolution.resolveIncremental(batch2.limit(0), d3,
      EntityResolution.Config(workDir = Some(d5)))
    assert(inc3.integrated.count() == full.integrated.count())
  }
}
