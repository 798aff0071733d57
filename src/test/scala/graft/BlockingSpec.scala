package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.blocking.Blocking
import graft.pipeline.EntityResolution
import graft.testgen.WebCorpus

class BlockingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val records = EntityResolution.normalizeWithSig(
    WebCorpus.pages(spark, 1200).toDF(), EntityResolution.Config()).cache()
  // blocking works in 64-bit id space; map the labeled urls the same way
  private lazy val labeled = WebCorpus.labeledPairs(spark, 1200).toDF()
    .select(xxhash64(col("main_url")).as("main_id"), xxhash64(col("sub_url")).as("sub_id"))

  test("domain key normalizes scheme, mobile prefixes and TLDs") {
    import spark.implicits._
    val got = Seq("https://www.site3.com/x", "https://m.site3.net/y",
      "http://amp.site3.io/z", "https://mirror5.example/w")
      .toDF("url").select(Blocking.domainKey(col("url")).as("k"))
      .collect().map(_.getString(0))
    assert(got.take(3).forall(_ == "site3"))
    assert(got(3) == "mirror5")
  }

  test("union of blocking passes covers ≥99% of labeled pairs") {
    val (keys, _) = Blocking.blockKeys(records)
    val covered = Blocking.candidatePairs(keys)
      .union(Blocking.sortedNeighborhoodPairs(records))
      .distinct()
    val hit = labeled.join(covered, Seq("main_id", "sub_id"), "left_semi").count()
    val total = labeled.count()
    assert(hit.toDouble / total >= 0.99, s"coverage $hit/$total")
  }

  test("hierarchical re-keying bounds block sizes and logs drops") {
    val cfg = Blocking.Config(maxBlock = 8)
    val (keys, stats) = Blocking.blockKeys(records, cfg)
    val maxAfter = keys.groupBy("block_key").count().agg(max("count")).head().getLong(0)
    assert(maxAfter <= cfg.maxBlock * 4L, s"residual block of $maxAfter")
    val s = stats.head()
    assert(s.getLong(s.fieldIndex("n_blocks")) > 0)
    // dropped_rows is reported, never silent
    assert(s.schema.fieldNames.contains("dropped_rows"))
  }

  test("blocking keys are pure functions of content (partitioning-independent)") {
    val (k1, _) = Blocking.blockKeys(records.repartition(3))
    val (k2, _) = Blocking.blockKeys(records.repartition(11))
    assert(k1.exceptAll(k2).count() == 0)
    assert(k2.exceptAll(k1).count() == 0)
  }

  test("sorted-neighborhood pairs records with equal slug sort keys") {
    val sn = Blocking.sortedNeighborhoodPairs(records)
    val hit = labeled.join(sn, Seq("main_id", "sub_id"), "left_semi").count()
    // every matched pair shares an identical sort key → SN alone nearly covers
    assert(hit.toDouble / labeled.count() >= 0.95)
  }
}
