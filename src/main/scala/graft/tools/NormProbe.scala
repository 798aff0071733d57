package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.pipeline.EntityResolution

/** Dev tool: decompose the normalize+sig scan stage (the ER pipeline's
  * largest work share) into its per-record expression costs. Each step is
  * timed with a noop sink (computes every column, discards — guide §1.4)
  * after one warmup; prints wall + summed task-seconds.
  *
  * Usage: runMain graft.tools.NormProbe <cpus> <nEntities>
  */
object NormProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val spark = graft.GraftSession.create(cpus, s"graft-normprobe-$cpus")
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskTime.addAndGet(e.taskMetrics.executorRunTime)
    })
    // corpus from parquet, like resolve() sees it
    val path = s"/tmp/graft-bench-corpus-$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      graft.testgen.WebCorpus.pages(spark, n).toDF()
        .write.mode("overwrite").parquet(path)
    val pages = spark.read.parquet(path)
    def bench(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      def run(): Unit = df.write.format("noop").mode("overwrite").save()
      run() // warm
      taskTime.set(0)
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[norm] cpus=$cpus n=$n $name%-28s wall=$wall%6.2f taskSec=${taskTime.get() / 1000.0}%7.2f")
    }
    val cfg = EntityResolution.Config()
    bench("scan(url,html)")(pages.select("url", "html"))
    bench("html_to_text")(pages.select(html_to_text(col("html")).as("t")))
    bench("+ascii_lower")(pages.select(ascii_lower(html_to_text(col("html"))).as("t")))
    bench("id=xxhash64(url)")(pages.select(xxhash64(col("url")).as("id")))
    bench("domain_key")(pages.select(graft.blocking.Blocking.domainKey(col("url")).as("d")))
    bench("sort_key")(pages.select(
      array_join(array_sort(split(
        regexp_extract(col("url"), "/([^/?]+)/?(\\?.*)?$", 1), "-")), " ").as("sk")))
    val tn = ascii_lower(html_to_text(col("html")))
    bench("title_norm(substr_idx)")(pages.select(substring_index(tn, " ", 8).as("ti")))
    bench("+minhash_sig")(pages.select(
      minhash_sig(tn, cfg.blocking.shingleSize, cfg.blocking.minhashHashes).as("sig")))
    bench("+pack_tokens")(pages.select(pack_tokens(tn, cfg.tokenBits).as("tok")))
    bench("normalizeWithSig(noop)")(
      EntityResolution.normalizeWithSig(pages, cfg)
        .select("id", "url", "source", "warc_ts", "lang", "title_norm",
          "domain_key", "sort_key", "sig", "tok", "n_tok"))
    val out = s"/tmp/graft-normprobe-out-$n"
    def benchW(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      def run(): Unit = df.write.mode("overwrite").parquet(out)
      run()
      taskTime.set(0)
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[norm] cpus=$cpus n=$n $name%-28s wall=$wall%6.2f taskSec=${taskTime.get() / 1000.0}%7.2f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
    benchW("normalizeWithSig(parquet)")(
      EntityResolution.normalizeWithSig(pages, cfg)
        .select("id", "url", "source", "warc_ts", "lang", "title_norm",
          "domain_key", "sort_key", "sig", "tok", "n_tok"))
    spark.stop()
  }
}
