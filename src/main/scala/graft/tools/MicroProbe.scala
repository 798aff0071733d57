package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: isolates which Spark primitive inflates per-task CPU under
  * thread concurrency on this host — pure codegen compute vs a long-key
  * shuffle vs a string shuffle. Prints summed task run time per job. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = graft.GraftSession.create(cpus, s"graft-micro-$cpus")
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskTime.addAndGet(e.taskMetrics.executorRunTime)
    })
    def bench(name: String)(f: => Unit): Unit = {
      f // warmup
      taskTime.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[micro] cpus=$cpus $name wall=$wall%.2f taskSec=${taskTime.get() / 1000.0}%.2f")
    }
    val n = 40000000L
    bench("cpu_only") {
      spark.range(0, n, 1, cpus * 4)
        .select(sum(pmod(xxhash64(xxhash64(xxhash64(col("id")))), lit(1000000007L))).as("s")).head()
    }
    bench("shuffle_longs") {
      spark.range(0, n / 4, 1, cpus * 4)
        .groupBy(pmod(xxhash64(col("id")), lit(1000000L)).as("k"))
        .agg(count(lit(1)).as("c")).select(sum("c")).head()
    }
    bench("shuffle_wide_longs") {
      // every row a distinct key — forces full-width exchange like pair dedup
      spark.range(0, n / 8, 1, cpus * 4)
        .select(xxhash64(col("id")).as("k"), col("id"))
        .repartition(col("k"))
        .select(sum("id")).head()
    }
    bench("blockkeys_replica") {
      // exact blockKeys oversized-detection shape over the real records table
      val recs = spark.read.parquet("/dev/shm/graft-probe-records-8")
      val bandKeys = (0 until 5).map { b =>
        xxhash64(lit(b + 1), xxhash64(slice(col("sig"), b * 3 + 1, 3)))
      }
      val domain = recs.select(col("id"), col("source"),
        xxhash64(lit(0), col("domain_key")).as("block_key"), col("title_norm"))
      val lsh = recs.select(col("id"), col("source"),
        explode(array(bandKeys: _*)).as("block_key"), col("title_norm"))
      domain.unionByName(lsh).groupBy("block_key").agg(count(lit(1)).as("n"))
        .filter(col("n") > 64).select(count(lit(1))).head()
    }
    bench("bandkeys_only") {
      val recs = spark.read.parquet("/dev/shm/graft-probe-records-8")
      val bandKeys = (0 until 5).map { b =>
        xxhash64(lit(b + 1), xxhash64(slice(col("sig"), b * 3 + 1, 3)))
      }
      recs.select(explode(array(bandKeys: _*)).as("k"))
        .select(sum(pmod(col("k"), lit(1000000007L)))).head()
    }
    bench("corpus_scan_only") {
      spark.read.parquet("/tmp/graft-bench-corpus-160000")
        .select(sum(pmod(xxhash64(col("html")), lit(1000000007L)))).head()
    }
    bench("corpus_extract") {
      import graft.functions.GraftFunctions._
      spark.read.parquet("/tmp/graft-bench-corpus-160000")
        .select(sum(pmod(xxhash64(html_to_text(col("html"))), lit(1000000007L)))).head()
    }
    bench("join_smj") {
      val a = spark.range(0, 2000000L, 1, cpus * 4)
        .select(xxhash64(col("id")).as("k"), col("id").as("va"))
      val b = spark.range(0, 2000000L, 1, cpus * 4)
        .select(xxhash64(col("id")).as("k"), col("id").as("vb"))
      a.join(b, "k").select(sum(col("va") + col("vb"))).head()
    }
    bench("persist_cache") {
      val c = spark.read.parquet("/tmp/graft-bench-corpus-160000")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.select(sum(pmod(xxhash64(col("html")), lit(1000000007L)))).head()
      c.select(sum(pmod(xxhash64(col("text")), lit(1000000007L)))).head()
      c.select(sum(pmod(xxhash64(col("url")), lit(1000000007L)))).head()
      c.unpersist(true)
    }
    bench("wide_string_alloc") {
      // mirrors normalize: per-row KB-size string allocations through a
      // transform chain (repeat → reverse → substr), all codegen'd
      val n2 = 400000L
      spark.range(0, n2, 1, cpus * 4)
        .select(repeat(concat(lit("page text body "), col("id")), 150).as("s"))
        .select(substring(reverse(col("s")), 1, 2000).as("t"))
        .select(sum(pmod(xxhash64(col("t")), lit(1000000007L)))).head()
    }
    bench("groupby_highcard") {
      // every key distinct → partial-agg hash map as large as the partition
      spark.range(0, 3000000L, 1, cpus * 4)
        .groupBy(xxhash64(col("id")).as("k"))
        .agg(count(lit(1)).as("c")).select(sum("c")).head()
    }
    bench("distinct_highcard") {
      spark.range(0, 3000000L, 1, cpus * 4)
        .select(xxhash64(col("id")).as("k"), xxhash64(col("id"), lit(1)).as("v"))
        .distinct().select(count(lit(1))).head()
    }
    bench("shuffle_strings") {
      spark.range(0, n / 16, 1, cpus * 4)
        .select(concat(lit("https://www.site"), col("id") % 5000,
          lit(".com/some-page-slug-"), col("id")).as("k"), col("id"))
        .repartition(col("k"))
        .select(sum("id")).head()
    }
    spark.stop()
  }
}
