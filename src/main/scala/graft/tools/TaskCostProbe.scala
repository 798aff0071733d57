package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: isolates the per-task FIXED cost (work-independent CPU every
  * task pays inside task.run) and how it scales with plan complexity.
  * Method: run the same tiny job at task counts K and 4K; the slope
  * (taskSec(4K) - taskSec(K)) / (3K) is the per-task fixed cost, with the
  * data-dependent work cancelled out.
  *
  * Usage: runMain graft.tools.TaskCostProbe <recordsParquet> [cpus]
  * (recordsParquet = a resolve() records stage table, for the deep-plan
  * variants; pass any small parquet with id/sig/tok columns)
  */
object TaskCostProbe {
  def main(args: Array[String]): Unit = {
    val recPath = args.headOption.getOrElse("/tmp/graft-taskcost-records")
    val cpus = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.create(cpus, "graft-taskcost")
    import spark.implicits._
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val taskCount = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(e.taskMetrics.executorRunTime)
        taskCount.incrementAndGet()
      }
    })
    def measure(name: String)(f: Int => Unit): Unit = {
      f(8); f(32) // warmup both shapes
      val samples = Seq(8, 32).map { k =>
        taskTime.set(0); taskCount.set(0)
        f(k)
        (taskCount.get(), taskTime.get() / 1000.0)
      }
      val Seq((n1, t1), (n2, t2)) = samples
      val slope = (t2 - t1) / math.max(1, n2 - n1)
      println(f"[taskcost] $name%-28s tasks=$n1%3d/$n2%3d taskSec=$t1%6.2f/$t2%6.2f " +
        f"perTaskFixed=${slope * 1000}%6.0f ms")
    }

    // 1. trivial plan: spark.range count — smallest possible task binary
    measure("range_count") { k =>
      spark.range(0, 1000L, 1, k).agg(count(lit(1))).head()
    }
    // 2. shallow SQL over tiny data with a shuffle
    measure("range_groupby") { k =>
      spark.range(0, 1000L, 1, k)
        .groupBy(pmod(col("id"), lit(7)).as("g")).agg(count(lit(1))).head()
    }
    // 3. deep plan over the REAL records table restricted to ~nothing:
    //    exercises the resolve-shaped task binary (parquet relation, wide
    //    schema, custom expressions) with near-zero data work
    val recs = spark.read.parquet(recPath)
    measure("records_scan_agg") { k =>
      recs.repartition(k).filter(col("id") === 0L).agg(count(lit(1))).head()
    }
    // 4. the blockKeys-shaped plan (explode + hash) on near-zero rows
    measure("blockkeys_shape") { k =>
      val bandKeys = (0 until 5).map { b =>
        xxhash64(lit(b + 1), xxhash64(slice(col("sig"), b * 3 + 1, 3)))
      }
      recs.repartition(k).filter(col("id") === 0L)
        .select(col("id"), explode(array(bandKeys: _*)).as("block_key"))
        .groupBy("block_key").agg(count(lit(1))).count()
    }
    // 5. FRESH plan each run (unique literal → uncached codegen source →
    //    first-run compile + interpreted/C1 execution), tiny real work:
    //    the regime every one-shot resolve stage actually runs in
    val fresh = new java.util.concurrent.atomic.AtomicLong(7777)
    def freshMeasure(name: String, rows: Long): Unit = {
      val samples = Seq(8, 32).map { k =>
        val seed = fresh.incrementAndGet() // new codegen class per run
        taskTime.set(0); taskCount.set(0)
        spark.range(0, rows, 1, k)
          .groupBy(pmod(xxhash64(col("id"), lit(seed)), lit(101L)).as("g"))
          .agg(sum(col("id") % lit(seed)).as("s")).count()
        (taskCount.get(), taskTime.get() / 1000.0)
      }
      val Seq((n1, t1), (n2, t2)) = samples
      val slope = (t2 - t1) / math.max(1, n2 - n1)
      println(f"[taskcost] $name%-28s tasks=$n1%3d/$n2%3d taskSec=$t1%6.2f/$t2%6.2f " +
        f"perTaskFixed=${slope * 1000}%6.0f ms")
    }
    freshMeasure("fresh_plan_tiny", 1000L)
    freshMeasure("fresh_plan_1m_rows", 1000000L)
    // 6. concurrency mode (invoke once at cpus=1 and once at cpus=4 and
    //    compare taskSec): FIXED task counts, so any cross-level CPU delta
    //    is pure thread-concurrency contention, not task-count structure
    def conc(name: String)(f: => Unit): Unit = {
      f // warmup (codegen + JIT)
      taskTime.set(0); taskCount.set(0)
      f
      println(f"[conc] cpus=$cpus $name%-24s tasks=${taskCount.get()}%3d " +
        f"taskSec=${taskTime.get() / 1000.0}%6.2f")
    }
    conc("alu_xxhash_chain") {
      spark.range(0, 40000000L, 1, 8)
        .select(sum(pmod(xxhash64(xxhash64(col("id"))), lit(1000000007L)))).head()
    }
    conc("hashagg_2m_keys") {
      spark.range(0, 8000000L, 1, 8)
        .groupBy(xxhash64(col("id")).as("k")).agg(count(lit(1)).as("c"))
        .select(sum("c")).head()
    }
    conc("hashagg_small_keys") {
      spark.range(0, 8000000L, 1, 8)
        .groupBy(pmod(xxhash64(col("id")), lit(1000L)).as("k")).agg(count(lit(1)).as("c"))
        .select(sum("c")).head()
    }
    conc("sort_8m") {
      spark.range(0, 8000000L, 1, 8)
        .select(xxhash64(col("id")).as("k"))
        .repartition(8, col("k"))
        .sortWithinPartitions("k")
        .select(count(lit(1))).head()
    }
    spark.stop()
  }
}
