package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface. The reference is batch-only (its only
 * "incremental" behavior is a 30 s Step Functions poll loop,
 * lib/data-integration-workflow.ts:43-72), so streaming is additive
 * capability: the same event-table analytics, expressed as an incremental
 * query with watermarking, for pipelines that tail a crawl/event feed.
 */
object EventStream {

  /**
   * Windowed event counts over a parquet directory consumed as a stream.
   * Runs the streaming query to completion on available data (memory sink)
   * and returns the result — semantics identical to the batch equivalent
   * [[windowedCountsBatch]], verified in tests.
   */
  def windowedCounts(spark: SparkSession, dir: String,
                     window: String = "1 hour", watermark: String = "2 hours",
                     queryName: String = "event_counts"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    // FileStreamSource wants a directory or a glob; turn a plain file path
    // into an equivalent single-match glob so single-file tables stream too
    val src = if (new java.io.File(dir).isFile) {
      val last = dir.last
      dir.dropRight(1) + s"[$last]"
    } else dir
    val stream = spark.readStream.schema(schema).parquet(src)
      // event-time column must be session-tz TIMESTAMP (parquet stores NTZ);
      // session is pinned UTC so the instant is unchanged
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
    val q = stream.writeStream
      .format("memory").queryName(queryName)
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }

  /** The batch-mode equivalent (for parity testing and the DuckDB oracle). */
  def windowedCountsBatch(spark: SparkSession, dir: String,
                          window: String = "1 hour"): DataFrame =
    spark.read.parquet(dir)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
}
