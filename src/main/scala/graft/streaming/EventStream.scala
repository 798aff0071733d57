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

  // public: Dataset encoders generate accessor code that needs visibility
  case class EventRow(event_id: Long, event_type: String, ts: java.sql.Timestamp)

  /**
   * Streaming stateful dedup: per key, emit only the FIRST event ever seen —
   * custom state through `KeyValueGroupedDataset.flatMapGroupsWithState`
   * (the pattern a streaming exact-dedup / first-crawl-wins pipeline needs;
   * at scale state is per-key-partitioned and checkpointed by the engine).
   * Earliest = min (event time, event_id) — arrival-order-independent, so
   * the result equals the batch "first row per key" and is oracle-checkable.
   */
  def firstSeen(spark: SparkSession, dir: String,
                queryName: String = "first_seen"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = spark.read.parquet(dir).schema
    val src = if (new java.io.File(dir).isFile) {
      val last = dir.last
      dir.dropRight(1) + s"[$last]"
    } else dir
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // per-file micro-batches: state must carry across
      .parquet(src)
      .select(col("event_id"), col("event_type"), col("ts").cast("timestamp").as("ts"))
      .as[EventRow]
    val out = events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[EventRow], state: GroupState[(Long, Long)]) => {
          // state = (first ts millis, first event_id)
          val incoming = rows.map(r => (r.ts.getTime, r.event_id))
          val best = (state.getOption.iterator ++ incoming)
            .min(Ordering[(Long, Long)])
          if (state.getOption.contains(best)) Iterator.empty // no improvement
          else {
            state.update(best)
            Iterator.single((key, best._2, best._1 / 1000))
          }
        })
      .toDF("event_type", "first_event_id", "first_epoch")
    val q = out.writeStream
      .format("memory").queryName(queryName)
      .outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    // update-mode memory sink may hold superseded rows from earlier batches;
    // keep each key's final (minimal) emission
    val t = spark.table(queryName)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      .orderBy(col("first_epoch").asc, col("first_event_id").asc)
    t.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
