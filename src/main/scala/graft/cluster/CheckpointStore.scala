package graft.cluster

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Durable per-iteration checkpointing with per-partition lineage metrics —
 * the Spark-native replacement for the reference's DynamoDB job-status
 * store + Step Functions 30s poll loop (reference:
 * lib/data-integration-workflow.ts:43-72, lambda/check_er_status/index.py:13-34).
 * Here the "poll" disappears (synchronous job) and what remains is what the
 * north rule actually needs: exact resume and an auditable lineage trail.
 *
 * Layout under `dir`:
 *   edges/iter=K/          parquet snapshot of the edge set after iteration K
 *   metrics/               parquet rows (iteration, partition_id, match_count,
 *                          n_edges, wall_ms, ts) — per-partition match counts
 *
 * Writes go to a temp dir first and are promoted by atomic rename, so a
 * kill mid-write never yields a half-visible iteration (the parquet
 * `_SUCCESS` marker is checked on load as a second guard).
 */
class CheckpointStore(spark: SparkSession, val dir: String) {

  private def iterPath(k: Int) = s"$dir/edges/iter=$k"

  def writeIteration(k: Int, edges: DataFrame, nEdges: Long, wallMs: Double): Unit = {
    val tmp = s"$dir/edges/.tmp-iter-$k"
    edges.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = Paths.get(iterPath(k))
    if (Files.exists(target)) { // re-run of an iteration: replace
      org.apache.commons.io.FileUtils.deleteDirectory(target.toFile)
    }
    Files.createDirectories(target.getParent)
    Files.move(Paths.get(tmp), target) // atomic promote
    // per-partition lineage: how many match edges each partition holds
    val perPart = edges.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("match_count"))
      .withColumn("iteration", lit(k))
      .withColumn("n_edges", lit(nEdges))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("ts", current_timestamp())
    perPart.write.mode(SaveMode.Append).parquet(s"$dir/metrics")
  }

  /** Latest complete iteration (dir present + _SUCCESS marker), if any. */
  def latestIteration(): Option[Int] = {
    val base = Paths.get(s"$dir/edges")
    if (!Files.exists(base)) return None
    val iters = Files.list(base).iterator()
    var best = -1
    while (iters.hasNext) {
      val p = iters.next()
      val name = p.getFileName.toString
      if (name.startsWith("iter=") && Files.exists(p.resolve("_SUCCESS"))) {
        val k = name.stripPrefix("iter=").toInt
        if (k > best) best = k
      }
    }
    if (best >= 0) Some(best) else None
  }

  def loadIteration(k: Int): DataFrame = spark.read.parquet(iterPath(k))

  def metrics(): DataFrame = spark.read.parquet(s"$dir/metrics")
}
