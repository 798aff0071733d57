package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Sim

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>` / `array<double>`).
 *
 *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
 *    set, score every (query, item) pair with a codegen'd higher-order-
 *    function dot product, take top-k per query with a bounded window.
 *  - [[lshTopK]] is the scale path: deterministic random-hyperplane sign
 *    buckets shrink the candidate set to one bucket (plus probes) per query;
 *    at 100 TB the bucket join replaces the full cross product.
 *
 * All arithmetic is double-precision, sequential (left-to-right) folds, so
 * scores are bit-stable across partitionings and parallelism levels.
 */
object Ann {

  /** cos(a,b) as a composed higher-order-function expression (codegen'd). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  /**
   * Deterministic sign-LSH bucket id: `bits` pseudo-random ±1 hyperplanes
   * derived from (bit index, dimension index) hashes — no stored model, the
   * same vector always lands in the same bucket on any cluster.
   */
  def signBucket(v: Column, bits: Int): Column = {
    val planes = (0 until bits).map { p =>
      val signed = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(signed >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** ±1 weight for (plane, dim) — mirrors Sim.mix64 determinism. */
  private def planeWeight(plane: Int, dim: Column): Column = {
    // xxhash64 of (plane, dim) → sign; pure content hash, no RNG state
    when(pmod(xxhash64(lit(plane), dim), lit(2L)) === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /**
   * Exact top-k cosine neighbors for each query vector.
   * @param items   (idCol, vecCol) corpus
   * @param queries (queryIdCol, vecCol) — small; broadcast
   */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv")))
    val scored = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"))
      .crossJoin(q)
      .select(col("query_id"), col("item_id"), cosine(col("iv"), col("qv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * LSH-bucketed ANN: candidates = items sharing the query's sign bucket or
   * any 1-bit-flipped probe bucket (multi-probe raises recall on boundary
   * vectors), then exact cosine + top-k within candidates.
   */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
              maxFlip: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    val bucketedItems = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"))
      .withColumn("bucket", signBucket(col("iv"), bits))
    // multi-probe: the query's bucket plus every bucket within `maxFlip`
    // bit flips — boundary vectors land in adjacent buckets
    val masks = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= maxFlip)
    val probes = masks.map(m => col("qb").bitwiseXOR(lit(m)))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qb", signBucket(col("qv"), bits))
      .withColumn("bucket", explode(array(probes: _*)))
      .drop("qb"))
    val scored = bucketedItems.join(q, "bucket")
      .select(col("query_id"), col("item_id"), cosine(col("iv"), col("qv")).as("cosine"))
      .dropDuplicates("query_id", "item_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Driver-side exact cosine for tests. */
  def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
