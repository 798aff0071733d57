package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Large-scale training-data deduplication operators. All are content-keyed
 * (never partition-dependent), shuffle on the dedup key only, and bound
 * candidate-pair fan-out by blocking — the same skew discipline as the ER
 * blocking layer (graft.blocking.Blocking).
 */
object Dedup {

  /**
   * Exact dedup by content hash: one surviving row per md5(text), the
   * survivor being the smallest id (deterministic). Single hash-shuffle,
   * map-side partial aggregation.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_md5")).orderBy(col(idCol))
    df.withColumn("content_md5", md5(col(textCol).cast("binary")))
      .withColumn("rn", row_number().over(w))
      .withColumn("is_duplicate", col("rn") > 1)
      .drop("rn")
  }

  /**
   * MinHash + LSH near-duplicate pairs: signature → band keys → bucket join
   * → verify with exact token-Jaccard ≥ tau. Only bucket-colliding pairs are
   * ever scored (candidate generation is linear in corpus size for bounded
   * buckets; oversized buckets are capped).
   */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 tau: Double = 0.7, numHashes: Int = 16, bandSize: Int = 2,
                 shingle: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val bands = numHashes / bandSize
    val bandKeys = (0 until bands).map { b =>
      concat(lit(s"$b:"), xxhash64(slice(col("sig"), b * bandSize + 1, bandSize)))
    }
    val keyed = df.select(col(idCol).as("id"), col(textCol).as("txt"))
      .withColumn("sig", minhash_sig(ascii_lower(col("txt")), shingle, numHashes))
      .select(col("id"), col("txt"), explode(array(bandKeys: _*)).as("bucket"))
    val hot = keyed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
    val cool = keyed.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = cool.select(col("bucket"), col("id").as("id_a"), col("txt").as("txt_a"))
    val b = cool.select(col("bucket"), col("id").as("id_b"), col("txt").as("txt_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        token_jaccard(ascii_lower(col("txt_a")), ascii_lower(col("txt_b"))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= tau)
  }

  /**
   * SimHash near-duplicate pairs: 64-bit fingerprint, banded into 4×16-bit
   * keys (any pair within hamming distance 3 shares at least one band —
   * pigeonhole), verified by exact hamming ≤ maxHamming.
   */
  def simhash(df: DataFrame, textCol: String, idCol: String,
              maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val fp = simhash64(ascii_lower(col(textCol)))
    val withFp = df.select(col(idCol).as("id"), fp.as("fp"))
    val banded = withFp.select(col("id"), col("fp"),
      explode(array((0 until 4).map(b =>
        concat(lit(s"$b:"),
          shiftright(col("fp"), b * 16).bitwiseAND(lit(0xffffL)).cast("string"))): _*))
        .as("bucket"))
    val hot = banded.groupBy("bucket").agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
    val cool = banded.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = cool.select(col("bucket"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = cool.select(col("bucket"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Word n-gram Jaccard near-dup pairs with cheap length blocking
   * (near-dups have near-equal length; pairing only adjacent length buckets
   * keeps candidates linear). Jaccard composed from codegen'd built-ins.
   */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, tau: Double = 0.5): DataFrame = {
    def grams(c: Column): Column = {
      val toks = split(c, " ")
      val cnt = greatest(size(toks) - (n - 1), lit(1)) // short text → 1 gram
      array_distinct(transform(sequence(lit(1), cnt),
        i => array_join(slice(toks, i, lit(n)), " ")))
    }
    val prep = df.select(col(idCol).as("id"), lower(col(textCol)).as("txt"))
      .withColumn("grams", grams(col("txt")))
      .withColumn("lenb", (size(split(col("txt"), " ")) / 10).cast("int"))
    val buckets = prep.select(col("id"), col("grams"),
      explode(array(col("lenb"), col("lenb") + 1)).as("bucket"))
    val a = buckets.select(col("bucket"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = buckets.select(col("bucket"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= tau)
  }

  /**
   * Embedding cosine near-duplicates: sign-LSH bucketing (deterministic
   * pseudo-random hyperplanes) then exact cosine within bucket.
   */
  def embeddingCosine(df: DataFrame, vecCol: String, idCol: String,
                      tau: Double = 0.95, bits: Int = 8): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Ann.signBucket(col("v"), bits))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Ann.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= tau)
  }
}
