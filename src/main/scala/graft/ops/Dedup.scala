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
 *
 * Every fuzzy operator here is verified against a brute-force oracle on the
 * deterministic test corpus (driver CORRECTNESS rows + OpsSpec recall
 * gates): the bucketed candidate generation must reproduce the exact
 * brute-force pair set at the advertised threshold.
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
   * → verify with exact token-Jaccard ≥ tau.
   *
   * Scale shape: per-document features (minhash signature, sorted token-hash
   * set) are computed once in the scan stage; ONLY (id, 8-byte band key)
   * rows flow through the band shuffle; candidate pairs are `distinct`ed
   * BEFORE the exact-scoring join, so each surviving pair is scored exactly
   * once against the compact token-hash arrays — raw text never shuffles.
   */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 tau: Double = 0.7, numHashes: Int = 16, bandSize: Int = 2,
                 shingle: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val bands = numHashes / bandSize
    val norm = ascii_lower(col(textCol))
    val sig = df.select(col(idCol).as("id"),
      minhash_sig(norm, shingle, numHashes).as("sig"))
    val bandKeys = (0 until bands).map { b =>
      xxhash64(lit(b + 1), xxhash64(slice(col("sig"), b * bandSize + 1, bandSize)))
    }
    val keyed = sig.select(col("id"), explode(array(bandKeys: _*)).as("bucket"))
    val hot = keyed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
    val cool = keyed.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = cool.select(col("bucket"), col("id").as("id_a"))
    val b = cool.select(col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // dedup band collisions BEFORE the expensive exact stage
    val toks = df.select(col(idCol).as("id"), token_hashes(norm).as("tok"))
    cand
      .join(toks.select(col("id").as("id_a"), col("tok").as("tok_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("tok").as("tok_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        token_jaccard_sorted(col("tok_a"), col("tok_b")).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /**
   * SimHash near-duplicate pairs: 64-bit fingerprint, banded into 8×8-bit
   * keys. By pigeonhole, any pair within hamming distance ≤ 7 shares at
   * least one band — so for `maxHamming ≤ 7` the banding is a LOSSLESS
   * candidate generator and the output equals the brute-force pair set
   * (enforced: callers asking for a larger budget than the banding can
   * guarantee fail fast instead of silently losing recall).
   */
  def simhash(df: DataFrame, textCol: String, idCol: String,
              maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming <= 7,
      s"8x8-bit banding guarantees recall only for hamming <= 7, got $maxHamming")
    val fp = simhash64(ascii_lower(col(textCol)))
    val withFp = df.select(col(idCol).as("id"), fp.as("fp"))
    val banded = withFp.select(col("id"), col("fp"),
      explode(array((0 until 8).map(b =>
        xxhash64(lit(b + 1),
          shiftright(col("fp"), b * 8).bitwiseAND(lit(0xffL)))): _*))
        .as("bucket"))
    val hot = banded.groupBy("bucket").agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
    val cool = banded.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = cool.select(col("bucket"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = cool.select(col("bucket"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Word n-gram Jaccard near-dup pairs with cheap length blocking. Jaccard
   * ≥ tau on gram SETS implies near-equal gram counts, and near-duplicate
   * documents have near-equal token counts, so pairing only adjacent length
   * buckets keeps candidates linear while preserving recall for same-length
   * perturbed copies. Jaccard composed from codegen'd built-ins.
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
   * Substring-level duplicate detection (the Lee et al. 2021 "Deduplicating
   * Training Data Makes Language Models Better" criterion): two documents
   * are substring-duplicates if they share ANY verbatim run of
   * `windowTokens` consecutive tokens. Every W-token sliding window is
   * fingerprinted — md5 over the space-joined window, so any engine can
   * recompute the exact fingerprint — and documents sharing ≥1 fingerprint
   * pair up with their shared-window count.
   *
   * Scale shape: the exploded (id, 16-byte fp) table is ~corpus-tokens×~20
   * bytes — the canonical linear cost of suffix-style dedup — shuffled ONCE
   * on fp; raw text never leaves the scan stage. Boilerplate windows (site
   * chrome shared by thousands of pages) would blow the self-join up
   * quadratically, so fingerprints appearing in more than
   * `maxDocsPerWindow` docs are dropped by the same hot-key cap discipline
   * as the LSH buckets (a window shared by >cap docs is boilerplate, not
   * duplication signal).
   */
  def windowFingerprint(df: DataFrame, textCol: String, idCol: String,
                        windowTokens: Int = 15,
                        maxDocsPerWindow: Int = 100000): DataFrame = {
    val w = windowTokens
    val toks = split(lower(col(textCol)), " ")
    val nWin = size(toks) - (w - 1)
    val fpsArr = when(nWin >= 1,
      array_distinct(transform(sequence(lit(1), nWin),
        i => md5(array_join(slice(toks, i, lit(w)), " ").cast("binary")))))
      .otherwise(array().cast("array<string>"))
    val fps = df.select(col(idCol).as("id"), explode(fpsArr).as("fp"))
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxDocsPerWindow)
    val cool = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    val a = cool.select(col("fp"), col("id").as("id_a"))
    val b = cool.select(col("fp"), col("id").as("id_b"))
    a.join(b, "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_windows"))
  }

  /**
   * Embedding cosine near-duplicates: multi-table, multi-probe sign-LSH
   * bucketing, then exact cosine within candidates.
   *
   * Recall engineering: a pair at cosine c agrees on one hyperplane with
   * probability 1 − θ/π (θ = arccos c). One sign bucket has vanishing recall
   * at moderate c, so candidates come from `tables` independent hyperplane
   * families, and within each table side B probes every bucket within
   * `maxFlip` bit flips: a pair is a candidate if its codes are within
   * hamming `maxFlip` in ANY table. Per-pair miss probability is
   * (1 − P[ham ≤ maxFlip])^tables — driven below 1/corpus² by table count;
   * the defaults reproduce the exact brute-force pair set on the test
   * embeddings (OpsSpec recall gate ≥ 0.95 + driver oracle equality).
   * Fan-out is tables·C(bits, ≤maxFlip) keys on ONE side only, independent
   * of corpus size.
   */
  def embeddingCosine(df: DataFrame, vecCol: String, idCol: String,
                      tau: Double = 0.95, bits: Int = 8, tables: Int = 12,
                      maxFlip: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val masks = (0L until (1L << bits)).filter(m => java.lang.Long.bitCount(m) <= maxFlip)
    // side A: exact code per table; side B: all codes within maxFlip flips
    val aKeys = (0 until tables).map(t => xxhash64(lit(t), Ann.signBucket(col("v"), bits, t)))
    val a = base.select(col("id").as("id_a"), col("v").as("v_a"),
        explode(array(aKeys: _*)).as("bucket"))
    val bKeys = (0 until tables).flatMap { t =>
      masks.map(m => xxhash64(lit(t), Ann.signBucket(col("v"), bits, t).bitwiseXOR(lit(m))))
    }
    val b = base.select(col("id").as("id_b"), col("v").as("v_b"),
        explode(array(bKeys: _*)).as("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(Ann.cosine(col("v_a"), col("v_b")) >= tau)
      .select("id_a", "id_b")
  }
}
