package graft.testgen

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.Sim.mix64

/** One crawled page; shape fixed by the task's input contract
  * (url, warc_ts, html, text, lang) + a `source` tag mirroring the
  * reference's two customer masters
  * (reference: lib/data-storage.ts:60-105 main, :107-152 sub-brand). */
case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String, // expected extraction — engine recomputes from html
    lang: String,
    source: String)

/** Ground-truth match pair — the analog of the reference's
  * `customer_relations.csv` oracle (reference: dbloader/gen_testdata.py:578-591). */
case class LabeledPair(sub_url: String, main_url: String)

/**
 * Seeded, fully distributed, deterministic generator of a two-source
 * Common-Crawl-style corpus with controlled overlap.
 *
 * Difficulty dials copied from the reference's test-data generator:
 *   - 50% of entities exist in both sources (gen_testdata.py:18),
 *   - ~2% confusables: same title, different entity (gen_testdata.py:397-417),
 *   - matched records share content but differ in id/url and timestamp
 *     (gen_testdata.py:491-504),
 *   - plus web-scale twists the north rule demands: Zipf-skewed hot domains
 *     (exercises salted/hierarchical blocking) and 10% of matched pairs on
 *     unrelated domains (only content-based LSH blocking can catch them).
 *
 * Every row is a pure function of (seed, entityId): generation runs as a
 * `spark.range(n).flatMap`, so it parallelizes to any partition count with
 * identical output — no driver-side materialization, no ordering dependence.
 */
object WebCorpus {

  val Seed = 42L

  // -- deterministic pseudo-randomness -------------------------------------
  @inline private def h(id: Long, salt: Long): Long = mix64(mix64(id ^ (Seed * 0x9e37L)) ^ salt)
  @inline private def pct(id: Long, salt: Long): Int = (math.floorMod(h(id, salt), 100L)).toInt

  // small deterministic vocabulary (syllable product, no RNG at class init)
  private val sylA = Array("ka", "lo", "mi", "ta", "ve", "ru", "se", "no", "pa", "zi",
    "bo", "du", "fe", "gu", "hy", "ja", "ki", "lu", "me", "ny")
  private val sylB = Array("ren", "dor", "mak", "lin", "vas", "tur", "nel", "bis", "gon", "fal",
    "hem", "jor", "kat", "lum", "mon", "nix", "pol", "qua", "rus", "sol")
  val Vocab: Array[String] =
    (for (a <- sylA; b <- sylB) yield a + b) // 400 words

  private def word(id: Long, salt: Long): String =
    Vocab(math.floorMod(h(id, salt), Vocab.length.toLong).toInt)

  private val langs = Array("en", "en", "en", "en", "en", "en", "de", "fr", "es", "ja")
  private val tlds = Array("com", "net", "org", "io", "dev")

  val TitleLen = 4

  /** Zipf-ish domain index over D domains: floor(D^u) is log-uniform → heavy head. */
  private def domainIdx(id: Long, nDomains: Int): Int = {
    val u = (math.floorMod(h(id, 0xd0d0L), 1000000L).toDouble + 0.5) / 1000000.0
    math.min(nDomains - 1, math.pow(nDomains.toDouble, u).toLong.toInt - 1).max(0)
  }

  def titleOf(entity: Long): String = {
    // 2% of entities are confusables: they copy the PREVIOUS entity's title
    // but have an unrelated body (same-name-different-person analog,
    // gen_testdata.py:408-414).
    val base = if (entity > 0 && pct(entity, 0xc0fL) < 2) entity - 1 else entity
    (0 until TitleLen).map(j => word(base, 0x7117L + j)).mkString(" ")
  }

  def bodyOf(entity: Long): String = {
    // 150–450 words (~1–3 KB of text) — web-page-sized rows, keeping the
    // per-record compute (extraction, minhash, scoring) above fixed cost
    val n = 150 + (math.floorMod(h(entity, 0xb0d7L), 300L)).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(word(entity, 0x100L + j))
      j += 1
    }
    sb.toString
  }

  /** Sub-source body: ~4% of words substituted at hash-chosen positions. */
  def perturb(entity: Long, body: String): String = {
    val words = body.split(' ')
    var j = 0
    while (j < words.length) {
      if (math.floorMod(h(entity, 0x9000L + j), 100L) < 4)
        words(j) = word(entity, 0xa000L + j)
      j += 1
    }
    words.mkString(" ")
  }

  def slug(entity: Long, title: String): String =
    title.replace(' ', '-') + "-" + entity

  /** Deterministic html whose extraction (HtmlText.extract) must equal `text`. */
  def renderHtml(title: String, body: String): String =
    s"""<html><head><title>$title</title><script type="text/javascript">var t = "${'$'}x < 1 && y > 2";</script><style>.c { color: red; }</style></head><body>
       |<h1>$title</h1>
       |<!-- crawler noise: ${"-".isEmpty} -->
       |<p>${body.split(' ').grouped(12).map(_.mkString(" ")).mkString("</p>\n<p>")}</p>
       |<div class="footer">&nbsp;</div>
       |</body></html>""".stripMargin

  /** Expected extracted text for the rendered html above. */
  def expectedText(title: String, body: String): String = s"$title $title $body"

  def mainUrl(entity: Long, nDomains: Int): String = {
    val d = domainIdx(entity, nDomains)
    s"https://www.site$d.com/${slug(entity, titleOf(entity))}"
  }

  def hasSub(entity: Long): Boolean = pct(entity, 0x5ab5L) < 50

  /** 10% of matched pairs live on an unrelated mirror domain. */
  def subOnMirror(entity: Long): Boolean = pct(entity, 0x31a7L) < 10

  def subUrl(entity: Long, nDomains: Int): String = {
    val s = slug(entity, titleOf(entity))
    if (subOnMirror(entity)) {
      val m = math.floorMod(h(entity, 0x3177L), 97L)
      s"https://mirror$m.example/$s"
    } else {
      val d = domainIdx(entity, nDomains)
      val tld = tlds((d + 1) % tlds.length)
      s"https://m.site$d.$tld/$s"
    }
  }

  private def tsOf(entity: Long, salt: Long): Timestamp =
    new Timestamp((1600000000L + math.floorMod(h(entity, salt), 100000000L)) * 1000L)

  def pagesOf(entity: Long, nDomains: Int): Seq[WebPage] = {
    val title = titleOf(entity)
    val body = bodyOf(entity)
    val lang = langs(math.floorMod(h(entity, 0x1a9L), langs.length.toLong).toInt)
    val mainHtml = renderHtml(title, body)
    val main = WebPage(
      mainUrl(entity, nDomains), tsOf(entity, 0x71L),
      mainHtml.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      expectedText(title, body), lang, "main")
    if (!hasSub(entity)) Seq(main)
    else {
      val subBody = perturb(entity, body)
      val subHtml = renderHtml(title, subBody)
      val sub = WebPage(
        subUrl(entity, nDomains), tsOf(entity, 0x72L),
        subHtml.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        expectedText(title, subBody), lang, "sub")
      Seq(main, sub)
    }
  }

  def defaultDomains(nEntities: Long): Int = math.max(10, (nEntities / 100).toInt)

  /** The corpus: one row per crawled page across both sources. */
  def pages(spark: SparkSession, nEntities: Long,
            nDomains: Int = -1): Dataset[WebPage] = {
    import spark.implicits._
    val d = if (nDomains > 0) nDomains else defaultDomains(nEntities)
    spark.range(0, nEntities).flatMap(i => pagesOf(i, d))
  }

  /** Ground truth (sub_url, main_url) for every cross-source entity. */
  def labeledPairs(spark: SparkSession, nEntities: Long,
                   nDomains: Int = -1): Dataset[LabeledPair] = {
    import spark.implicits._
    val d = if (nDomains > 0) nDomains else defaultDomains(nEntities)
    spark.range(0, nEntities).flatMap { i =>
      if (hasSub(i)) Seq(LabeledPair(subUrl(i, d), mainUrl(i, d))) else Seq.empty
    }
  }

  /** Convenience: corpus sized by the driver's scale-factor directory name. */
  def entitiesForSf(sfDir: String): Long = {
    val sf = raw"sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.01)
    math.max(200L, (sf * 200000).toLong) // sf0.01 → 2,000 entities (~3,000 pages)
  }

  def pagesForSf(spark: SparkSession, sfDir: String): DataFrame =
    pages(spark, entitiesForSf(sfDir)).toDF()

  /**
   * Deterministic CLUSTERED embedding corpus (for the IVF index, whose
   * contract assumes cluster structure — the driver's `embeddings` table is
   * intentionally unstructured): `nClusters` well-separated centers with
   * small member perturbations; within-cluster cosine ≈ 0.98, across ≈ 0.
   * Pure function of (cluster, member, dim) — identical at any parallelism.
   */
  def clusteredEmbeddings(spark: SparkSession, nClusters: Int, perCluster: Int,
                          dim: Int = 64): DataFrame = {
    import spark.implicits._
    def u(h: Long): Float = // uniform [-1, 1)
      ((math.floorMod(h, 2000000L).toDouble / 1000000.0) - 1.0).toFloat
    spark.range(0L, nClusters.toLong * perCluster).map { i =>
      val cluster = (i / perCluster).toInt
      val vec = Array.tabulate(dim) { k =>
        u(h(cluster, 0xce17L + k)) + 0.15f * u(h(i, 0x10153L + k))
      }
      (i, vec, cluster)
    }.toDF("vec_id", "embedding", "label")
  }

  /** Root of the /tmp materialization for a scale dir — shared with the
    * DuckDB oracle SQL in SparkEntry, which reads these parquet paths
    * directly (the driver's oracle runs on the same host/filesystem). */
  def matDir(sfDir: String): String =
    s"/tmp/graft-mat/${new java.io.File(sfDir).getName}"

  /**
   * Corpus pages materialized to parquet once per scale dir, plus the
   * labeled ground-truth pairs. Two consumers: the bench/verify queries read
   * parquet (so the generator never sits inside a timed region) and the
   * DuckDB oracle reads the SAME rows for brute-force recomputation.
   */
  def pagesMaterialized(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = matDir(sfDir)
    val p = s"$dir/pages.parquet"
    if (!new java.io.File(s"$p/_SUCCESS").exists()) {
      pagesForSf(spark, sfDir).write.mode("overwrite").parquet(p)
      labeledPairs(spark, entitiesForSf(sfDir)).toDF()
        .write.mode("overwrite").parquet(s"$dir/truth.parquet")
    }
    spark.read.parquet(p)
  }
}
