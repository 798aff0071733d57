package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic HTML → text extraction.
 *
 * Per-row invariant required by the pipeline: byte-identical extracted text
 * per url on every run, every JVM, every parallelism level. Hence:
 *   - charset pinned to UTF-8 (no platform default),
 *   - no locale-sensitive operations (no toLowerCase on content),
 *   - a single-pass state machine (no regex backtracking surprises).
 *
 * Semantics: drop <script>/<style> elements INCLUDING their bodies, replace
 * every other tag and HTML comment with a single space, decode the six
 * common entities, collapse all whitespace runs to one space, trim.
 *
 * Re-creates (from scratch, Spark-side) the deterministic normalization the
 * reference delegates to AWS Entity Resolution's typed-field preprocessing
 * (reference: lib/entity-resolution-service.ts:54-138).
 */
object HtmlText {

  def extract(htmlBytes: Array[Byte]): UTF8String =
    UTF8String.fromString(extractString(new String(htmlBytes, StandardCharsets.UTF_8)))

  def extractString(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var lastWasSpace = true // leading whitespace suppressed
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // comment?
        if (regionMatches(html, i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (regionMatchesIgnoreCase(html, i, "<script")) {
          i = skipElement(html, i, "</script")
        } else if (regionMatchesIgnoreCase(html, i, "<style")) {
          i = skipElement(html, i, "</style")
        } else {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        }
        if (!lastWasSpace) { out.append(' '); lastWasSpace = true }
      } else if (c == '&') {
        val (rep, len) = entity(html, i)
        i += len
        if (rep == ' ') {
          if (!lastWasSpace) { out.append(' '); lastWasSpace = true }
        } else {
          out.append(rep); lastWasSpace = false
        }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastWasSpace) { out.append(' '); lastWasSpace = true }
        i += 1
      } else {
        out.append(c); lastWasSpace = false
        i += 1
      }
    }
    // trim one trailing space if present
    val len = out.length
    if (len > 0 && out.charAt(len - 1) == ' ') out.setLength(len - 1)
    out.toString
  }

  /** Skip from the element's opening '<' past its matching close tag. */
  private def skipElement(html: String, start: Int, closePrefix: String): Int = {
    val n = html.length
    var i = start
    while (i < n) {
      if (html.charAt(i) == '<' && regionMatchesIgnoreCase(html, i, closePrefix)) {
        val end = html.indexOf('>', i)
        return if (end < 0) n else end + 1
      }
      i += 1
    }
    n
  }

  /** Decode an entity at position i; returns (replacementChar, consumedLen). */
  private def entity(html: String, i: Int): (Char, Int) = {
    if (regionMatches(html, i, "&amp;")) ('&', 5)
    else if (regionMatches(html, i, "&lt;")) ('<', 4)
    else if (regionMatches(html, i, "&gt;")) ('>', 4)
    else if (regionMatches(html, i, "&quot;")) ('"', 6)
    else if (regionMatches(html, i, "&#39;")) ('\'', 5)
    else if (regionMatches(html, i, "&nbsp;")) (' ', 6)
    else ('&', 1)
  }

  private def regionMatches(s: String, at: Int, pat: String): Boolean =
    s.regionMatches(false, at, pat, 0, pat.length)

  /** ASCII-only case-insensitive region match (locale-free by construction). */
  private def regionMatchesIgnoreCase(s: String, at: Int, pat: String): Boolean = {
    if (at + pat.length > s.length) return false
    var k = 0
    while (k < pat.length) {
      val a = s.charAt(at + k)
      val b = pat.charAt(k)
      val al = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
      val bl = if (b >= 'A' && b <= 'Z') (b + 32).toChar else b
      if (al != bl) return false
      k += 1
    }
    true
  }
}
