package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlText
import graft.testgen.WebCorpus

class HtmlTextSpec extends AnyFunSuite {

  test("golden: tags stripped, script/style dropped, entities decoded, ws collapsed") {
    val html = "<html><head><title>Hello &amp; Goodbye</title>" +
      "<script>var x = '<p>not text</p>';</script>" +
      "<style>.a { color: red }</style></head>" +
      "<body>\n  <h1>Hello &amp; Goodbye</h1>\n" +
      "<!-- a comment with <tags> -->" +
      "<p>line one</p><p>line&nbsp;two &lt;ok&gt;</p></body></html>"
    assert(HtmlText.extractString(html) ==
      "Hello & Goodbye Hello & Goodbye line one line two <ok>")
  }

  test("unterminated script and stray ampersands do not break extraction") {
    assert(HtmlText.extractString("<p>a &x b</p><script>never closed") == "a &x b")
    assert(HtmlText.extractString("") == "")
    assert(HtmlText.extractString("   ") == "")
  }

  test("generator html extracts byte-identically to the stored expected text") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.html_to_text
    val pages = WebCorpus.pages(spark, 300).toDF()
    val bad = pages.withColumn("ex", html_to_text(col("html")))
      .filter(col("ex") =!= col("text"))
    assert(bad.count() == 0, "extraction must equal generator's expected text")
  }

  test("determinism: identical bytes per url across runs and parallelism") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.html_to_text
    def digest(parallelism: Int): Array[org.apache.spark.sql.Row] =
      WebCorpus.pages(spark, 200).toDF()
        .repartition(parallelism)
        .select(col("url"), md5(html_to_text(col("html")).cast("binary")).as("d"))
        .orderBy("url").collect()
    val a = digest(2)
    val b = digest(13)
    assert(a.sameElements(b))
  }

  test("kernel determinism on raw bytes") {
    val body = ("body words " * 30).trim
    val html = WebCorpus.renderHtml("a title here now", body)
    val bytes = html.getBytes(StandardCharsets.UTF_8)
    val x = HtmlText.extract(bytes)
    val y = HtmlText.extract(bytes)
    assert(x == y)
    assert(x.toString == WebCorpus.expectedText("a title here now", body))
  }
}
