package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML main-content extraction: entity round-trip, script/style
  * removal, the link-density gate, and extraction end-to-end on a
  * hand-built page with known prose/boilerplate lines. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, html: String): org.apache.spark.sql.Row =
    Seq(html).toDF("h").select(c).collect()(0)

  test("entity encode/decode round-trips, including pre-encoded entities") {
    val texts = Seq("a < b && c > d", "fish & chips", "already &amp;lt; encoded", "plain")
    val got = texts.toDF("t")
      .select(Html.decodeEntities(Html.encodeEntities($"t")).as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq == texts)
  }

  test("decode order: &amp;lt; yields the literal string &lt;, not <") {
    assert(one(Html.decodeEntities(lit("x &amp;lt; y")), "").getString(0) == "x &lt; y")
  }

  test("script/style blocks drop wholesale, each closing at its own end tag") {
    val html = "a<script>if (1<2) {}</script>b<style>.x{}</style>c<script>s2</script>d"
    assert(one(Html.dropScriptStyle(lit(html)), "").getString(0) == "a b c d")
  }

  test("linkCount counts anchor opens exactly") {
    assert(one(Html.linkCount(lit("""<a href="/">x</a> <a href="/y">y</a> <abbr>""")), "").getInt(0) == 2)
    assert(one(Html.linkCount(lit("no anchors <b>here</b>")), "").getInt(0) == 0)
  }

  test("lineText strips tags, collapses whitespace, decodes entities") {
    val l = """  <p>one   two</p>  <b>three &amp; four</b> """
    assert(one(Html.lineText(lit(l)), "").getString(0) == "one two three & four")
  }

  test("extract keeps prose, drops nav/related/footer boilerplate") {
    val html = Seq(
      """<html><head><script>var a = 1 < 2;</script><style>.n{}</style></head><body>""",
      """<nav><a href="/">Home</a> <a href="/d">Docs</a> <a href="/a">About</a></nav>""",
      """<p>The quick brown fox jumps over the lazy dog today.</p>""",
      """<div><a href="/r1">Related article one</a> <a href="/r2">Related article two</a></div>""",
      """<footer>Copyright &amp; contact: <a href="/t">terms</a></footer>""",
      """</body></html>""").mkString("\n")
    val r = one(Html.extract(lit(html)).as("e"), "").getStruct(0)
    assert(r.getAs[Int]("n_lines") == 6)
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[String]("extracted") == "The quick brown fox jumps over the lazy dog today.")
  }

  test("a prose line with a single inline link survives the density gate") {
    val html = """<p>Read the full analysis with <a href="/src">sources</a> and methods here.</p>"""
    val r = one(Html.extract(lit(html)).as("e"), "").getStruct(0)
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[String]("extracted") == "Read the full analysis with sources and methods here.")
  }

  test("short lines drop even with zero links") {
    val r = one(Html.extract(lit("<p>too few words</p>")).as("e"), "").getStruct(0)
    assert(r.getAs[Int]("n_kept") == 0)
    assert(r.getAs[String]("extracted") == "")
  }

  test("extraction is a pure projection: no exchange, no UDF in the plan") {
    val df = Seq((1L, "<p>alpha beta gamma delta epsilon zeta</p>")).toDF("id", "html")
      .select($"id", Html.extract($"html").as("e"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
  }
}
