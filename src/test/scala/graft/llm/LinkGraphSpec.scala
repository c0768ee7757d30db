package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins outlink extraction (href capture, anchor tag-strip and
  * whitespace collapse, document order, attribute noise) and the
  * domain-authority composition (parallel-edge weighting, sink
  * domains, label join-back). */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("extractLinks captures href and cleaned anchor text in order") {
    val html =
      """<html><body>
        |<a class="nav" href="https://a.example/x" rel="nofollow"> <b>First</b>
        |  link </a>
        |<p>no links here</p>
        |<a href="https://b.example/y"><img src="i.png"/>Second</a>
        |</body></html>""".stripMargin
    val out = Seq(html).toDF("html")
      .select(explode(Html.extractLinks(col("html"))).as("l"))
      .select(col("l.href"), col("l.anchor")).collect()
    assert(out.toSeq == Seq(
      Row("https://a.example/x", "First link"),
      Row("https://b.example/y", "Second")))
  }

  test("documents without anchors extract an empty array") {
    val out = Seq("<p>plain</p>").toDF("html")
      .select(size(Html.extractLinks(col("html")))).first().getInt(0)
    assert(out == 0)
  }

  test("domain authority: parallel links weight the walk; sinks keep zero mass") {
    // a -> b (2 links), a -> c (1), b -> a (1); c is a sink
    def l(d: String) = s"""<a href="https://$d/p">x</a>"""
    val pages = Seq(
      ("a", l("b") + l("b") + l("c")),
      ("b", l("a")),
      ("c", "<p>dead end</p>")).toDF("domain", "html")
    val out = LinkGraph.domainAuthority(pages, col("domain"),
        Html.extractLinks(col("html")), rounds = 2, initMass = 900L)
      .orderBy("domain").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // round 1: a->b 600, a->c 300, b->a 900. round 2: a(900): b 600, c 300; b(600): a 600
    assert(out("a") == (1L, 600L))
    assert(out("b") == (2L, 600L))
    assert(out("c") == (1L, 300L))
  }
}
