package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins table extraction: th/td cells, ragged rows, multiple tables,
  * nested markup in cells, and the no-table path. */
class TableExtractSpec extends SparkSpec {
  import spark.implicits._

  private def tables(html: String): Seq[Seq[Seq[String]]] =
    Seq(html).toDF("html")
      .select(Html.extractTables(col("html")).as("t"))
      .first().getSeq[scala.collection.Seq[scala.collection.Seq[String]]](0)
      .map(_.map(_.toList).toList).toList

  test("th and td cells extract in order; inner markup strips") {
    val t = tables(
      """<table border="1"><tr><th>Name</th><th><b>Score</b></th></tr>
        |<tr><td>alpha one</td><td> 42 </td></tr></table>""".stripMargin)
    assert(t == Seq(Seq(Seq("Name", "Score"), Seq("alpha one", "42"))))
  }

  test("ragged rows and multiple tables keep their own shapes") {
    val t = tables(
      "<p>x</p><table><tr><td>a</td></tr></table>" +
        "<table><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></table>")
    assert(t == Seq(Seq(Seq("a")), Seq(Seq("1", "2"), Seq("3"))))
  }

  test("pages without tables extract an empty array") {
    assert(tables("<html><body><p>no tables at all</p></body></html>").isEmpty)
  }
}
