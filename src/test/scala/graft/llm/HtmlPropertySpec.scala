package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized sweep pinning Html extraction to a plain-Scala reference
  * implementation — entity collisions (`&`, `<`, `>` in the prose),
  * embedded newlines, whitespace runs, near-threshold word counts and
  * link densities all emerge from the generators (deterministic
  * scalacheck seeds; HtmlSpec keeps the readable examples). */
class HtmlPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(sys.error("gen failed"))

  // words drawn from a small alphabet plus the characters that stress
  // entity encoding and the whitespace collapse
  private val wordGen = Gen.oneOf("alpha", "beta", "g&g", "a<b", "c>d", "x", "longerword", "q&a;")
  private val lineGen = for {
    n <- Gen.choose(0, 9)
    ws <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ", " \t ")
  } yield ws.mkString(sep)
  private val textGen = for {
    n <- Gen.choose(1, 4)
    ls <- Gen.listOfN(n, lineGen)
  } yield ls.mkString("\n")

  // ---- plain-Scala reference of the extraction pipeline ----
  private def encRef(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def decRef(t: String): String =
    t.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"").replace("&amp;", "&")
  private def lineTextRef(l: String): String =
    decRef(l.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim)
  private def linksRef(l: String): Int =
    (l.length - l.replace("<a ", "").length) / 3
  private def wordsRef(txt: String): Int = txt.split(" ").count(_.nonEmpty)

  private def extractRef(html: String): (Int, Int, String) = {
    val noBlocks = html
      .replaceAll("(?s)<script.*?</script>", " ")
      .replaceAll("(?s)<style.*?</style>", " ")
    val lines = noBlocks.split("\n", -1)
    val recs = lines.map { l =>
      val txt = lineTextRef(l); (txt, linksRef(l), wordsRef(txt))
    }
    val kept = recs.filter { case (_, links, words) => words >= 5 && links * 3 < words }
    (recs.length, kept.length, kept.map(_._1).mkString("\n"))
  }

  private def wrapRef(text: String): String = Seq(
    """<html><head><script>var a=1;</script><style>.n{}</style></head><body>""",
    """<nav><a href="/">Home</a> <a href="/d">Docs</a></nav>""",
    s"<p>${encRef(text)}</p>",
    """</body></html>""").mkString("\n")

  test("extract matches the plain-Scala reference over generated prose") {
    (1L to 8L).foreach { seed =>
      val texts = sample(Gen.listOfN(50, textGen), seed)
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, wrapRef(t)) }
        .toDF("id", "html")
        .select($"id", Html.extract($"html").as("e"))
        .select($"id", $"e.n_lines", $"e.n_kept", $"e.extracted")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = extractRef(wrapRef(t))
        assert(got(i.toLong) == want, s"seed=$seed text=${t.replace("\n", "\\n")}")
      }
    }
  }

  test("round-trip: prose lines of >=5 words with no anchors always survive, decoded exactly") {
    (1L to 4L).foreach { seed =>
      val texts = sample(Gen.listOfN(30, lineGen), seed)
        .filter(l => wordsRef(l.replaceAll("\\s+", " ").trim) >= 5)
      texts.zipWithIndex.map { case (t, i) => (i.toLong, wrapRef(t)) }
        .toDF("id", "html")
        .select($"id", Html.extract($"html").getField("extracted").as("x"))
        .collect().foreach { r =>
          val orig = texts(r.getLong(0).toInt)
          val normalized = orig.replaceAll("\\s+", " ").trim
          assert(r.getString(1) == normalized, s"seed=$seed orig=$orig")
        }
    }
  }
}
