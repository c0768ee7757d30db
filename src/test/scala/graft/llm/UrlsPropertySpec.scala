package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized sweep over generated messy URLs pinning the two
  * properties canonicalization rests on: IDEMPOTENCE (a canonical URL
  * re-canonicalizes to itself — without it, dedup keys depend on how
  * many curation passes ran) and mess-invariance (every generated
  * spelling of the same logical page lands on one key). Deterministic
  * seeds; UrlsSpec keeps the readable examples. */
class UrlsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(sys.error("gen failed"))

  private val urlGen: Gen[String] = for {
    scheme  <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
    www     <- Gen.oneOf("", "www.", "WWW.")
    host    <- Gen.oneOf("example.com", "Sub.Example.CO.UK", "a-b.org", "x.io.")
    port    <- Gen.oneOf("", ":80", ":443", ":8080")
    path    <- Gen.oneOf("", "/", "/a", "/a/b/", "//a//b", "/p.html")
    qparams <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "fbclid=9", "z="))
    frag    <- Gen.oneOf("", "#top", "#a/b?c")
  } yield {
    val q = if (qparams.isEmpty) "" else qparams.mkString("?", "&", "")
    s"$scheme://$www$host$port$path$q$frag"
  }

  test("canonicalUrl is idempotent on generated messy URLs") {
    (1L to 5L).foreach { seed =>
      val urls = sample(Gen.listOfN(60, urlGen), seed).distinct
      val out = urls.toDF("u")
        .select(Urls.canonicalUrl(col("u")).as("c1"))
        .select(col("c1"), Urls.canonicalUrl(col("c1")).as("c2"))
        .collect()
      out.foreach { r =>
        assert(r.getString(0) == r.getString(1),
          s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}")
      }
    }
  }

  test("mess dimensions never split one logical page across keys") {
    // same logical page rendered through every mess combination must
    // collapse to exactly one canonical key
    val messes = for {
      scheme <- Seq("http", "HTTP", "Http")
      www    <- Seq("", "www.", "WWW.")
      port   <- Seq("", ":80")
      slash  <- Seq("/a/b", "//a//b/", "/a/b/")
      frag   <- Seq("", "#x")
      q      <- Seq("?b=2&a=1", "?a=1&utm_source=s&b=2", "?b=2&a=1&fbclid=f")
    } yield s"$scheme://${www}Host.ORG$port$slash$q$frag"
    val keys = messes.toDF("u")
      .select(Urls.canonicalUrl(col("u")).as("c")).distinct()
      .as[String].collect().toSeq
    assert(keys == Seq("http://host.org/a/b?a=1&b=2"),
      s"expected one canonical key, got: $keys")
  }

  test("registeredDomain is invariant under subdomain prefixes") {
    val hosts = Seq("a.example.com", "b.a.example.com", "example.com",
                    "x.y.z.news.co.uk", "news.co.uk")
    val got = hosts.toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got.take(3).toSet == Set("example.com"))
    assert(got.drop(3).toSet == Set("news.co.uk"))
  }
}
