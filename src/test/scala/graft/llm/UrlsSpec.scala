package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalUrl normalizes case, www, default port, fragment, tracking params, slashes") {
    val Seq(a, b, c) = canon(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "https://example.com/a/b?a=1&b=2",
      "https://Example.com//a//b/?b=2&utm_campaign=y&a=1")
    assert(a == "https://example.com/a/b?a=1&b=2")
    assert(b == a)
    assert(c == a)
  }

  test("canonicalUrl keeps non-default ports and non-tracking params; root path collapses") {
    val Seq(p, r1, r2, noQ) = canon(
      "http://host.org:8080/x?z=1",
      "https://host.org/",
      "https://host.org",
      "https://host.org/x?utm_medium=a")
    assert(p == "http://host.org:8080/x?z=1")
    assert(r1 == "https://host.org")
    assert(r2 == "https://host.org")
    assert(noQ == "https://host.org/x")
  }

  test("canonicalUrl http default port 80 drops; 443 on http is kept") {
    val Seq(h80, h443) = canon("http://a.com:80/p", "http://a.com:443/p")
    assert(h80 == "http://a.com/p")
    assert(h443 == "http://a.com:443/p")
  }

  test("registeredDomain: 2-label, deep subdomain, cc second-level") {
    val got = Seq("example.com", "a.b.example.com", "news.bbc.co.uk",
                  "bbc.co.uk", "x.com.au", "localhost")
      .toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "example.com", "bbc.co.uk",
                      "bbc.co.uk", "x.com.au", "localhost"))
  }

  test("domainQuota caps over-quota domains deterministically and keeps under-quota whole") {
    val docs = (0L until 40L).map(i =>
        (i, if (i < 30) "https://big.com/p" + i else "https://small.org/p" + i))
      .toDF("doc_id", "url")
    val out = Urls.domainQuota(docs, col("doc_id"), col("url"), quota = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(out.size == 40)
    val byDomain = out.groupBy(_._2)
    assert(byDomain("big.com").count(_._3) == 10)
    assert(byDomain("small.org").count(_._3) == 10) // all 10 kept, no cap
    // deterministic: a second run picks the same keepers
    val out2 = Urls.domainQuota(docs, col("doc_id"), col("url"), quota = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(out.toSet == out2.toSet)
  }

  test("domainStats counts unique canonical pages per domain") {
    val docs = Seq(
      "https://www.a.com/x?utm_source=1",
      "https://a.com/x",
      "https://a.com/y",
      "http://b.co.uk/z",
      "http://sub.b.co.uk/z").toDF("url")
    val got = Urls.domainStats(docs, col("url"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a.com: 3 rows, 2 unique pages (the first two collapse)
    assert(got("a.com") == ((3L, 2L)))
    // b.co.uk: sub.b.co.uk and b.co.uk share the registered domain but
    // are different canonical URLs
    assert(got("b.co.uk") == ((2L, 2L)))
  }

  test("robotsDecision: longest match wins, Allow beats Disallow on ties, defaults allow") {
    import org.apache.spark.sql.Row
    val rules = typedLit(Seq(
      ("/a", false), ("/a/b", true), ("/a/b/c", false), ("/x", false), ("/x", true)))
      .cast("array<struct<prefix:string,allow:boolean>>")
    val cases = Seq(
      "/a/zzz",   // only /a matches -> blocked, len 2
      "/a/b/ok",  // /a and /a/b match -> longest is allow, len 4
      "/a/b/c/d", // /a/b/c deepest -> blocked, len 6
      "/x/any",   // /x disallow and /x allow tie -> Allow wins, len 2
      "/other")   // nothing matches -> default allow, len -1
    val got = cases.toDF("p")
      .select(col("p"), Urls.robotsDecision(col("p"), rules).as("d"))
      .select(col("p"), col("d.allowed"), col("d.match_len"))
      .collect().map { case Row(p: String, a: Boolean, l: Int) => p -> ((a, l)) }.toMap
    assert(got("/a/zzz") == ((false, 2)))
    assert(got("/a/b/ok") == ((true, 4)))
    assert(got("/a/b/c/d") == ((false, 6)))
    assert(got("/x/any") == ((true, 2)))
    assert(got("/other") == ((true, -1)))
  }

  test("robotsDecision: NULL rules (site without robots.txt) defaults to allowed") {
    val nullRules = lit(null).cast("array<struct<prefix:string,allow:boolean>>")
    val r = Seq("/a").toDF("p")
      .select(Urls.robotsDecision(col("p"), nullRules).as("d"))
      .select(col("d.allowed"), col("d.match_len")).collect()(0)
    assert(r.getBoolean(0) && r.getInt(1) == -1)
  }
}
