package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** URL canonicalization and host-level corpus shaping — the web-crawl
  * curation stages (URL-keyed dedup, per-domain quotas) that run
  * BEFORE any text operator in a 100 TB pipeline, because a raw crawl
  * keys its rows by URL and the same logical page arrives under many
  * spellings (case-shifted hosts, default ports, tracking params,
  * fragments, slash variants).
  *
  * Everything here is pure Column algebra over Spark's codegen'd
  * string/regex/array functions: one projection per document, no UDF,
  * no shuffle. The canonical form is deterministic, so the DuckDB
  * oracle replays it with the same regex/list pipeline and an exact
  * dedup on the canonical string stays an 8-byte-hash groupBy at
  * scale (Dedup.exact on `canonicalUrl`).
  *
  * The reference's analog is name sanitization at the sink boundary
  * (debezium-server-fluss/src/main/java/io/debezium/server/fluss/
  * FlussChangeConsumer.java:236-240 — regex rewrite of stream names);
  * this applies the same idea to the corpus key itself.
  */
object Urls {

  /** Query parameters that never change page identity (tracking /
    * attribution) — dropped during canonicalization. Kept as a single
    * alternation so both engines share one regex. */
  val TrackingParamRegex = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref|igshid)="

  /** Canonical form of an absolute http(s) URL:
    *   - scheme and host lowercased; leading `www.` and trailing-dot
    *     host anchors stripped
    *   - default ports dropped (http:80, https:443); others kept
    *   - fragment dropped
    *   - duplicate path slashes collapsed, trailing slash stripped
    *     (the root path renders as "", so host-only and host-slash
    *     forms agree)
    *   - query: tracking params and empty fragments dropped, the
    *     remainder SORTED and rejoined — param order never changes
    *     page identity
    *
    * Malformed inputs (no scheme) canonicalize to whatever the regex
    * pipeline yields — deterministic, never an error: a crawl always
    * contains garbage and a curation filter must not abort on it.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest   = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort  = regexp_extract(rest, "^([^/?#]*)", 1)
    val afterHost = regexp_replace(rest, "^[^/?#]*", "")
    val path0  = regexp_extract(afterHost, "^([^?#]*)", 1)
    val query0 = regexp_extract(afterHost, "^[^?#]*\\?([^#]*)", 1)
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(hostPort, "^([^:]*)", 1)), "^www\\.", ""),
      "\\.$", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_replace(path0, "/{2,}", "/"), "/$", "")
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRegex))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portPart, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Host of an absolute URL, lowercased, `www.`-stripped — the
    * grouping key for domain-level statistics. */
  def hostOf(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)),
        "^www\\.", ""),
      "\\.$", "")

  /** Registered (pay-level) domain of a host, public-suffix-style but
    * self-contained: the last two labels, or three when the
    * second-to-last label is a well-known second-level suffix under a
    * two-letter country code (`co.uk`, `com.au`, `ac.jp`, ...). The
    * full public-suffix list is a data file a production deployment
    * would broadcast-join instead; the heuristic covers the shapes the
    * corpus statistics care about and — crucially — is replayable as
    * plain SQL in the oracle. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = element_at(labels, -2)
    val ccSecondLevel =
      (length(tld) === 2) &&
        sld.isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(n <= 2, host)
      .when(ccSecondLevel, concat_ws(".", element_at(labels, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }

  /** Per-domain quota sampling: keep at most `quota` documents per
    * registered domain, chosen by a deterministic portable-hash rank
    * (NOT arrival order — a crawl delivers a domain's pages clustered,
    * and keeping the first N would bias toward its index pages).
    *
    * One shuffle on the domain key; the rank window never sees more
    * than one domain's rows per partition. Domains with huge page
    * counts are exactly the ones the quota truncates, so the skewed
    * key's window input is bounded by... itself — at 100 TB pair this
    * with a pre-aggregated count filter: domains under quota skip the
    * window entirely (the `needsCap` split below does this, so the
    * window only sorts documents of over-quota domains).
    *
    * Output: (id, domain, keep) for every input doc — callers filter
    * `keep` but audits read the drop set from the same frame.
    */
  def domainQuota(docs: DataFrame, idCol: Column, urlCol: Column,
                  quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    // cast-trap: a non-numeric id would silently null out and collapse
    // the hash rank + keep decision, so fail loudly instead (same
    // coalesce(raise_error) idiom as Curation.tokenBudgetSelect)
    val idLong = coalesce(idCol.cast("long"),
      raise_error(concat(lit("domainQuota: id must be non-null numeric, got "),
        coalesce(idCol.cast("string"), lit("null")))).cast("long"))
    val base = docs.select(idLong.as("id"),
      registeredDomain(hostOf(urlCol)).as("domain"))
    val withRank = base
      .withColumn("__h", Portable.hash64(col("id").cast("string")))
    // split: only over-quota domains pay the per-domain sort. The
    // count aggregate and the window shuffle on the SAME key, so AQE
    // plans one exchange reused by both branches.
    val counts = base.groupBy(col("domain")).agg(count(lit(1)).as("__n"))
    val needsCap = counts.filter(col("__n") > quota).select(col("domain"))
    val capped = withRank.join(needsCap, Seq("domain"), "left_semi")
      .withColumn("__rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("domain"))
          .orderBy(col("__h"), col("id"))))
      .select(col("id"), col("domain"), (col("__rk") <= quota).as("keep"))
    val under = withRank.join(needsCap, Seq("domain"), "left_anti")
      .select(col("id"), col("domain"), lit(true).as("keep"))
    capped.unionByName(under)
  }

  /** Domain-level corpus statistics over canonicalized URLs: unique
    * pages (distinct canonical URLs), raw rows, and the dup factor —
    * the crawl-health report that decides which domains need quota
    * treatment. One groupBy on the canonical hash, one on domain. */
  def domainStats(docs: DataFrame, urlCol: Column): DataFrame = {
    val canon = docs.select(canonicalUrl(urlCol).as("curl"))
      .select(col("curl"), registeredDomain(hostOf(col("curl"))).as("domain"))
    // distinct on the 8-byte hash of the canonical string, not the
    // string: the wide URL dies in the map stage
    canon
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_rows"),
           countDistinct(Portable.hash64(col("curl"))).as("n_pages"))
  }

  /** RFC 9309 robots-rules decision for one URL path against its
    * site's rule list: the most specific (LONGEST) matching prefix
    * rule wins; on equal length Allow beats Disallow; no match means
    * allowed. `rules` is an `array<struct<prefix:string,
    * allow:boolean>>` column — per-site rule lists are tiny, so the
    * caller broadcast-joins them onto the corpus and this fold runs
    * as a pure codegen'd projection: ZERO shuffle of the URL corpus,
    * the shape that holds at 100 TB of crawl. The fold is
    * order-independent (strict longest-match + allow-on-tie), so the
    * rule list needs no canonical ordering.
    *
    * Returns `struct(allowed boolean, match_len int)` — match_len −1
    * when no rule matched (the default-allow case), so callers can
    * separate "allowed by default" from "explicitly allowed". A NULL
    * rules column (a site with no robots.txt after a left join) is
    * the same default-allow case — no robots file means allowed. */
  def robotsDecision(path: Column, rules: Column): Column = {
    val zero = struct(lit(true).as("allow"), lit(-1).as("len"))
    val folded = aggregate(rules, zero, (acc, r) => {
      val plen = length(r.getField("prefix"))
      when(startswith(path, r.getField("prefix")) &&
           (plen > acc.getField("len") ||
            (plen === acc.getField("len") && r.getField("allow"))),
        struct(r.getField("allow").as("allow"), plen.as("len")))
        .otherwise(acc)
    })
    struct(coalesce(folded.getField("allow"), lit(true)).as("allowed"),
           coalesce(folded.getField("len"), lit(-1)).as("match_len"))
  }
}
