package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the first stage of every web-corpus
  * training pipeline (jusText/trafilatura-style): strip script/style
  * blocks, split the markup into lines, gate each line on word count
  * and LINK DENSITY (navigation, related-links and footer lines are
  * mostly anchor text), strip tags, decode entities, and keep the
  * prose. ~100 TB of raw crawl HTML reduces to main text in one
  * projection — every step below is built-in string/array algebra
  * (regexp_replace + higher-order functions), whole-stage-codegen'd,
  * no UDF, no shuffle.
  *
  * The pipeline is deliberately expressible in ANSI-ish SQL so the
  * DuckDB oracle replays the identical transformation
  * (QueriesLlm.llm99); PATTERN CHOICES keep the two regex engines
  * (Java util.regex vs RE2) agreeing: non-greedy `(?s)<script.*?` and
  * the tag pattern `<[^>]*>` mean the same thing in both.
  */
object Html {

  /** Entity-encode text for embedding into markup (fixture
    * construction; decode round-trips through [[decodeEntities]]).
    * `&` FIRST so already-encoded entities don't double-encode.
    * Literal `replace`, not regex — same semantics for fixed
    * patterns, no per-row pattern machinery. */
  def encodeEntities(t: Column): Column =
    replace(replace(replace(t,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** Decode the entities [[encodeEntities]] produces plus the common
    * quote forms. `&amp;` LAST — the inverse ordering, so
    * `&amp;lt;` decodes to `&lt;` not `<`. */
  def decodeEntities(t: Column): Column =
    replace(replace(replace(replace(t,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&amp;"), lit("&"))

  /** Remove script and style blocks wholesale — their content is
    * never prose and routinely contains `<`/`>` that would confuse
    * tag stripping. Dotall + non-greedy: each block closes at ITS
    * end tag. */
  def dropScriptStyle(html: Column): Column =
    regexp_replace(regexp_replace(html,
      "(?s)<script.*?</script>", " "), "(?s)<style.*?</style>", " ")

  /** Anchor-tag count of a raw markup line: occurrences of `"<a "`.
    * Exact arithmetic — each removal deletes exactly 3 characters. */
  def linkCount(line: Column): Column =
    ((length(line) - length(replace(line, lit("<a "), lit("")))) / lit(3)).cast("int")

  /** Visible text of a raw markup line: strip tags, collapse
    * whitespace, trim, decode entities. */
  def lineText(line: Column): Column =
    decodeEntities(trim(regexp_replace(
      regexp_replace(line, "<[^>]*>", " "), "\\s+", " ")))

  /** Per-line extraction record: `(txt, links, words)` structs in
    * document order. Word counting happens AFTER whitespace collapse,
    * so a split on single space suffices. */
  def lineRecords(html: Column): Column = {
    val lines = split(dropScriptStyle(html), "\n")
    val cleaned = transform(lines, l =>
      struct(lineText(l).as("txt"), linkCount(l).as("links")))
    transform(cleaned, s =>
      struct(s.getField("txt").as("txt"), s.getField("links").as("links"),
        size(filter(split(s.getField("txt"), " "), w => length(w) > lit(0))).as("words")))
  }

  /** The content gate: enough words to be prose, and anchor tags not
    * dominating (`3·links < words` — a nav line of link labels has
    * roughly as many anchors as words; body text has none). */
  def isContent(rec: Column): Column =
    rec.getField("words") >= lit(5) &&
      rec.getField("links") * lit(3) < rec.getField("words")

  /** Outlink extraction: every `<a href="...">anchor</a>` in the
    * markup as an array of (href, anchor) structs, in document order.
    * Anchor text is tag-stripped and whitespace-normalized — the weak
    * label web pipelines mine (anchor-text corpora, URL discovery,
    * link-graph construction). One regexp_extract_all + a per-tag
    * transform: stays inside the scan projection, no UDF, no shuffle;
    * the per-element regexes run on the short tag slice, not the
    * document. Both patterns mean the same thing in Java regex and
    * RE2, keeping the DuckDB oracle replayable. */
  def extractLinks(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?s)<a\\s[^>]*href=\"[^\"]*\"[^>]*>.*?</a>"), lit(0)),
      tag => struct(
        regexp_extract(tag, "href=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(tag, "(?s)^<a[^>]*>|</a>$", ""),
            "(?s)<[^>]*>", " "),
          "\\s+", " ")).as("anchor")))

  /** Registrable-host slice of an URL — the link-graph node key. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/]+)", 1)

  /** Table extraction: every `<table>` as rows of tag-stripped,
    * whitespace-normalized cell texts (`<td>` and `<th>` alike) —
    * array<array<array<string>>> in document order. The structured-
    * data seam table-QA / table-grounding corpora mine from crawl
    * HTML. Same one-projection discipline as [[extractLinks]]:
    * nested regexp_extract_all + per-slice transforms, no UDF, no
    * shuffle; the inner regexes run on the table/row slices, not the
    * document. */
  def extractTables(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?s)<table[^>]*>.*?</table>"), lit(0)),
      t => transform(
        regexp_extract_all(t, lit("(?s)<tr[^>]*>.*?</tr>"), lit(0)),
        r => transform(
          regexp_extract_all(r, lit("(?s)<t[dh][^>]*>.*?</t[dh]>"), lit(0)),
          c => trim(regexp_replace(
            regexp_replace(c, "(?s)<[^>]*>", " "), "\\s+", " ")))))

  /** Extraction summary for one document:
    * `(n_lines, n_kept, extracted)` — kept lines joined with `\n` in
    * document order. */
  def extract(html: Column): Column = {
    val recs = lineRecords(html)
    val kept = filter(recs, isContent _)
    struct(
      size(recs).as("n_lines"),
      size(kept).as("n_kept"),
      array_join(transform(kept, r => r.getField("txt")), "\n").as("extracted"))
  }
}
