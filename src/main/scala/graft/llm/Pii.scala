package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus curation: count and
  * mask email addresses and phone numbers before text ships to a
  * training run. Regex-based (the standard first-line scrubber in
  * public pipelines, e.g. BigScience ROOTS / Dolma); patterns stay in
  * the RE2 ∩ Java-regex subset so the same semantics run on any
  * engine. Everything is codegen'd Column algebra over the scan — at
  * 100 TB the scrub is a free rider on whatever pass already reads the
  * text.
  */
object Pii {

  /** Email: local part @ domain . tld (2+ alpha). Deliberately simple
    * — recall over precision, the curation trade. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone: NNN-NNNN with optional NNN- area prefix, guarded on both
    * sides against digit/hyphen neighbors so longer digit runs (card
    * numbers '4111-1111-1111-1111', UUID-ish ids) are not partially
    * masked mid-token. RE2 has no lookarounds, so the guards are
    * CONSUMED one-char groups that `mask` re-emits ($1/$4): two phones
    * separated by a single separator char share that char and only the
    * first is caught — the accepted trade for a pattern that runs
    * identically on any engine. Group 2 is the phone itself. */
  val PhonePattern: String = "(^|[^0-9-])(([0-9]{3}-)?[0-9]{3}-[0-9]{4})($|[^0-9-])"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))

  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Redact: emails first (their local parts may contain digits that
    * would otherwise feed the phone pattern), then phones. */
  def mask(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "$1<PHONE>$4")

  /** True when the text contains no detectable PII — the keep-side
    * gate for pipelines that drop rather than redact. */
  def clean(text: Column): Column =
    (emailCount(text) === 0) && (phoneCount(text) === 0)

  /** Payment-card candidate runs: 13–25 chars of digits with optional
    * space/dash separators, digit-anchored at both ends. Candidates
    * are VALIDATED by [[luhnValid]] before anything is treated as a
    * card — a bare digit-run regex over 100 TB of text would flag
    * timestamps, ids, and hashes constantly; the checksum is what
    * separates a real card number from digit noise (the
    * precision-recall fix regex-only PII scrubbers lack). */
  val CardPattern: String = "[0-9](?:[0-9 -]{11,23})[0-9]"

  /** Separator-stripped candidate array for one document. */
  def cardCandidates(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit(CardPattern), lit(0)),
        c => regexp_replace(c, "[ -]", "")),
      c => length(c).between(13, 19))

  /** Luhn checksum over a separator-free digit string (ISO/IEC
    * 7812-1): from the RIGHTMOST digit, double every second digit
    * (subtracting 9 when the double exceeds 9) and require the total
    * ≡ 0 (mod 10). Pure integer Column algebra — a nested
    * higher-order aggregate over a ≤19-char string, identical in any
    * engine. */
  def luhnValid(c: Column): Column = {
    val n = length(c)
    val total = aggregate(
      transform(sequence(lit(1), n), i => {
        val d = ascii(c.substr(i, lit(1))) - lit(48)
        when(((n - i) % 2) === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    (total % 10 === 0) && (n >= 13)
  }

  /** Count of Luhn-VALID card numbers in the text. */
  def validCardCount(text: Column): Column =
    size(filter(cardCandidates(text), luhnValid _)).cast("long")

  /** Redact Luhn-valid card numbers (separator forms included): the
    * candidate runs are extracted, validated, and each ORIGINAL form
    * folded out of the text with a literal replace — an in-expression
    * fold over the (rare) valid candidates, so the text is rewritten
    * once per true card, never rescanned per pattern. Invalid digit
    * runs (timestamps, ids) are left alone — redacting them would
    * mangle data that is not PII. */
  def maskCards(text: Column): Column = {
    val valids = transform(
      filter(
        transform(regexp_extract_all(text, lit(CardPattern), lit(0)),
          x => struct(x.as("o"), regexp_replace(x, "[ -]", "").as("cc"))),
        s => length(s.getField("cc")).between(13, 19) &&
          luhnValid(s.getField("cc"))),
      s => s.getField("o"))
    aggregate(valids, text, (acc, x) => replace(acc, x, lit("<CARD>")))
  }

  /** SCRUB-RECALL AUDIT — QA of the scrubber itself: detector counts
    * BEFORE masking (planted exposure) vs AFTER ([[mask]] +
    * [[maskCards]] residuals), per source. A nonzero residual is a
    * leak in the masking pass that the matching detector can still
    * see — e.g. the documented adjacent-phone guard consumption
    * (PhonePattern: two phones sharing a separator, only the first
    * masked — the second becomes visible once the first is gone).
    *
    * Scale shape: one codegen projection computes both detector
    * passes and the mask chain on the text where it sits; the
    * exchange carries (source, six ints) per doc. */
  def scrubAudit(df: org.apache.spark.sql.DataFrame, sourceCol: Column,
                 textCol: Column): org.apache.spark.sql.DataFrame = {
    val masked = maskCards(mask(textCol))
    df.select(sourceCol.as("source"),
        emailCount(textCol).cast("long").as("pe"),
        phoneCount(textCol).cast("long").as("pp"),
        validCardCount(textCol).as("pc"),
        emailCount(masked).cast("long").as("re"),
        phoneCount(masked).cast("long").as("rp"),
        validCardCount(masked).as("rc"))
      .groupBy("source")
      .agg(sum(col("pe")).as("planted_emails"), sum(col("re")).as("resid_emails"),
        sum(col("pp")).as("planted_phones"), sum(col("rp")).as("resid_phones"),
        sum(col("pc")).as("planted_cards"), sum(col("rc")).as("resid_cards"))
  }

  /** Per-source card-exposure audit: candidate digit runs, how many
    * pass the Luhn checksum (real card shapes), how many fail (digit
    * noise), and how many docs carry at least one valid card.
    *
    * Scale shape (100 TB): one codegen projection over the scan —
    * extraction, separator strip, and the checksum are array algebra
    * on the text where it sits; candidates are RARE (the regex is
    * digit-anchored), so the per-candidate nested aggregate touches
    * almost nothing — feeding one hash aggregate of (source, three
    * ints) per doc. */
  def cardAudit(df: org.apache.spark.sql.DataFrame, sourceCol: Column,
                textCol: Column): org.apache.spark.sql.DataFrame = {
    val perDoc = df.select(sourceCol.as("source"),
        cardCandidates(textCol).as("__c"))
      .select(col("source"),
        size(col("__c")).cast("long").as("n_cand"),
        size(filter(col("__c"), luhnValid _)).cast("long").as("n_valid"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_cand")).as("candidates"),
        sum(col("n_valid")).as("valid_cards"),
        sum(col("n_cand") - col("n_valid")).as("invalid_cards"),
        sum(when(col("n_valid") > 0, 1L).otherwise(0L)).as("docs_with_valid"))
  }
}
