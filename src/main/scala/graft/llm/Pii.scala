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
}
