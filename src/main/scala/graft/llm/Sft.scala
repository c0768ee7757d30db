package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data preparation: chat-template rendering
  * and the loss-mask boundary — the step that turns curated documents
  * or conversation records into the flat training text an SFT run
  * consumes (reference precedent: the instructlab sink's
  * question/answer seed-example extraction,
  * InstructLabSinkConsumer.java:158-188; this is the general
  * conversation form).
  *
  * Everything is pure Column algebra over an
  * `array<struct<role,content>>` column — codegen-adjacent string
  * concatenation, no UDFs, no state — so it rides the document scan
  * at any corpus size and replays identically in any engine.
  */
object Sft {

  /** Render a conversation to the flat training string, one
    * `<|role|>\ncontent<|end|>\n` block per turn, in order. The
    * delimiter tokens are the template contract: a tokenizer trained
    * with them as special tokens never splits them. */
  def renderChatTemplate(messages: Column): Column =
    array_join(transform(messages, m =>
      concat(lit("<|"), m.getField("role"), lit("|>\n"),
             m.getField("content"), lit("<|end|>\n"))), "")

  /** Character offset where the training loss opens: the rendered
    * length of every turn BEFORE the final assistant turn — prompt
    * tokens are masked, the assistant completion is trained on. A
    * conversation not ending in an assistant turn is all prompt
    * (boundary = full length, nothing to learn from). Compose with
    * [[TextAnalysis.bpeishTokenCount]] or [[Tokenizer]] over the
    * `substring(rendered, 1, boundary)` prefix for the TOKEN-level
    * mask. */
  def promptBoundaryChars(messages: Column): Column = {
    val n = size(messages)
    val lastRole = element_at(messages, n).getField("role")
    // the n === 0 arm must come FIRST: element_at(_, 0) is a runtime
    // error in Spark (indices are 1-based), and CaseWhen stops
    // evaluating at the first matching branch
    when(n === 0, lit(0))
      .when(lastRole === lit("assistant"),
        length(renderChatTemplate(slice(messages, lit(1), n - 1))))
      .otherwise(length(renderChatTemplate(messages)))
  }

  /** FILL-IN-MIDDLE transformation (Bavarian et al. 2022) — the code-
    * model training-data staple: split each document at two
    * DETERMINISTIC hash-derived cut points and emit the PSM ordering
    * `<PRE>prefix<SUF>suffix<MID>middle`, teaching the model to
    * infill. Cut points are pure integer functions of the doc id
    * (each segment lands in [1, len/3+len/3] with every segment
    * non-empty), so any engine replays the exact transformed string —
    * no RNG to coordinate between training runs and data rebuilds.
    * Documents shorter than `minLen` pass through ineligible (the
    * caller keeps them in the plain causal stream).
    *
    * One scan projection: two hashes + three substrings per doc.
    *
    * @return (doc_id, pre_len, mid_len, suf_len, fim) for eligible docs */
  def fimTransform(df: org.apache.spark.sql.DataFrame, idCol: Column,
                   textCol: Column, minLen: Int = 30):
      org.apache.spark.sql.DataFrame = {
    val n = length(col("__t"))
    val third = expr("length(__t) DIV 3")
    val a = (lit(1) + pmodHash("fa:", col("__id")) % third).cast("int")
    val b = (a + lit(1) + pmodHash("fb:", col("__id")) % third).cast("int")
    df.select(idCol.as("__id"), textCol.as("__t"))
      .where(length(col("__t")) >= minLen)
      .select(col("__id").as("doc_id"), col("__t"), a.as("__a"), b.as("__b"), n.as("__n"))
      .select(col("doc_id"),
        col("__a").cast("long").as("pre_len"),
        (col("__b") - col("__a")).cast("long").as("mid_len"),
        (col("__n") - col("__b")).cast("long").as("suf_len"),
        concat(lit("<PRE>"), col("__t").substr(lit(1), col("__a")),
          lit("<SUF>"), col("__t").substr(col("__b") + 1, col("__n")),
          lit("<MID>"), col("__t").substr(col("__a") + 1, col("__b") - col("__a")))
          .as("fim"))
  }

  private def pmodHash(tag: String, id: Column): Column =
    graft.functions.Portable.hash64(concat(lit(tag), id))

  /** CONVERSATION-STRUCTURE VALIDATION — the gate every SFT pipeline
    * runs before rendering: malformed conversations (role repeats,
    * empty turns, template special tokens leaked INTO content, a
    * dangling user turn) silently corrupt the loss mask and teach the
    * model the template itself. Checks, per conversation:
    *
    *  - `ok_alt`: roles strictly alternate and the first is `user`;
    *  - `ok_nonempty`: no whitespace-only content;
    *  - `ok_special`: no `<|` in any content (the template delimiter
    *    must not be forgeable from data — [[renderChatTemplate]]'s
    *    contract);
    *  - `ends_assistant`: the final turn is trainable.
    *
    * All array algebra on the conversation column in the scan; one
    * hash aggregate of (source, five ints)/conversation.
    *
    * @return (source, n_convs, bad_alt, bad_empty, bad_special,
    *          ends_user, valid) */
  def validateConversations(df: org.apache.spark.sql.DataFrame,
                            sourceCol: Column, convCol: Column):
      org.apache.spark.sql.DataFrame = {
    val roles = transform(convCol, m => m.getField("role"))
    val n = size(convCol)
    val okAlt = (n > 0) && (element_at(roles, 1) === "user") &&
      forall(zip_with(slice(roles, lit(1), greatest(n - 1, lit(0))),
        slice(roles, lit(2), greatest(n - 1, lit(0))),
        (a, b) => a =!= b), x => x)
    val okNonempty = !exists(convCol,
      m => length(trim(m.getField("content"))) === 0)
    val okSpecial = !exists(convCol,
      m => m.getField("content").contains("<|"))
    val endsAssistant = (n > 0) &&
      (element_at(convCol, n).getField("role") === "assistant")
    df.select(sourceCol.as("source"),
        okAlt.as("__alt"), okNonempty.as("__ne"), okSpecial.as("__sp"),
        endsAssistant.as("__ea"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_convs"),
        sum(when(!col("__alt"), 1L).otherwise(0L)).as("bad_alt"),
        sum(when(!col("__ne"), 1L).otherwise(0L)).as("bad_empty"),
        sum(when(!col("__sp"), 1L).otherwise(0L)).as("bad_special"),
        sum(when(!col("__ea"), 1L).otherwise(0L)).as("ends_user"),
        sum(when(col("__alt") && col("__ne") && col("__sp") && col("__ea"),
          1L).otherwise(0L)).as("valid"))
  }
}
