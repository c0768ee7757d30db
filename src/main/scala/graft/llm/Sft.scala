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
}
