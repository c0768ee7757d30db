package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins conversation validation: each violation class in isolation,
  * the all-clean path, and the empty conversation. */
class SftValidationSpec extends SparkSpec {
  import spark.implicits._

  private def validate(rows: Seq[(String, Seq[(String, String)])]) =
    Sft.validateConversations(
        rows.toDF("source", "conv"),
        col("source"),
        transform(col("conv"), m =>
          struct(m.getField("_1").as("role"), m.getField("_2").as("content"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      // (bad_alt, bad_empty, bad_special, ends_user, valid)

  test("a clean alternating conversation validates") {
    val out = validate(Seq("s" -> Seq(
      "user" -> "hi there", "assistant" -> "hello", "user" -> "thanks",
      "assistant" -> "welcome")))
    assert(out("s") == (0L, 0L, 0L, 0L, 1L))
  }

  test("each violation is counted in its own column") {
    val out = validate(Seq(
      "a" -> Seq("user" -> "q", "user" -> "q2", "assistant" -> "a"),   // repeat role
      "b" -> Seq("user" -> "q", "assistant" -> "   "),                 // blank turn
      "c" -> Seq("user" -> "see <|end|> here", "assistant" -> "a"),    // leak
      "d" -> Seq("user" -> "q", "assistant" -> "a", "user" -> "more"), // dangling
      "e" -> Seq("assistant" -> "starts wrong", "user" -> "q")))       // not user-first
    assert(out("a") == (1L, 0L, 0L, 0L, 0L))
    assert(out("b") == (0L, 1L, 0L, 0L, 0L))
    assert(out("c") == (0L, 0L, 1L, 0L, 0L))
    assert(out("d") == (0L, 0L, 0L, 1L, 0L))
    assert(out("e") == (1L, 0L, 0L, 1L, 0L))
  }

  test("an empty conversation fails alternation and trainability, not crash") {
    val out = validate(Seq("s" -> Seq.empty[(String, String)]))
    assert(out("s") == (1L, 0L, 0L, 1L, 0L))
  }
}
