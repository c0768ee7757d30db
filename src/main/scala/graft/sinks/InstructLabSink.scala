package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** LLM-training-data sink — rebuild of debezium-server-instructlab:
  * taxonomy mappings route events by destination regex
  * (InstructLabSinkConsumer.java:114-120) and extract
  * question/answer/context from value fields, headers, or constants
  * (:158-188, MappingValue :240-249), appending seed examples to
  * per-taxonomy `qna.yml` files (:107-149, QnaFile.java).
  *
  * The extraction AND the per-record yaml rendering are distributed
  * (Column algebra + a render UDF), aggregated executor-side to ONE
  * row per taxonomy file (`collect_list` with map-side partial
  * aggregation); the driver materializes only the final per-file
  * string to append — its footprint is per-taxonomy, not per-record.
  * The file append itself is inherently single-host (the reference's
  * sink writes a local taxonomy tree).
  */
object InstructLabSink {
  /** Where a mapped value comes from: `value:<field>` (post-envelope
    * after-state), `header:<name>`, or a constant. */
  sealed trait MappingValue { def toColumn: Column }
  final case class FromValue(field: String) extends MappingValue {
    def toColumn: Column = col(s"value.after.$field").cast("string")
  }
  final case class FromHeader(nm: String) extends MappingValue {
    def toColumn: Column = element_at(col("headers"), nm)
  }
  final case class Constant(v: String) extends MappingValue {
    def toColumn: Column = lit(v)
  }

  /** One taxonomy mapping: destination regex → qna file + Q/A/context
    * extraction (mirrors `instructlab.taxonomy.mapping.*` config). */
  final case class TaxonomyMapping(topicRegex: String, taxonomyPath: String,
                                   question: MappingValue, answer: MappingValue,
                                   context: Option[MappingValue] = None)

  /** YAML double-quoted scalar escaping: backslash, quote, and ALL C0
    * control characters (\n \r \t named, the rest \xXX) — a raw CR or
    * tab inside the scalar would corrupt qna.yml. Object-level so the
    * render UDF serializes without capturing the sink instance. */
  private[sinks] def quote(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\x${c.toInt}%02x"
      case c => c.toString
    } + "\""

  /** ONE aggregate row per taxonomy mapping, computed in ONE pass:
    * every record evaluates all m mappings (an array of
    * (mapping-index, rendered-snippet-or-null) structs, exploded),
    * then a single groupBy(mapping-index) with map-side partial
    * aggregation. m mappings cost one scan of the batch — not m
    * filter+agg jobs — and only ≤m (count, per-file yaml) rows reach
    * the driver. */
  private[sinks] def taxonomyAggs(batch: DataFrame,
                                  mappings: Seq[TaxonomyMapping]): DataFrame = {
    val esc = udf((s: String) => if (s == null) null else quote(s))
    val tagged = mappings.zipWithIndex.map { case (m, i) =>
      val q = m.question.toColumn
      val a = m.answer.toColumn
      val c = m.context.map(_.toColumn).getOrElse(lit(null).cast("string"))
      val entry = concat(
        lit("  - questions_and_answers:\n      - question: "), esc(q),
        lit("\n        answer: "), esc(a), lit("\n"),
        when(c.isNotNull, concat(lit("    context: "), esc(c), lit("\n")))
          .otherwise(lit("")))
      struct(lit(i).as("i"),
        when(col("destination").rlike(m.topicRegex) && q.isNotNull && a.isNotNull,
          entry).as("y"))
    }
    batch.select(explode(array(tagged: _*)).as("e"))
      .filter(col("e.y").isNotNull)
      .groupBy(col("e.i").as("i"))
      .agg(count(lit(1)).as("n"), concat_ws("", collect_list(col("e.y"))).as("yaml"))
  }
}

final class InstructLabSink(baseDir: String,
                            mappings: Seq[InstructLabSink.TaxonomyMapping])
    extends SinkConnector {
  import InstructLabSink._

  override def name: String = "instructlab"
  override def tombstoneSupport: Boolean = false

  override def validate(): Unit = Files.createDirectories(Paths.get(baseDir))

  override def write(batch: DataFrame, epochId: Long): Unit = {
    if (mappings.isEmpty) return
    // One Spark job for the whole batch; mappings with zero matching
    // records simply have no output row.
    taxonomyAggs(batch, mappings).collect().foreach { r =>
      val m = mappings(r.getInt(0))
      val dir = Paths.get(baseDir, m.taxonomyPath)
      Files.createDirectories(dir)
      val f = dir.resolve("qna.yml")
      if (!Files.exists(f))
        Files.writeString(f, "version: 3\nseed_examples:\n", StandardOpenOption.CREATE)
      Files.writeString(f, r.getString(2), StandardOpenOption.APPEND)
    }
  }

}
