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
  * The extraction is pure Column algebra (distributed); only the final
  * yaml append per taxonomy file is driver-side, mirroring the
  * reference's per-batch file grouping.
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
}

final class InstructLabSink(baseDir: String,
                            mappings: Seq[InstructLabSink.TaxonomyMapping])
    extends SinkConnector {
  import InstructLabSink._

  override def name: String = "instructlab"
  override def tombstoneSupport: Boolean = false

  override def validate(): Unit = Files.createDirectories(Paths.get(baseDir))

  override def write(batch: DataFrame, epochId: Long): Unit = {
    mappings.foreach { m =>
      val rows = batch
        .filter(col("destination").rlike(m.topicRegex))
        .select(m.question.toColumn.as("q"), m.answer.toColumn.as("a"),
                m.context.map(_.toColumn).getOrElse(lit(null)).as("c"))
        .filter(col("q").isNotNull && col("a").isNotNull)
        .collect()
      if (rows.nonEmpty) {
        val dir = Paths.get(baseDir, m.taxonomyPath)
        Files.createDirectories(dir)
        val f = dir.resolve("qna.yml")
        if (!Files.exists(f))
          Files.writeString(f, "version: 3\nseed_examples:\n", StandardOpenOption.CREATE)
        val yaml = rows.map { r =>
          val ctx = Option(r.getString(2)).map(c => s"    context: ${quote(c)}\n").getOrElse("")
          s"  - questions_and_answers:\n      - question: ${quote(r.getString(0))}\n        answer: ${quote(r.getString(1))}\n$ctx"
        }.mkString
        Files.writeString(f, yaml, StandardOpenOption.APPEND)
      }
    }
  }

  /** YAML double-quoted scalar escaping: backslash, quote, and ALL C0
    * control characters (\n \r \t named, the rest \xXX) — a raw CR or
    * tab inside the scalar would corrupt qna.yml. */
  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\x${c.toInt}%02x"
      case c => c.toString
    } + "\""
}
