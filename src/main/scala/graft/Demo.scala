package graft

import org.apache.spark.sql.types._
import graft.pipeline.{CdcPipeline, PipelineSpec}
import graft.sinks.ParquetUpsertSink
import java.nio.file.Files

/** Runnable end-to-end example: replay a CDC envelope log (the golden
  * inventory.customers scenario from FIXTURES.md §1) through the
  * streaming pipeline into a parquet upsert table and print the final
  * state. `sbt "runMain graft.Demo [logDir [tableDir]]"` — with no
  * args it generates the golden log into a temp dir.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()

    val keySchema = StructType(Seq(StructField("id", IntegerType)))
    val rowSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("first_name", StringType),
      StructField("last_name", StringType), StructField("email", StringType)))

    val logDir = args.headOption.getOrElse {
      val d = Files.createTempDirectory("graft-demo-log")
      Files.writeString(d.resolve("log1.jsonl"), goldenLog.mkString("\n"))
      d.toString
    }
    val tableDir = args.lift(1).getOrElse(Files.createTempDirectory("graft-demo-table").toString)
    val ckpt = Files.createTempDirectory("graft-demo-ckpt").toString

    val sink = new ParquetUpsertSink(tableDir, keyFields = Seq("id"))
    val spec = PipelineSpec(logDir, keySchema, rowSchema, sink,
      tableIncludeList = Seq("inventory.customers"), checkpointDir = Some(ckpt))

    val q = CdcPipeline.start(spark, spec)
    q.awaitTermination(120000)

    println(s"=== graft demo: final state of testc.inventory.customers (table at $tableDir) ===")
    sink.readTable(spark, "testc.inventory.customers").orderBy("id").show(false)
    spark.stop()
  }

  private def line(id: Int, op: String, fn: String, ln: String, em: String, lsn: Long): String = {
    val row = s"""{"id":$id,"first_name":"$fn","last_name":"$ln","email":"$em"}"""
    val (b, a) = if (op == "d") (row, "null") else ("null", row)
    s"""{"destination":"testc.inventory.customers","key":{"id":$id},"value":{"op":"$op","before":$b,"after":$a,"source":{"connector":"postgresql","db":"db","schema":"inventory","table":"customers","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  /** FIXTURES.md §1: 4 snapshot rows, the Jon Snow insert, an update,
    * a delete, plus a heartbeat that must be skipped. */
  def goldenLog: Seq[String] = Seq(
    line(1001, "r", "Sally", "Thomas", "sally.thomas@acme.com", 1),
    line(1002, "r", "George", "Bailey", "gbailey@foobar.com", 2),
    line(1003, "r", "Edward", "Walker", "ed@walker.com", 3),
    line(1004, "r", "Anne", "Kretchmar", "annek@noanswer.org", 4),
    line(1005, "c", "Jon", "Snow", "jon_snow@gameofthrones.com", 5),
    line(1002, "u", "George", "Bailey", "george.bailey@example.com", 6),
    line(1003, "d", "Edward", "Walker", "ed@walker.com", 7),
    """{"destination":"__debezium-heartbeat.testc","key":null,"value":null,"headers":{}}""")
}
