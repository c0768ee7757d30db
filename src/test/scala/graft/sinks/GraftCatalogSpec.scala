package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The read-only TableCatalog over upsert-sink state: SQL reads see
  * exactly the committed live state with the native parquet reader
  * (pushed filters), list/load resolve by manifest, and writes are
  * refused. */
class GraftCatalogSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", IntegerType)))
  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("q", StringType),
    StructField("a", StringType)))

  private def records(n: Int, op: String = "c") = {
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = (1 to n).map { i =>
      Row("testc.faq.items", Row(i),
          Row(op, null, Row(i, s"question $i", s"answer $i"),
              Row("pg", "db", "faq", "items", i.toLong, "false", 0L), 0L),
          Map.empty[String, String])
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("SQL reads committed upsert state through the catalog; filters push to the scan") {
    val dir = Files.createTempDirectory("graft-cat").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"), numBuckets = 4)
    sink.write(records(10), epochId = 1)
    spark.conf.set("spark.sql.catalog.cdcstate", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdcstate.root", dir)
    try {
      val viaSql = spark.sql("SELECT id, q FROM cdcstate.testc_faq_items ORDER BY id")
      assert(viaSql.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
        (1 to 10).map(i => (i, s"question $i")))
      // raw destination name resolves through the same sanitization
      assert(spark.sql("SELECT count(*) FROM cdcstate.`testc.faq.items`")
        .head().getLong(0) == 10L)
      // the native reader pushes predicates into the parquet scan
      val filtered = spark.sql("SELECT id FROM cdcstate.testc_faq_items WHERE id = 7")
      filtered.collect()
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)") ||
        plan.contains("PushedFilters: [EqualTo(id,7)"), s"expected pushdown in:\n$plan")
      // a later epoch's merge is visible on the NEXT load (fresh manifest read)
      sink.write(records(3, op = "d"), epochId = 2)
      assert(spark.sql("SELECT count(*) FROM cdcstate.testc_faq_items")
        .head().getLong(0) == 7L)
      // listTables surfaces the committed destination
      val listed = spark.sql("SHOW TABLES IN cdcstate").collect().map(_.getString(1)).toSeq
      assert(listed.contains("testc_faq_items"))
      // read-only: mutations are refused
      intercept[Exception] {
        spark.sql("DROP TABLE cdcstate.testc_faq_items")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.cdcstate")
      spark.conf.unset("spark.sql.catalog.cdcstate.root")
    }
  }
}
