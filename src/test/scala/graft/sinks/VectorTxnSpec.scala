package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

object TestVectorStore {
  val upserts = new ConcurrentLinkedQueue[(String, VectorSink.Point)]()
  val deletes = new ConcurrentLinkedQueue[(String, String)]()
  val calls = new ConcurrentLinkedQueue[String]() // "upsert:n" / "delete:n" per RPC
  def clear(): Unit = { upserts.clear(); deletes.clear(); calls.clear() }
}

final class TestVectorClient extends VectorSink.VectorClient with Serializable {
  override def upsert(c: String, ps: Seq[VectorSink.Point]): Unit = {
    TestVectorStore.calls.add(s"upsert:${ps.length}")
    ps.foreach(p => TestVectorStore.upserts.add(c -> p))
  }
  override def delete(c: String, ids: Seq[String]): Unit = {
    TestVectorStore.calls.add(s"delete:${ids.length}")
    ids.foreach(id => TestVectorStore.deletes.add(c -> id))
  }
  override def close(): Unit = ()
}

object TestTxnLog {
  val events = new ConcurrentLinkedQueue[String]() // "begin:s" "write:s:v" "commit:s" "abort:s"
  @volatile var failStream: Option[String] = None
  def clear(): Unit = { events.clear(); failStream = None }
}

final class TestTxnClient extends TxnStreamSink.TxnClient with Serializable {
  override def begin(stream: String): TxnStreamSink.Txn = {
    TestTxnLog.events.add(s"begin:$stream")
    new TxnStreamSink.Txn {
      def write(e: String): Unit = {
        if (TestTxnLog.failStream.contains(stream)) throw new RuntimeException(s"write failed on $stream")
        TestTxnLog.events.add(s"write:$stream")
      }
      def commit(): Unit = TestTxnLog.events.add(s"commit:$stream")
      def abort(): Unit = TestTxnLog.events.add(s"abort:$stream")
    }
  }
  override def close(): Unit = ()
}

class VectorTxnSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", LongType)))
  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("title", StringType),
    StructField("embedding", ArrayType(DoubleType))))

  private def records() = {
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = Seq(
      Row("testc.docs.items", Row(1L),
          Row("c", null, Row(1L, "one", Seq(0.5, 1.5)), Row("pg", "db", "docs", "items", 1L, "false", 0L), 0L),
          Map.empty[String, String]),
      Row("testc.docs.items", Row(2L),
          Row("u", null, Row(2L, "two", Seq(2.5, 3.5)), Row("pg", "db", "docs", "items", 2L, "false", 0L), 0L),
          Map.empty[String, String]),
      Row("testc.docs.items", Row(3L),
          Row("d", Row(3L, "three", Seq(9.0, 9.0)), null, Row("pg", "db", "docs", "items", 3L, "false", 0L), 0L),
          Map.empty[String, String]),
      // schema-change stream must be skipped
      Row("testc.docs.items.schema-changes", Row(9L),
          Row("c", null, Row(9L, "ddl", Seq(0.0)), Row("pg", "db", "docs", "items", 9L, "false", 0L), 0L),
          Map.empty[String, String]))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("vector sink: auto-detected vector field, payload projection, op routing, DDL skip") {
    TestVectorStore.clear()
    val sink = new VectorSink(() => new TestVectorClient)
    sink.write(records(), 0)
    val ups = TestVectorStore.upserts.asScala.toSeq
    assert(ups.length == 2)
    assert(ups.forall(_._1 == "testc_docs_items")) // milvus sanitization
    val p1 = ups.find(_._2.id == "1").get._2
    assert(p1.vector == Seq(0.5f, 1.5f)) // double→float narrowing
    assert(p1.payload == Map("title" -> "one")) // id + vector excluded
    assert(TestVectorStore.deletes.asScala.toSeq == Seq("testc_docs_items" -> "3"))
  }

  test("vector sink batches same-op runs into one RPC, preserving op order per collection") {
    TestVectorStore.clear()
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    def rec(id: Long, op: String) =
      Row("testc.docs.items", Row(id),
          Row(op, if (op == "d") Row(id, s"t$id", Seq(1.0, 2.0)) else null,
              if (op == "d") null else Row(id, s"t$id", Seq(1.0, 2.0)),
              Row("pg", "db", "docs", "items", id, "false", 0L), 0L),
          Map.empty[String, String])
    // run of 3 upserts, delete id 2, re-upsert id 2 — one partition
    val rows = Seq(rec(1, "c"), rec(2, "c"), rec(3, "c"), rec(2, "d"), rec(2, "u"))
    val batch = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    new VectorSink(() => new TestVectorClient).write(batch, 0)
    val calls = TestVectorStore.calls.asScala.toSeq
    // 3-upsert batch, 1 delete, then the re-upsert — order preserved
    assert(calls == Seq("upsert:3", "delete:1", "upsert:1"), s"got $calls")
  }

  test("vector sink key validation rejects bad key shapes") {
    val two = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    intercept[IllegalArgumentException](VectorSink.validateKeySchema(two))
    val bad = StructType(Seq(StructField("a", DoubleType)))
    intercept[IllegalArgumentException](VectorSink.validateKeySchema(bad))
    assert(VectorSink.isUuid("123e4567-e89b-12d3-a456-426614174000"))
    assert(!VectorSink.isUuid("not-a-uuid"))
  }

  test("vector sink rejects ambiguous vector auto-detect") {
    val twoVecs = StructType(Seq(
      StructField("id", LongType),
      StructField("v1", ArrayType(FloatType)), StructField("v2", ArrayType(DoubleType))))
    intercept[IllegalArgumentException](VectorSink.resolveVectorField(twoVecs, None))
    assert(VectorSink.resolveVectorField(twoVecs, Some("v2")).name == "v2")
  }

  test("txn sink: write all then commit all per stream; failure aborts open txns") {
    TestTxnLog.clear()
    val sink = new TxnStreamSink(() => new TestTxnClient)
    val recs = records().filter(org.apache.spark.sql.functions.col("destination") === "testc.docs.items")
      .coalesce(1)
    sink.write(recs, 0)
    val evs = TestTxnLog.events.asScala.toSeq
    assert(evs == Seq("begin:testc.docs.items", "write:testc.docs.items",
      "write:testc.docs.items", "write:testc.docs.items", "commit:testc.docs.items"))

    TestTxnLog.clear()
    TestTxnLog.failStream = Some("testc.docs.items")
    intercept[Exception] { sink.write(recs, 1) }
    val evs2 = TestTxnLog.events.asScala.toSeq
    assert(evs2.count(_.startsWith("abort:")) >= 1)
    assert(!evs2.exists(_.startsWith("commit:")))
  }
}
