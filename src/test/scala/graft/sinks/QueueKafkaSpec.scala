package graft.sinks

import graft.SparkSpec
import graft.services.RetryPolicy
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.util.concurrent.{CompletableFuture, ConcurrentLinkedQueue}
import scala.jdk.CollectionConverters._

/** In-JVM queue service shared by executor threads and assertions. */
object TestQueueService {
  val delivered = new ConcurrentLinkedQueue[QueueSink.Message]()
  @volatile var failOrderingKeys: Set[String] = Set.empty
  @volatile var failOnce: Boolean = true
  val calls = new ConcurrentLinkedQueue[Int]() // chunk sizes per publish call
  def clear(): Unit = { delivered.clear(); calls.clear(); failOrderingKeys = Set.empty }
}

final class TestQueueClient extends QueueSink.QueueClient with Serializable {
  override def publish(ms: Seq[QueueSink.Message]): Seq[Boolean] = {
    TestQueueService.calls.add(ms.length)
    ms.map { m =>
      if (TestQueueService.failOrderingKeys.contains(m.orderingKey)) {
        if (TestQueueService.failOnce)
          TestQueueService.failOrderingKeys -= m.orderingKey // fail only the first attempt
        false
      } else { TestQueueService.delivered.add(m); true }
    }
  }
  override def close(): Unit = ()
}

object TestKafka {
  val sent = new ConcurrentLinkedQueue[(String, String)]() // (topic, key) in send order
  @volatile var failKey: Option[String] = None
  def clear(): Unit = { sent.clear(); failKey = None }
}

final class TestKafkaProducer extends KafkaSink.KafkaLikeProducer with Serializable {
  override def send(topic: String, key: String, value: String,
                    headers: Map[String, String]): CompletableFuture[Unit] = {
    if (TestKafka.failKey.contains(key)) {
      val f = new CompletableFuture[Unit]()
      f.completeExceptionally(new RuntimeException(s"broker rejected $key"))
      f
    } else {
      TestKafka.sent.add(topic -> key)
      CompletableFuture.completedFuture(())
    }
  }
  override def close(): Unit = ()
}

class QueueKafkaSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", IntegerType)))
  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private def records(n: Int, headerEvery: Int = 0) = {
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = (1 to n).map { i =>
      val headers =
        if (headerEvery > 0 && i % headerEvery == 0) Map(QueueSink.OrderingKeyHeader -> s"grp-$i")
        else Map.empty[String, String]
      Row(s"testc.q.t${i % 2}", Row(i),
          Row("c", null, Row(i, s"v$i"), Row("pg", "db", "q", s"t${i % 2}", i.toLong, "false", 0L), 0L),
          headers)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("publishChunk resubmits only failed entries") {
    TestQueueService.clear()
    val msgs = (1 to 4).map(i => QueueSink.Message("d", s"k$i", s"p$i"))
    TestQueueService.failOrderingKeys = Set("k2", "k4")
    QueueSink.publishChunk(new TestQueueClient, msgs,
      RetryPolicy(maxAttempts = 3, initialIntervalMs = 1), _ => ())
    assert(TestQueueService.calls.asScala.toSeq == Seq(4, 2)) // full chunk, then only the 2 failed
    assert(TestQueueService.delivered.asScala.map(_.orderingKey).toSet == Set("k1", "k2", "k3", "k4"))
  }

  test("publishChunk fails after exhausting attempts on persistent errors") {
    TestQueueService.clear()
    TestQueueService.failOnce = false
    TestQueueService.failOrderingKeys = Set("kbad")
    try {
      val msgs = Seq(QueueSink.Message("d", "kbad", "p"), QueueSink.Message("d", "kok", "p"))
      val e = intercept[RuntimeException] {
        QueueSink.publishChunk(new TestQueueClient, msgs,
          RetryPolicy(maxAttempts = 2, initialIntervalMs = 1), _ => ())
      }
      assert(e.getMessage.contains("1/2 entries"))
    } finally TestQueueService.failOnce = true
  }

  test("queue sink delivers from executors with ordering-key precedence") {
    TestQueueService.clear()
    val sink = new QueueSink(() => new TestQueueClient, maxBatchSize = 3,
      retry = RetryPolicy(maxAttempts = 2, initialIntervalMs = 1), sleeper = _ => ())
    sink.write(records(6, headerEvery = 3), epochId = 0)
    val ms = TestQueueService.delivered.asScala.toSeq
    assert(ms.length == 6)
    // header wins for i=3 and i=6, record-key json otherwise
    assert(ms.map(_.orderingKey).toSet ==
      Set("""{"id":1}""", """{"id":2}""", "grp-3", """{"id":4}""", """{"id":5}""", "grp-6"))
    assert(ms.map(_.destination).toSet == Set("testc.q.t0", "testc.q.t1"))
  }

  test("kafka sink awaits futures in send order and preserves partition order") {
    TestKafka.clear()
    val sink = new KafkaSink(() => new TestKafkaProducer)
    sink.write(records(5).coalesce(1), epochId = 0)
    val keys = TestKafka.sent.asScala.map(_._2).toSeq
    assert(keys == (1 to 5).map(i => s"""{"id":$i}"""))
  }

  test("kafka sink surfaces broker failure") {
    TestKafka.clear()
    TestKafka.failKey = Some("""{"id":2}""")
    val e = intercept[Exception] { new KafkaSink(() => new TestKafkaProducer).write(records(3), 0) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("rejected")))
  }

  test("planBatches packs per-destination chunks deterministically") {
    import org.apache.spark.sql.functions._
    val planned = QueueSink.planBatches(records(10),
      orderCols = Seq(col("value.source.lsn")), maxBatchSize = 3)
    val chunks = planned.groupBy("destination", "chunk_id").count()
      .orderBy("destination", "chunk_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    // 5 records per destination → chunks of 3 + 2
    assert(chunks == Seq(("testc.q.t0", 0, 3L), ("testc.q.t0", 1, 2L),
                         ("testc.q.t1", 0, 3L), ("testc.q.t1", 1, 2L)))
  }
}
