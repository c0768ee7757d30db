package graft.sinks

import graft.SparkSpec
import graft.services.{Retry, RetryPolicy}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable.ArrayBuffer

class SinksSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", IntegerType)))
  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("q", StringType), StructField("a", StringType)))

  private def records(n: Int) = {
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = (1 to n).map { i =>
      Row("testc.faq.items", Row(i),
          Row("c", null, Row(i, s"question $i", s"answer $i"),
              Row("pg", "db", "faq", "items", i.toLong, "false", 0L), 0L),
          Map("src" -> "unit"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("retry: backs off, caps interval, honors retryable predicate") {
    val sleeps = ArrayBuffer[Long]()
    val calls = new AtomicInteger()
    val out = Retry(RetryPolicy(maxAttempts = 4, initialIntervalMs = 100,
        maxIntervalMs = 250, multiplier = 2.0), sleeps.append(_)) { attempt =>
      if (calls.incrementAndGet() < 4) throw new RuntimeException("boom")
      attempt
    }
    assert(out == 4)
    assert(sleeps.toSeq == Seq(100L, 200L, 250L)) // capped at max

    val nonRetryable = intercept[IllegalArgumentException] {
      Retry(RetryPolicy(maxAttempts = 5, retryable = !_.isInstanceOf[IllegalArgumentException]),
            _ => ()) { _ => throw new IllegalArgumentException("fatal") }
    }
    assert(nonRetryable.getMessage == "fatal")
  }

  test("http sink posts JSON-array batches and retries failures") {
    val received = ArrayBuffer[String]()
    val failFirst = new AtomicInteger(1)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/hook", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes())
        if (failFirst.getAndDecrement() > 0) {
          x.sendResponseHeaders(503, -1)
        } else {
          received.synchronized(received.append(
            x.getRequestHeaders.getFirst("X-Auth") + "|" + body))
          x.sendResponseHeaders(200, -1)
        }
        x.close()
      }
    })
    server.start()
    try {
      val sink = new HttpSink(s"http://localhost:${server.getAddress.getPort}/hook",
        batchMode = true, chunkSize = 2,
        authHeaders = () => Map("X-Auth" -> "tok"), sleeper = _ => ())
      sink.write(records(3), epochId = 0)
      assert(received.size == 2) // 3 records, chunk 2 → 2 posts
      assert(received.forall(_.startsWith("tok|[")))
      assert(received.mkString.contains("\"question 1\""))
    } finally server.stop(0)
  }

  test("instructlab sink writes qna.yml per taxonomy mapping") {
    import InstructLabSink._
    val dir = Files.createTempDirectory("graft-ilab").toString
    val sink = new InstructLabSink(dir, Seq(
      TaxonomyMapping("testc\\.faq\\..*", "knowledge/faq",
        FromValue("q"), FromValue("a"), Some(Constant("unit-test")))))
    sink.write(records(2), 0)
    val yml = Files.readString(Paths.get(dir, "knowledge/faq/qna.yml"))
    assert(yml.startsWith("version: 3"))
    assert(yml.contains("question: \"question 1\"") && yml.contains("answer: \"answer 2\""))
    assert(yml.contains("context: \"unit-test\""))
    // non-matching destination writes nothing
    assert(!Files.exists(Paths.get(dir, "other")))
  }

  test("parquet upsert sink skips a replayed epoch (idempotency)") {
    val dir = Files.createTempDirectory("graft-up2").toString
    val sink = new ParquetUpsertSink(dir, Seq("id"))
    sink.write(records(2), epochId = 7)
    sink.write(records(2), epochId = 7) // replay of same epoch
    val n = sink.readTable(spark, "testc.faq.items").count()
    assert(n == 2)
  }
}
