package graft.formats

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-bytes sweep over the binary format decoders — same
  * containment contract as the wire decoders (DecoderFuzzSpec):
  * garbage must fail loudly or produce nothing within bounded time,
  * never hang or silently half-decode. */
class FormatsFuzzSpec extends AnyFunSuite {

  private val st = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def randomFrames(seed: Long, n: Int, maxLen: Int): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(seed)
    (1 to n).map { _ =>
      val b = new Array[Byte](1 + rnd.nextInt(maxLen))
      rnd.nextBytes(b)
      b
    }
  }

  private def contained(tag: String)(body: => Any): Unit = {
    val t0 = System.nanoTime()
    try { body; () } catch { case _: Throwable => () }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 5000, s"$tag took ${ms}ms on garbage input — unbounded work")
  }

  test("avro decoder contains arbitrary garbage") {
    randomFrames(11L, 300, 400).foreach(f => contained("avro")(AvroFormat.decode(f, st)))
  }

  test("registry-framed avro decoder contains arbitrary garbage") {
    val reg = new AvroFormat.InMemorySchemaRegistry
    randomFrames(12L, 300, 400).foreach(f =>
      contained("avro-framed")(AvroFormat.decodeFramed(f, reg)))
  }

  test("protobuf decoder contains arbitrary garbage") {
    randomFrames(13L, 300, 400).foreach(f => contained("protobuf")(ProtobufFormat.decode(f, st)))
  }
}
