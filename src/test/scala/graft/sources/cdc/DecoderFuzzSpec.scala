package graft.sources.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-bytes sweep over every wire decoder: random garbage
  * frames must either decode to nothing (a skippable control/unknown
  * frame) or FAIL LOUDLY within a bounded time — never hang, spin, or
  * return a half-decoded envelope silently. This is the robustness
  * property a long-running capture daemon actually needs when a feed
  * delivers a corrupted frame boundary (the per-format byte-fixture
  * specs pin correctness; this pins containment). Deterministic
  * seeds. */
class DecoderFuzzSpec extends AnyFunSuite {

  private def randomFrames(seed: Long, n: Int, maxLen: Int): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(seed)
    (1 to n).map { _ =>
      val b = new Array[Byte](1 + rnd.nextInt(maxLen))
      rnd.nextBytes(b)
      b
    }
  }

  /** Run one decode under a watchdog: any exception is fine (loud
    * failure); exceeding the time budget means an unbounded loop; and
    * a NON-EMPTY result would mean garbage FABRICATED an envelope —
    * the one silent-corruption mode containment exists to prevent. */
  private def contained(tag: String)(body: => Seq[String]): Unit = {
    val t0 = System.nanoTime()
    val out = try body catch { case _: Throwable => Nil }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 5000, s"$tag took ${ms}ms on garbage input — unbounded work")
    assert(out.isEmpty, s"$tag fabricated envelopes from garbage: $out")
  }

  test("pgoutput decoder contains arbitrary garbage frames") {
    val dec = new PgOutputDecoder(topicPrefix = "t")
    randomFrames(1L, 300, 600).foreach(f => contained("pgoutput")(dec.decode(f)))
  }

  test("binlog decoder contains arbitrary garbage events") {
    val dec = new BinlogDecoder(topicPrefix = "t")
    dec.registerTable("s.t", Seq("a", "b"), Seq("a"))
    randomFrames(2L, 300, 600).foreach(f => contained("binlog")(dec.decode(f)))
  }

  test("BSON change-stream decoder contains arbitrary garbage documents") {
    val dec = new MongoChangeStreamDecoder(topicPrefix = "t")
    randomFrames(3L, 300, 600).foreach(f => contained("bson")(dec.decode(f)))
  }

  test("VStream decoder contains arbitrary garbage protobuf") {
    val dec = new VStreamDecoder(topicPrefix = "t")
    randomFrames(4L, 300, 600).foreach(f => contained("vstream")(dec.decode(f)))
  }

  test("Oracle redo parser contains arbitrary garbage SQL") {
    val rnd = new java.util.Random(5L)
    val chars = "abcdefWHERE INSERT() ',=\"\\;%$0123456789"
    (1 to 300).foreach { _ =>
      val s = (1 to (1 + rnd.nextInt(200)))
        .map(_ => chars(rnd.nextInt(chars.length))).mkString
      contained("redo") { OracleRedoParser.parse(s); Nil }
    }
  }

  test("recovery contract: a fresh decoder at the persisted position decodes cleanly") {
    // garbage CAN legitimately perturb replication state (a random
    // frame that parses as a stream-start opens a buffered stream, a
    // fake commit advances position bookkeeping) — the documented
    // recovery is what a capture daemon actually does: re-create the
    // decoder at the persisted position and let the feed re-deliver.
    // That path must decode a well-formed Begin+Relation+Insert+Commit
    import java.nio.ByteBuffer
    import java.nio.charset.StandardCharsets
    def msg(f: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(1024); f(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def cstr(b: ByteBuffer, s: String): Unit = {
      b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
    }
    val poisoned = new PgOutputDecoder(topicPrefix = "t")
    randomFrames(6L, 50, 200).foreach(f =>
      try poisoned.decode(f) catch { case _: Throwable => () })
    val dec = new PgOutputDecoder(topicPrefix = "t") // the recovery path
    val begin = msg { b =>
      b.put('B'.toByte); b.putLong(100L); b.putLong(820454400000000L); b.putInt(1)
    }
    val rel = msg { b =>
      b.put('R'.toByte); b.putInt(9); cstr(b, "public"); cstr(b, "zz")
      b.put('d'.toByte); b.putShort(1.toShort)
      b.put(1.toByte); cstr(b, "id"); b.putInt(23); b.putInt(-1)
    }
    val ins = msg { b =>
      b.put('I'.toByte); b.putInt(9); b.put('N'.toByte)
      b.putShort(1.toShort); b.put('t'.toByte)
      val v = "7".getBytes(StandardCharsets.UTF_8)
      b.putInt(v.length); b.put(v)
    }
    val commit = msg { b =>
      b.put('C'.toByte); b.put(0.toByte)
      b.putLong(100L); b.putLong(108L); b.putLong(820454400000000L)
    }
    val out = dec.decodeAll(Seq(begin, rel, ins, commit))
    assert(out.size == 1 && out.head.contains("\"op\":\"c\""), s"got: $out")
  }
}
