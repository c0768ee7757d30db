package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PortableSpec extends SparkSpec {
  import spark.implicits._

  test("hash64 matches the md5-hex-prefix definition") {
    // md5('abc') = 900150983cd24fb0... → 0x900150983cd24fb = 648541476951500027
    val got = Seq("abc").toDF("s").select(Portable.hash64(col("s"))).head().getLong(0)
    assert(got == 648541476951500027L)
  }

  test("hash64 is non-negative and stable") {
    val rows = Seq("", "x", "hello world", "üñïçødé").toDF("s")
      .select(Portable.hash64(col("s")).as("h")).collect().map(_.getLong(0))
    assert(rows.forall(_ >= 0))
    val again = Seq("", "x", "hello world", "üñïçødé").toDF("s")
      .select(Portable.hash64(col("s")).as("h")).collect().map(_.getLong(0))
    assert(rows.sameElements(again))
  }

  test("seeded hashes differ by seed") {
    val df = Seq("doc").toDF("s")
    val h0 = df.select(Portable.hash64(col("s"), 0)).head().getLong(0)
    val h1 = df.select(Portable.hash64(col("s"), 1)).head().getLong(0)
    assert(h0 != h1)
  }

  test("xxhash64Jvm mirrors the xxhash64 Column bit-for-bit") {
    val inputs = Seq("", "c|", "d|", """c|{"id":1,"v":"a"}""", "üñïçødé|x")
    val fromCol = inputs.toDF("s")
      .select(org.apache.spark.sql.functions.xxhash64(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val fromJvm = inputs.map(Portable.xxhash64Jvm)
    assert(fromCol.toSeq == fromJvm)
  }

  test("JVM↔Column hash parity holds across a randomized unicode sweep") {
    // the driver-side mirrors underpin hyperplane folding and seeded
    // minhash constants — any divergence silently corrupts results, so
    // sweep far beyond the fixed golden inputs (seeded: deterministic)
    val rnd = new scala.util.Random(42)
    val alphabet = "ab c\tü ñ日本\"\\|{}:,0é☃\n"
    val samples = Seq("", " ", "\n", "a") ++ (1 to 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = samples.toDF("s")
      .select(col("s"), Portable.hash64(col("s")).as("h64"),
        org.apache.spark.sql.functions.xxhash64(col("s")).as("hxx"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(Portable.hash64Jvm(s) == r.getLong(1), s"hash64 mismatch for '$s'")
      assert(Portable.xxhash64Jvm(s) == r.getLong(2), s"xxhash64 mismatch for '$s'")
    }
  }

  test("partitionFor lands in [0, n)") {
    val parts = (1 to 100).map(_.toString).toDF("s")
      .select(Portable.partitionFor(col("s"), 16).as("p"))
      .collect().map(_.getLong(0))
    assert(parts.forall(p => p >= 0 && p < 16))
    assert(parts.distinct.length > 4) // spreads
  }
}
