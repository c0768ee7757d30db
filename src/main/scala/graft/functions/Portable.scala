package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic functions.
  *
  * The reference hashes record keys for partition routing with pluggable
  * digests (debezium-server-eventhubs/.../HashFunction.java:18-63: java,
  * md5, sha1, sha256). We standardize on an md5-derived 64-bit hash that
  * is reproducible in ANY engine with an md5() builtin (Spark, DuckDB,
  * Trino, ...): take the first 15 hex chars (60 bits, fits a signed
  * int64) of md5 and parse base-16.
  *
  * Spark:  conv(substr(md5(x), 1, 15), 16, 10)::long
  * DuckDB: cast('0x' || substr(md5(x), 1, 15) as bigint)
  *
  * This is codegen'd end-to-end (md5/conv/substring are all Catalyst
  * built-ins with doGenCode), so it stays inside WholeStageCodegen on
  * the 100 TB scan path.
  */
object Portable {

  /** 60-bit non-negative hash of any column's string form. Since
    * round 13 this is the native [[Md5Prefix64]] expression —
    * bit-identical to the composed
    * `conv(substring(md5(x), 1, 15), 16, 10)::long` documented above
    * (PortableHashSpec pins the equality), minus the per-row hex
    * encode + base-16 parse. */
  def hash64(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5Prefix64(ColumnBridge.expression(c.cast("string"))))
  }

  /** The composed built-in form of [[hash64]] — the portability
    * CONTRACT itself, kept for the equality property test and as the
    * rendering any other engine uses. */
  def hash64Composed(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Digest-algorithm variants — the reference's pluggable hash
    * functions (HashFunction.java:18-63: java, md5, sha1, sha256).
    * Same 60-bit hex-prefix construction over each digest; "java"
    * maps to Spark's built-in 32-bit murmur (String.hashCode's role:
    * fast, non-cryptographic). */
  def hash64(c: Column, algo: String): Column = algo match {
    case "md5"    => hash64(c)
    case "sha1"   => conv(substring(sha1(c.cast("string")), 1, 15), 16, 10).cast("long")
    case "sha256" => conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")
    case "java"   => abs(hash(c.cast("string"))).cast("long")
    case other    => throw new IllegalArgumentException(
      s"unknown hash '$other' (supported: java, md5, sha1, sha256)")
  }

  /** Seeded variant: mixes a seed tag into the input. Used to derive the
    * k independent hash functions MinHash needs. */
  def hash64(c: Column, seed: Int): Column =
    hash64(concat(lit(s"s$seed:"), c.cast("string")))

  /** Modulus of the universal-hash permutation family (2^31 - 1,
    * prime). 31 bits keeps a_i·h within int64 in every engine (DuckDB
    * raises on bigint overflow instead of wrapping). */
  val UniversalP = 2147483647L

  /** k independent hash functions from ONE md5 via a universal-hash
    * permutation family: h_i(x) = (a_i·h(x) + b_i) mod p over the
    * 31-bit reduction of the base hash, with per-i constants derived
    * from [[hash64Jvm]] driver-side. One digest per row, and — unlike
    * double hashing, which MinHash must not use because min(h1 + i·h2)
    * is dominated by h1's argmin for every i — each h_i induces an
    * (approximately) independent ordering, which is exactly what
    * MinHash needs. */
  def seededHashes(c: Column, k: Int): Seq[Column] = {
    val h = baseHash31(c)
    (0 until k).map { i =>
      val (a, b) = universalCoeffs(i)
      (h * lit(a) + lit(b)) % lit(UniversalP)
    }
  }

  /** 31-bit base hash column for [[seededHashes]] — project this once
    * per row, then derive the k permutations from the plain column. */
  def baseHash31(c: Column): Column = hash64(c) % lit(UniversalP)

  /** Per-function permutation constants (deterministic, engine-free). */
  def universalCoeffs(i: Int): (Long, Long) =
    (hash64Jvm(s"mh-a$i") % (UniversalP - 1) + 1, hash64Jvm(s"mh-b$i") % UniversalP)

  /** DuckDB rendering of [[seededHashes]] element i. */
  def duckSeededHash(sqlExpr: String, i: Int): String = {
    val (a, b) = universalCoeffs(i)
    s"(((${duckHash64(sqlExpr)} % $UniversalP) * $a + $b) % $UniversalP)"
  }

  /** JVM-side mirror of [[hash64]] — same function computed driver-side
    * (e.g. to pre-fold LSH hyperplanes into literals instead of hashing
    * per row per element). */
  def hash64Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** JVM-side mirror of Spark's `xxhash64(string)` (seed 42) — the
    * shared streaming/batch content tiebreak: StreamingOps.newer
    * computes THIS over the same "<op>|<payload-json>" string that
    * ParquetUpsertSink's `__tb` column hashes, so on an LSN tie both
    * paths crown the same winner (round-2 verdict: `payload.##` vs
    * xxhash64 could diverge). Equality with the Column form is
    * asserted in FunctionsSpec. */
  def xxhash64Jvm(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)

  /** DuckDB rendering of [[hash64]] over a SQL fragment — keeps the
    * oracle SQL in one place so Spark and oracle can't drift. */
  def duckHash64(sqlExpr: String): String =
    s"CAST(concat('0x', substr(md5(CAST($sqlExpr AS VARCHAR)), 1, 15)) AS BIGINT)"

  def duckHash64(sqlExpr: String, seed: Int): String =
    duckHash64(s"concat('s$seed:', CAST($sqlExpr AS VARCHAR))")

  /** Render an array<numeric> column as a deterministic STRING for
    * cross-engine output comparison: each element quantized to
    * floor(x·1e6) — an exact int64 both engines compute identically
    * (one IEEE double multiply + floor) — joined as "[a,b,…]".
    * Float FORMATTING (Java's Double.toString vs DuckDB's
    * shortest-round-trip) is the one thing that cannot be made
    * portable across engines; integer rendering is, and stays
    * sensitive to any value drift above 1e-6. Array math stays typed
    * upstream — this is an output-boundary rendering only. */
  def renderVecQ6(c: Column): Column =
    concat(lit("["),
      concat_ws(",", transform(c,
        x => floor(x.cast("double") * lit(1000000.0d)).cast("long").cast("string"))),
      lit("]"))

  /** DuckDB rendering of [[renderVecQ6]] over a list-typed SQL fragment. */
  def duckRenderVecQ6(sqlExpr: String): String =
    s"'[' || array_to_string(list_transform($sqlExpr, " +
      "x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS VARCHAR)), ',') || ']'"

  /** Partition id for key-ordered delivery — the Spark analog of
    * EventHubs' hash%partitionCount routing
    * (debezium-server-eventhubs/.../DynamicPartitionRoutingStrategy.java:8-21). */
  def partitionFor(key: Column, numPartitions: Int): Column =
    pmod(hash64(key), lit(numPartitions.toLong))

  def duckPartitionFor(sqlExpr: String, numPartitions: Int): String =
    s"(${duckHash64(sqlExpr)} % $numPartitions)"
}
