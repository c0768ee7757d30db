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

  /** 60-bit non-negative hash of any column's string form. */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: mixes a seed tag into the input. Used to derive the
    * k independent hash functions MinHash needs. */
  def hash64(c: Column, seed: Int): Column =
    hash64(concat(lit(s"s$seed:"), c.cast("string")))

  /** k hash functions from ONE md5 via Kirsch–Mitzenmacher double
    * hashing: h_i = h1 + i·h2 with h1 = first 60 bits, h2 = next 60
    * bits reduced to 40 (so h1 + 11·h2 can't overflow int64 — DuckDB
    * raises on bigint overflow instead of wrapping, so the math must
    * stay in range in BOTH engines). 12× fewer digests than seeded
    * md5 per function on the MinHash hot path. */
  def seededHashes(c: Column, k: Int): Seq[Column] = {
    val hex = md5(c.cast("string"))
    val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(hex, 17, 15), 16, 10).cast("long") % lit(1099511627776L)
    (0 until k).map(i => h1 + lit(i.toLong) * h2)
  }

  /** DuckDB rendering of [[seededHashes]] element i. */
  def duckSeededHash(sqlExpr: String, i: Int): String = {
    val s = s"CAST($sqlExpr AS VARCHAR)"
    s"(CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)" +
      s" + $i * (CAST(concat('0x', substr(md5($s), 17, 15)) AS BIGINT) % 1099511627776))"
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

  /** DuckDB rendering of [[hash64]] over a SQL fragment — keeps the
    * oracle SQL in one place so Spark and oracle can't drift. */
  def duckHash64(sqlExpr: String): String =
    s"CAST(concat('0x', substr(md5(CAST($sqlExpr AS VARCHAR)), 1, 15)) AS BIGINT)"

  def duckHash64(sqlExpr: String, seed: Int): String =
    duckHash64(s"concat('s$seed:', CAST($sqlExpr AS VARCHAR))")

  /** Partition id for key-ordered delivery — the Spark analog of
    * EventHubs' hash%partitionCount routing
    * (debezium-server-eventhubs/.../DynamicPartitionRoutingStrategy.java:8-21). */
  def partitionFor(key: Column, numPartitions: Int): Column =
    pmod(hash64(key), lit(numPartitions.toLong))

  def duckPartitionFor(sqlExpr: String, numPartitions: Int): String =
    s"(${duckHash64(sqlExpr)} % $numPartitions)"
}
