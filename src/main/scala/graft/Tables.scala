package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply to every downstream query. At cluster scale the
  * same paths would be object-store URIs; nothing here assumes local FS.
  */
object Tables {
  /** Parquet `timestamp[us]` WITHOUT a timezone would scan as
    * TIMESTAMP_NTZ, which `unix_micros`/`window`/most chrono
    * functions reject — and the oracle (DuckDB) reads the same naive
    * values as plain TIMESTAMP. Disable NTZ inference so the scan
    * yields a session-zone timestamp directly (tz pinned UTC
    * everywhere: identical stored micros, both engines agree) —
    * unlike a cast-normalization Project, the scan column stays
    * plain, so filters on ts/o_orderdate still push down to parquet. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `events.ts` as parquet TIMESTAMP(NANOS) (older testdata): with
    * spark.sql.legacy.parquet.nanosAsLong it scans as LongType nanos.
    * Convert to a microsecond timestamp here (matches DuckDB's
    * TIMESTAMP_NS → TIMESTAMP cast, which also truncates to micros).
    * Current testdata is timestamp[us] and is handled by [[load]]'s
    * NTZ normalization instead.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    // integer DIV, not `/`: double division of int64 nanos loses
    // precision above 2^53 and lands a microsecond off.
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
}
