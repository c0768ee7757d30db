package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.operators.ApplyChanges
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** MERGE-upsert sink over parquet tables — the semantic stand-in for
  * the reference's jdbc/fluss sinks (insert/upsert/delete routing:
  * FlussChangeConsumer.java:170-220; JDBC insert modes:
  * JdbcChangeConsumer.java:128). One directory per destination
  * (Fluss-sanitized name), rows = current state + __lsn bookkeeping.
  *
  * Scale note: on a cluster this exact contract is Delta/Iceberg
  * `MERGE INTO` (SURVEY.md §2.3) — the read-merge-swap here mirrors a
  * copy-on-write merge and keeps the same op semantics so tests carry
  * over. The merge itself is fully distributed: one shuffle on the key,
  * no driver-side row handling.
  *
  * Idempotency: per-destination `_epoch` marker; a replayed epoch is
  * skipped (the foreachBatch exactly-once pattern replacing per-record
  * commit, SURVEY.md §7.5).
  */
final class ParquetUpsertSink(baseDir: String, keyFields: Seq[String] = Seq("id"))
    extends SinkConnector {

  override def name: String = "parquet-upsert"
  // like PubSub, this sink opts out of tombstones: deletes arrive as
  // op='d' envelopes (PubSubChangeConsumer.java:290-293 precedent)
  override def tombstoneSupport: Boolean = false

  override def validate(): Unit = {
    val p = Paths.get(baseDir)
    if (!Files.exists(p)) Files.createDirectories(p)
    require(Files.isWritable(p), s"$baseDir not writable")
  }

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val dests = batch.select("destination").distinct().collect().map(_.getString(0))
    dests.foreach { dest =>
      val table = tableDir(dest)
      if (lastEpoch(table) == Some(epochId)) () // replayed epoch: skip
      else {
        val changes = batch.filter(col("destination") === dest)
          .select(
            col("key"),
            col("value.op").as("__op"),
            col("value.after").as("__payload"),
            coalesce(col("value.source.lsn"), lit(Long.MaxValue)).as("__lsn"))
        val incoming = keyFields.foldLeft(changes) { (df, k) =>
          df.withColumn(s"__k_$k", col(s"key.$k"))
        }.drop("key")

        val existingDir = table.resolve("data")
        val merged =
          if (Files.exists(existingDir)) {
            val existing = spark.read.parquet(existingDir.toString)
            val asCreates = keyFields.foldLeft(
              existing.select(
                lit(Envelope.OpCreate).as("__op"),
                struct(existing.columns.filter(_ != "__lsn").map(col): _*).as("__payload"),
                col("__lsn"))) { (df, k) => df.withColumn(s"__k_$k", col(s"__payload.$k")) }
            asCreates.unionByName(incoming)
          } else incoming

        val survivors = ApplyChanges.latestState(merged,
            keyCols = keyFields.map(k => col(s"__k_$k")),
            orderCols = Seq(col("__lsn")),
            opCol = col("__op"))
          .select(col("__payload.*"), col("__lsn"))

        // copy-on-write swap: write fresh, then promote
        val tmp = table.resolve(s"data.tmp-$epochId")
        survivors.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        deleteRecursively(existingDir)
        Files.move(tmp, existingDir, StandardCopyOption.ATOMIC_MOVE)
        Files.writeString(table.resolve("_epoch"), epochId.toString)
      }
    }
  }

  /** Current state of a destination's table. */
  def readTable(spark: org.apache.spark.sql.SparkSession, destination: String): DataFrame =
    spark.read.parquet(tableDir(destination).resolve("data").toString).drop("__lsn")

  private def tableDir(dest: String): Path = {
    val sanitized = dest.replaceAll("[^a-zA-Z0-9_\\-]", "_") // Fluss rule
    val p = Paths.get(baseDir, sanitized)
    Files.createDirectories(p)
    p
  }

  private def lastEpoch(table: Path): Option[Long] = {
    val f = table.resolve("_epoch")
    if (Files.exists(f)) Some(Files.readString(f).trim.toLong) else None
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
}
