package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.operators.ApplyChanges
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** MERGE-upsert sink over bucketed parquet tables — the semantic
  * stand-in for the reference's jdbc/fluss sinks (insert/upsert/delete
  * routing: FlussChangeConsumer.java:170-220; JDBC insert modes:
  * JdbcChangeConsumer.java:128).
  *
  * Layout (per destination, Fluss-sanitized dir name):
  *
  *   <table>/_manifest            current epoch + bucket → epoch-dir map
  *   <table>/data-<epoch>/__bucket=<b>/part-….parquet   immutable data files
  *
  * A key lives in bucket pmod(hash64(key), numBuckets). Each epoch:
  *
  *  1. ONE pass stages the whole micro-batch partitioned by
  *     (destination, bucket) — no per-destination re-filtering.
  *  2. Per destination, only the buckets that actually contain changed
  *     keys are merged (existing live files for those buckets + staged
  *     changes → latest-state) and rewritten under data-<epoch>/.
  *     Untouched buckets keep their existing files byte-for-byte — the
  *     new manifest simply keeps pointing at them.
  *  3. The manifest is atomically swapped (tmp + ATOMIC_MOVE), THEN
  *     superseded epoch dirs are garbage-collected. A crash at any
  *     point leaves the previous manifest and every file it references
  *     intact — the replayed epoch redoes staging and merge.
  *
  * This is the same metadata-pointer-over-immutable-files design as
  * Delta/Iceberg `MERGE INTO` (SURVEY.md §2.3), which is what this
  * sink becomes on a real lakehouse; per-epoch cost is O(changed
  * buckets), not O(table).
  *
  * Merge order per key: highest (__lsn, __incoming, __tb) wins, where
  * __lsn falls back to envelope ts_ms when the source has no LSN,
  * __incoming prefers batch records over already-stored state on ties
  * (an lsn-less update still applies), and __tb is a deterministic
  * content hash so lsn-less same-key ties within one batch resolve
  * identically on every replay.
  *
  * Idempotency: manifest records the last applied epoch; a replayed
  * epoch is skipped (the foreachBatch exactly-once pattern replacing
  * per-record commit, SURVEY.md §7.5).
  */
object ParquetUpsertSink {
  /** Sink-side schema evolution modes — the JDBC sink's
    * `schema.evolution` (JdbcChangeConsumer.java:128) / Fluss
    * auto-create-from-record-schema (FlussChangeConsumer.java:284-313):
    * `None` rejects payload schema drift against the stored table;
    * `Basic` widens the table with new nullable columns (existing rows
    * read them as null) and keeps dropped columns as nulls for new
    * rows. First write always auto-creates from the record schema. */
  sealed trait SchemaEvolution
  object SchemaEvolution {
    case object None  extends SchemaEvolution
    case object Basic extends SchemaEvolution
  }

  private[sinks] def sanitize(dest: String): String =
    dest.replaceAll("[^a-zA-Z0-9_\\-]", "_") // Fluss rule

  /** Table metadata: last applied epoch + bucket → epoch-dir map.
    * Plain line format: "epoch <n>" then "<bucket> <epochDir>" lines. */
  private[sinks] case class Manifest(epoch: Option[Long], buckets: Map[Int, String]) {
    def writeAtomic(table: Path): Unit = {
      val lines = s"epoch ${epoch.getOrElse(-1L)}" +:
        buckets.toSeq.sortBy(_._1).map { case (b, d) => s"$b $d" }
      val tmp = table.resolve(s"_manifest.tmp")
      Files.writeString(tmp, lines.mkString("\n") + "\n")
      Files.move(tmp, table.resolve("_manifest"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }
  private[sinks] object Manifest {
    def read(table: Path): Manifest = {
      val f = table.resolve("_manifest")
      if (!Files.exists(f)) Manifest(None, Map.empty)
      else {
        val lines = Files.readAllLines(f).asScala.filter(_.nonEmpty)
        val epoch = lines.head.stripPrefix("epoch ").trim.toLong
        val buckets = lines.tail.map { l =>
          val Array(b, d) = l.split(" ", 2); b.toInt -> d
        }.toMap
        Manifest(if (epoch < 0) None else Some(epoch), buckets)
      }
    }
  }

  /** Live bucket data dirs of a COMMITTED table dir — what the current
    * manifest points at, one path per referenced bucket. Empty when no
    * epoch has committed. The read-side contract [[GraftCatalog]]
    * plans scans over. */
  def livePaths(table: Path): Seq[String] = {
    val m = Manifest.read(table)
    if (m.epoch.isEmpty) Seq.empty
    else m.buckets.toSeq.sortBy(_._1).map { case (b, d) => s"$table/$d/__bucket=$b" }
  }
}

import ParquetUpsertSink.Manifest

final class ParquetUpsertSink(baseDir: String, keyFields: Seq[String] = Seq("id"),
                              numBuckets: Int = 16,
                              schemaEvolution: ParquetUpsertSink.SchemaEvolution =
                                ParquetUpsertSink.SchemaEvolution.Basic,
                              /** Auto-compact a destination after an
                                * epoch leaves its manifest referencing
                                * more than this many distinct epoch
                                * dirs (0 = manual [[compact]] only).
                                * Bounds the metadata/small-file growth
                                * of a long-running stream — the classic
                                * lakehouse OPTIMIZE cadence. */
                              autoCompactAfterDirs: Int = 0,
                              /** Z-order the compacted files on two
                                * payload columns (dot paths into the
                                * delivered row): rows within each
                                * bucket file land in Morton order, so
                                * parquet row-group/page stats stay
                                * tight on BOTH dimensions and analytic
                                * reads through [[GraftCatalog]] skip
                                * on either predicate — OPTIMIZE ZORDER
                                * at the delivered-state surface. Only
                                * file-internal order changes; MERGE
                                * results are row-order independent. */
                              clusterBy: Option[(String, String)] = None,
                              clusterBits: Int = 16)
    extends SinkConnector {

  override def name: String = "parquet-upsert"
  // like PubSub, this sink opts out of tombstones: deletes arrive as
  // op='d' envelopes (PubSubChangeConsumer.java:290-293 precedent)
  override def tombstoneSupport: Boolean = false

  override def validate(): Unit = {
    val p = Paths.get(baseDir)
    if (!Files.exists(p)) Files.createDirectories(p)
    require(Files.isWritable(p), s"$baseDir not writable")
    require(numBuckets > 0, "numBuckets must be positive")
  }

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return

    // single pass over the micro-batch: project merge columns, route to
    // (destination, bucket), stage partitioned — per-destination work
    // below reads only its own staged slice
    val keyConcat = concat_ws("", keyFields.map(k => col(s"key.$k")): _*)
    val changes = batch.select(
        graft.operators.EventShaping.sanitizeFluss(col("destination")).as("__dest"),
        Portable.partitionFor(keyConcat, numBuckets).as("__bucket"),
        col("key"),
        col("value.op").as("__op"),
        col("value.after").as("__payload"),
        coalesce(col("value.source.lsn"), col("value.ts_ms"), lit(0L)).as("__lsn"),
        lit(1).as("__incoming"),
        // "<op>|<payload-json>" — the SAME string StreamingOps.newer
        // hashes JVM-side (Portable.xxhash64Jvm), so streaming and
        // batch resolve LSN ties identically
        xxhash64(concat_ws("|", col("value.op"),
          coalesce(to_json(col("value.after")), lit("")))).as("__tb"))
    val incoming = keyFields.foldLeft(changes) { (df, k) =>
      df.withColumn(s"__k_$k", col(s"key.$k"))
    }.drop("key")

    val staging = Paths.get(baseDir, s"_staging-$epochId")
    incoming.write.mode(SaveMode.Overwrite)
      .partitionBy("__dest", "__bucket").parquet(staging.toString)

    try {
      listPartitionDirs(staging, "__dest=").foreach { destDir =>
        val dest = destDir.getFileName.toString.stripPrefix("__dest=")
        val table = tableDir(dest)
        val manifest = Manifest.read(table)
        if (manifest.epoch == Some(epochId)) () // replayed epoch: skip
        else {
          val dirtyBuckets = listPartitionDirs(destDir, "__bucket=")
            .map(_.getFileName.toString.stripPrefix("__bucket=").toInt)
          val staged = spark.read.option("basePath", destDir.toString)
            .parquet(destDir.toString)

          // existing live files for dirty buckets only, read per epoch
          // dir so the bucket partition column survives
          val dirtySet = dirtyBuckets.toSet
          val liveDirty = manifest.buckets.filter { case (b, _) => dirtySet(b) }
          // epoch dirs written before a schema evolution have fewer
          // payload columns — align with nulls
          val existing = liveDirty.groupBy(_._2).map { case (epochDir, entries) =>
            val paths = entries.keys.map(b => s"$table/$epochDir/__bucket=$b").toSeq
            spark.read.option("basePath", s"$table/$epochDir").parquet(paths: _*)
          }.reduceOption(_.unionByName(_, allowMissingColumns = true))

          val existingAsChanges = existing.map { ex =>
            val payloadCols = ex.columns
              .filterNot(c => c.startsWith("__")).map(col)
            val asCreates = ex.select(
              col("__bucket"),
              lit(graft.model.Envelope.OpCreate).as("__op"),
              struct(payloadCols.toIndexedSeq: _*).as("__payload"),
              col("__lsn"), lit(0).as("__incoming"), lit(0L).as("__tb"))
            keyFields.foldLeft(asCreates) { (df, k) =>
              df.withColumn(s"__k_$k", col(s"__payload.$k"))
            }
          }

          val stagedAligned = staged.select(
            (Seq(col("__bucket"), col("__op"), col("__payload"), col("__lsn"),
                 col("__incoming"), col("__tb")) ++
              keyFields.map(k => col(s"__k_$k"))): _*)
          // schema drift check between stored payload and incoming payload
          existingAsChanges.foreach { ex =>
            val stored = ex.schema("__payload").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
            val incomingT = stagedAligned.schema("__payload").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
            if (stored.fieldNames.toSeq != incomingT.fieldNames.toSeq &&
                schemaEvolution == ParquetUpsertSink.SchemaEvolution.None)
              throw new IllegalStateException(
                s"schema drift for $dest with schema.evolution=none: " +
                  s"stored=${stored.fieldNames.mkString(",")} incoming=${incomingT.fieldNames.mkString(",")}")
          }
          // Basic evolution: unionByName(allowMissingColumns) widens the
          // merged payload to the union of stored + incoming fields —
          // struct columns merge field-wise, missing fields become null
          val merged = existingAsChanges.fold(stagedAligned)(
            _.unionByName(stagedAligned, allowMissingColumns = true))

          val survivors = ApplyChanges.latestState(merged,
              keyCols = keyFields.map(k => col(s"__k_$k")),
              orderCols = Seq(col("__lsn"), col("__incoming"), col("__tb")),
              opCol = col("__op"))
            .select(col("__payload.*"), col("__lsn"), col("__bucket"))

          // write ONLY dirty buckets under the new epoch dir
          val epochDirName = s"data-$epochId"
          survivors.write.mode(SaveMode.Overwrite)
            .partitionBy("__bucket").parquet(table.resolve(epochDirName).toString)

          // a dirty bucket with zero survivors (all keys deleted) writes
          // no files — its manifest entry must still move off the old dir
          val writtenBuckets = listPartitionDirs(table.resolve(epochDirName), "__bucket=")
            .map(_.getFileName.toString.stripPrefix("__bucket=").toInt).toSet
          val newBuckets = (manifest.buckets -- dirtySet) ++
            writtenBuckets.map(_ -> epochDirName)
          Manifest(Some(epochId), newBuckets).writeAtomic(table)
          gcUnreferenced(table, newBuckets.values.toSet + epochDirName)
          if (autoCompactAfterDirs > 0 &&
              newBuckets.values.toSet.size > autoCompactAfterDirs)
            compact(spark, dest)
        }
      }
    } finally graft.Fs.deleteRecursively(staging)
  }

  /** Fold a destination's live state into ONE epoch dir — the
    * lakehouse OPTIMIZE/VACUUM step for this sink's
    * pointer-over-immutable-files layout. Without it a long-running
    * stream fragments: the manifest can reference up to `numBuckets`
    * distinct epoch dirs, each still holding superseded bucket
    * subdirs the dir-level GC cannot touch while ANY bucket points at
    * the dir, and every read fans out over many small files — the
    * classic small-file/metadata explosion at 100 TB epoch cadence.
    *
    * Crash-safe like the epoch path: rewrite all live buckets under a
    * fresh `data-compact-<epoch>` dir (one file set per bucket via
    * repartition on the bucket key), atomically swap the manifest,
    * THEN delete every now-unreferenced epoch dir. The applied-epoch
    * watermark is preserved, so replay idempotency is unaffected; the
    * MERGE result is byte-identical because compaction only co-locates
    * already-merged state. No-op when the state already lives in one
    * dir (also prevents read-while-overwrite on repeated calls). */
  def compact(spark: SparkSession, destination: String): Unit = {
    val table = tableDir(sanitize(destination))
    val manifest = Manifest.read(table)
    val sourceDirs = manifest.buckets.values.toSet
    if (manifest.epoch.isEmpty || sourceDirs.size <= 1) return
    val target = s"data-compact-${manifest.epoch.get}"
    // impossible to collide with a source dir: if a prior compact at
    // this epoch produced `target`, every bucket points at it and the
    // single-dir guard above already returned
    val live = manifest.buckets.groupBy(_._2).map { case (epochDir, entries) =>
      val paths = entries.keys.map(b => s"$table/$epochDir/__bucket=$b").toSeq
      spark.read.option("basePath", s"$table/$epochDir").parquet(paths: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val repartitioned = live.repartition(numBuckets, col("__bucket"))
    val arranged = clusterBy match {
      case Some((a, b)) =>
        import graft.operators.Layout
        repartitioned.sortWithinPartitions(col("__bucket"),
          Layout.zValue(Layout.clampDim(col(a), clusterBits),
                        Layout.clampDim(col(b), clusterBits), clusterBits))
      case None => repartitioned
    }
    arranged.write.mode(SaveMode.Overwrite)
      .partitionBy("__bucket").parquet(table.resolve(target).toString)
    val written = listPartitionDirs(table.resolve(target), "__bucket=")
      .map(_.getFileName.toString.stripPrefix("__bucket=").toInt).toSet
    // verify BEFORE the pointer swap: a shortfall here must leave the
    // old manifest (and every file it references) fully intact
    require(manifest.buckets.keySet.subsetOf(written),
      s"compaction wrote buckets $written but manifest references " +
        s"${manifest.buckets.keySet} — aborting before the manifest swap")
    Manifest(manifest.epoch, manifest.buckets.keySet.map(b => b -> target).toMap)
      .writeAtomic(table)
    gcUnreferenced(table, Set(target))
  }

  /** Current state of a destination's table (resolved via manifest). */
  def readTable(spark: SparkSession, destination: String): DataFrame = {
    val table = tableDir(sanitize(destination))
    val manifest = Manifest.read(table)
    require(manifest.epoch.isDefined, s"no committed state for $destination")
    manifest.buckets.groupBy(_._2).map { case (epochDir, entries) =>
      val paths = entries.keys.map(b => s"$table/$epochDir/__bucket=$b").toSeq
      spark.read.option("basePath", s"$table/$epochDir").parquet(paths: _*)
    }.reduceOption(_.unionByName(_, allowMissingColumns = true))
     .map(_.drop("__lsn", "__bucket"))
     .getOrElse(spark.emptyDataFrame)
  }

  private def sanitize(dest: String): String = ParquetUpsertSink.sanitize(dest)

  private def tableDir(sanitizedDest: String): Path = {
    val p = Paths.get(baseDir, sanitizedDest)
    Files.createDirectories(p)
    p
  }

  private def listPartitionDirs(dir: Path, prefix: String): Seq[Path] =
    graft.Fs.children(dir)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))

  private def gcUnreferenced(table: Path, referenced: Set[String]): Unit =
    graft.Fs.children(table)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("data-"))
      .filterNot(p => referenced(p.getFileName.toString))
      .foreach(graft.Fs.deleteRecursively)

}
