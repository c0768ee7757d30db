package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** Vector-DB sink family — milvus/qdrant semantics
  * (MilvusChangeConsumer.java:133-151 op routing,
  * MilvusSchema.java:150-169 key validation,
  * QdrantMessageFactory.java:115-176 id/vector/payload build):
  *
  *  - KEY VALIDATION at configure time: the key struct must have
  *    exactly one field, INT64-like or a UUID string — anything else
  *    is rejected before the stream starts;
  *  - VECTOR FIELD: explicitly configured, or auto-detected as the
  *    UNIQUE array<float>/array<double> column of the after-state
  *    schema (ambiguity is an error, like Qdrant's unique-vector
  *    auto-detect);
  *  - PAYLOAD PROJECTION: remaining scalar fields minus key and
  *    vector, optionally restricted to an include list, serialized as
  *    strings (double→float narrowing on the vector mirrors
  *    QdrantMessageFactory.java:296-307);
  *  - OP ROUTING: c/u/r → upsert, d → delete by id; schema-change
  *    events (destination suffix) are skipped
  *    (MilvusChangeConsumer.java:119-123);
  *  - collection name = Milvus sanitization (dots → underscores).
  *
  * Executor-side via foreachPartition, one client per partition.
  */
object VectorSink {
  final case class Point(id: String, vector: Seq[Float], payload: Map[String, String])

  trait VectorClient extends AutoCloseable {
    def upsert(collection: String, points: Seq[Point]): Unit
    def delete(collection: String, ids: Seq[String]): Unit
  }

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  /** Key schema contract (MilvusSchema.java:150-169): one field, int64
    * family or string (validated per record as UUID at write). */
  private[sinks] def validateKeySchema(key: StructType): StructField = {
    require(key.fields.length == 1,
      s"vector sink needs a single-field key, got ${key.fieldNames.mkString(",")}")
    val f = key.fields.head
    require(Seq(LongType, IntegerType, ShortType, StringType).contains(f.dataType),
      s"vector sink key must be INT64-like or UUID string, got ${f.dataType}")
    f
  }

  private[sinks] def isUuid(s: String): Boolean = uuidRe.matches(s)

  /** Resolve the vector field: configured name, or the unique
    * float/double array column. */
  private[sinks] def resolveVectorField(row: StructType, configured: Option[String]): StructField =
    configured match {
      case Some(n) =>
        row.fields.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(s"vector field '$n' not in schema ${row.treeString}"))
      case None =>
        val cands = row.fields.filter(_.dataType match {
          case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
          case _ => false
        })
        require(cands.length == 1,
          s"need exactly one vector column to auto-detect, found ${cands.map(_.name).mkString(",")}")
        cands.head
    }
}

final class VectorSink(clientFactory: () => VectorSink.VectorClient,
                       vectorField: Option[String] = None,
                       payloadInclude: Option[Set[String]] = None)
    extends SinkConnector {
  import VectorSink._

  override def name: String = "vector"
  override def tombstoneSupport: Boolean = false

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val schema = batch.schema
    val keyType = schema("key").dataType.asInstanceOf[StructType]
    val keyField = validateKeySchema(keyType)
    val rowType = schema("value").dataType.asInstanceOf[StructType]("after")
      .dataType.asInstanceOf[StructType]
    val vec = resolveVectorField(rowType, vectorField)
    val payloadFields = rowType.fields
      .filter(f => f.name != keyField.name && f.name != vec.name)
      .filter(f => payloadInclude.forall(_.contains(f.name)))
      .map(_.name).toSeq

    val keyIsString = keyField.dataType == StringType
    val projected = batch
      .filter(!col("destination").endsWith(".schema-changes")) // DDL stream skip
      .select(
        graft.operators.EventShaping.sanitizeMilvus(col("destination")).as("collection"),
        col(s"key.${keyField.name}").cast("string").as("id"),
        col("value.op").as("op"),
        // double→float narrowing, like Qdrant's converter
        transform(col(s"value.after.${vec.name}"), x => x.cast("float")).as("vec"),
        map_from_arrays(
          typedLit(payloadFields),
          array(payloadFields.map(f => col(s"value.after.$f").cast("string")): _*)).as("payload"))

    val cf = clientFactory
    projected.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val client = cf()
        // batched per collection, flushing a collection's pending batch
        // whenever the op kind flips — one RPC per run of same-op
        // records, with per-collection op order preserved (the
        // reference accumulates the same way before its flush,
        // FlussChangeConsumer.java:339-357)
        val maxBatch = 500
        val upserts = scala.collection.mutable.LinkedHashMap[String,
          scala.collection.mutable.ArrayBuffer[Point]]()
        val deletes = scala.collection.mutable.LinkedHashMap[String,
          scala.collection.mutable.ArrayBuffer[String]]()
        def flushUpserts(c: String): Unit =
          upserts.remove(c).filter(_.nonEmpty).foreach(b => client.upsert(c, b.toSeq))
        def flushDeletes(c: String): Unit =
          deletes.remove(c).filter(_.nonEmpty).foreach(b => client.delete(c, b.toSeq))
        try {
          rows.foreach { r =>
            val collection = r.getString(0)
            val id = r.getString(1)
            if (keyIsString) require(isUuid(id), s"string key must be a UUID, got '$id'")
            r.getString(2) match {
              case Envelope.OpDelete =>
                flushUpserts(collection)
                val b = deletes.getOrElseUpdate(collection, scala.collection.mutable.ArrayBuffer())
                b += id
                if (b.length >= maxBatch) flushDeletes(collection)
              case _ =>
                flushDeletes(collection)
                val v = Option(r.getSeq[Float](3)).getOrElse(Seq.empty)
                val payload = Option(r.getMap[String, String](4)).map(_.toMap).getOrElse(Map.empty)
                val b = upserts.getOrElseUpdate(collection, scala.collection.mutable.ArrayBuffer())
                b += Point(id, v, payload)
                if (b.length >= maxBatch) flushUpserts(collection)
            }
          }
          upserts.keys.toSeq.foreach(flushUpserts)
          deletes.keys.toSeq.foreach(flushDeletes)
        } finally client.close()
      }
    }
  }
}
