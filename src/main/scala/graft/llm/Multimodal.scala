package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with a
  * typed metadata struct, mirroring how the reference carries opaque
  * payloads next to typed fields (binary format,
  * DebeziumSerializationProducer.java; vector/JSON columns,
  * MilvusSchema.java:110-148).
  *
  * The Spark-side plumbing — schema, batch shape, partition-preserving
  * mapPartitions — is real; the actual media decode is a STUB
  * (`decodeStub`): the image/audio codecs are not in this environment.
  * A production deployment replaces `decodeStub` with the codec call;
  * nothing else changes.
  */
object Multimodal {

  /** media metadata carried next to the bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("content_md5", StringType)))

  /** Wrap a text/blob column as (binary, metadata) — the ingestion
    * step for media columns. Pure Column algebra. */
  def asMedia(df: DataFrame, contentCol: String, mediaType: String): DataFrame = {
    val bin = col(contentCol).cast("binary")
    df.withColumn("media", bin)
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        length(bin).cast("long").as("n_bytes"),
        md5(bin).as("content_md5")))
  }

  /** Feature-extraction output schema: fixed-width float vector. */
  def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** ??? in spirit — a deterministic fake decoder so the distributed
    * plumbing is testable: derives `dim` floats from the content hash.
    * Replace with the real codec (image resize / audio frames / video
    * frame-sample) in production. */
  private[llm] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    // double divide THEN narrow: any engine computing byte/255.0 in
    // double and casting to float reproduces these bit-for-bit (the
    // llm06 oracle does exactly that in SQL)
    Array.tabulate(dim)(i => ((md(i % md.length) & 0xff) / 255.0).toFloat)
  }

  /** Frame sampling over a media byte stream: fixed-size windows every
    * `stride` bytes — REAL logic for raw formats (PCM audio frames,
    * uncompressed video planes); for encoded media the container
    * parsing goes where the slicing is. Plan-preserving UDF returning
    * array<binary>; pair with posexplode for per-frame rows. */
  def frameSample(df: DataFrame, mediaCol: String, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    val sample = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else Iterator.range(0, math.max(bytes.length - frameSize + 1, 0), stride)
        .map(off => java.util.Arrays.copyOfRange(bytes, off, off + frameSize))
        .toArray
    }
    df.withColumn("frames", sample(col(mediaCol)))
  }

  /** Naive resize by decimation: keep every `factor`-th byte — real
    * downsampling for raw byte streams (e.g. 1-byte PCM), a
    * deterministic stand-in for codec-aware resampling otherwise. */
  def decimate(df: DataFrame, mediaCol: String, factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    val dec = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else Iterator.range(0, bytes.length, factor).map(bytes(_)).toArray
    }
    df.withColumn("media_resized", dec(col(mediaCol)))
  }

  /** Feature extraction over the media column as a Scala UDF returning
    * `array<float>` — stays INSIDE the DataFrame plan (no RDD
    * round-trip: predicate pushdown, column pruning, and AQE all keep
    * working on the surrounding query; the UDF is the only non-codegen
    * expression, not a plan break). The decode itself is the stub; a
    * production deployment swaps the function body for the codec call
    * (or a Pandas UDF over mapInPandas when the codec is Python). */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int): DataFrame = {
    val decode = udf((bytes: Array[Byte]) => decodeStub(bytes, dim))
    df.select(col(idCol).cast("long").as("doc_id"),
              decode(col("media")).as("features"))
  }
}
