package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with a
  * typed metadata struct, mirroring how the reference carries opaque
  * payloads next to typed fields (binary format,
  * DebeziumSerializationProducer.java; vector/JSON columns,
  * MilvusSchema.java:110-148).
  *
  * The Spark-side plumbing — schema, batch shape, partition-preserving
  * mapPartitions — is real, and so are the codecs the JVM ships:
  * image decode (ImageIO PNG/JPEG/GIF/BMP → luminance lattice /
  * dHash), audio decode (javax.sound WAV/AU/AIFF → PCM envelope), and
  * Motion-JPEG frame decode in AVI and MP4/MOV containers. The
  * deterministic hash fallback (`decodeStub`) remains ONLY for codecs
  * the JVM lacks (H.264 et al. — container metadata still parses via
  * [[parseMp4Meta]]) and for undecodable bytes, so a corrupt blob
  * never kills a scan. A production deployment swaps `decodeStub`
  * for the external codec call; nothing else changes.
  */
object Multimodal {

  /** JVM-GLOBAL codec setting, applied on first codec use (NOT at
    * object load — round-17 advice: a static-initializer flip silently
    * reconfigures every ImageIO user in the process the moment any
    * Multimodal member is touched, codec-related or not).
    *
    * ImageIO's default stream cache is DISK-backed: every read/write
    * creates (and deletes) a temp file — at corpus scale that is one
    * filesystem round-trip per decoded image/frame. All our codec
    * inputs are in-memory byte arrays; cache in memory instead.
    * (Measured on llm116: 36k frame decodes at sf0.1, 20.4 s → with
    * the in-memory cache the codec pass stops being I/O-bound.)
    *
    * The effect is process-wide and intentionally left in place after
    * the call (save/restore around each decode would race under
    * Spark's task threads — setUseCache is a static, not per-reader,
    * switch). A host application that needs the disk cache back can
    * call `ImageIO.setUseCache(true)` after the codec pass. */
  def useInMemoryImageIoCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Idempotent first-use hook: every ImageIO call site below
    * references this val, so the global flip happens exactly when the
    * first codec call runs — explicit in the scaladoc above, invisible
    * to non-codec users of this object. */
  private lazy val codecInit: Unit = useInMemoryImageIoCache()

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

  // ------------------------------------------------------------------
  // Real image codec (javax.imageio — on every JVM, no external dep)

  /** Output schema of [[extractImageInfo]]: container dimensions plus
    * the sampled feature vector; width/height are null when the bytes
    * did not decode as an image. */
  val imageInfoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** REAL image decode for image media types: javax.imageio parses
    * the container (PNG/JPEG/GIF/BMP), and the features are a
    * deterministic √dim × √dim luminance lattice over the decoded
    * pixels (Rec.601 weights), normalized to [0,1] — the standard
    * cheap visual fingerprint for dedup/similarity. Undecodable or
    * null bytes yield None; callers fall back to the hash stub so a
    * corrupt blob NEVER kills a 100 TB scan (executor-side decode,
    * per-row error containment). */
  private[llm] def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] = {
    if (bytes == null) None
    else try {
      codecInit // JVM-global in-memory stream cache, first codec use
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some((img.getWidth, img.getHeight, luminanceLattice(img, dim)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual near-dup fingerprint: sample a 9×8 luminance lattice
    * over the pixels and emit one bit per horizontal neighbor pair
    * (bit set ⟺ right sample brighter). Near-identical images land
    * within a few Hamming bits; crops/recompressions that preserve
    * structure stay close where byte hashes scatter. All-INTEGER
    * arithmetic (Rec.601 ×1000 weights, truncating lattice division)
    * so any engine replays it exactly from raw pixel values.
    * Undecodable or null bytes yield None — a corrupt blob never
    * kills a 100 TB scan. */
  private[llm] def dhash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) None
    else try {
      codecInit // JVM-global in-memory stream cache, first codec use
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(dhashOfImage(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The dHash bit math over an already-decoded image — shared by the
    * raw and orientation-normalized paths. */
  private def dhashOfImage(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    def lum1000(x: Int, y: Int): Long = {
      val rgb = img.getRGB(x, y)
      299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
    }
    def px(gx: Int): Int = math.min(gx * w / 9, w - 1)
    def py(gy: Int): Int = math.min(gy * h / 8, h - 1)
    var hash = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (lum1000(px(gx + 1), py(gy)) > lum1000(px(gx), py(gy)))
        hash |= 1L << (gy * 8 + gx)
    hash
  }

  /** Undo the EXIF Orientation transform (tags 3/6/8 — 180°, 90° CW,
    * 90° CCW display rotations; the mirrored tags 2/4/5/7 are rare in
    * camera output and pass through) so perceptual hashing sees the
    * image AS DISPLAYED: a camera that stored the sensor buffer
    * sideways scatters a naive dHash, while the normalized hash of
    * the original and its rotated re-upload are bit-identical. */
  private[llm] def normalizeOrientation(img: java.awt.image.BufferedImage,
                                        o: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    def build(dw: Int, dh: Int)(src: (Int, Int) => (Int, Int)) = {
      val out = new java.awt.image.BufferedImage(dw, dh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until dh; x <- 0 until dw) {
        val (sx, sy) = src(x, y)
        out.setRGB(x, y, img.getRGB(sx, sy))
      }
      out
    }
    o match {
      case 3 => build(w, h)((x, y) => (w - 1 - x, h - 1 - y))
      case 6 => build(h, w)((x, y) => (y, h - 1 - x)) // stored rotates CW to display
      case 8 => build(h, w)((x, y) => (w - 1 - y, x)) // stored rotates CCW to display
      case _ => img
    }
  }

  /** Orientation-normalized perceptual hash: decode, read the EXIF
    * Orientation (PNG eXIf / JPEG APP1; absent → 1), undo the display
    * rotation, dHash the result. Returns (normalized dhash,
    * orientation); None for undecodable bytes. */
  private[llm] def orientedDHash(bytes: Array[Byte]): Option[(Long, Int)] = {
    if (bytes == null) None
    else try {
      codecInit // JVM-global in-memory stream cache, first codec use
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val o = parseExif(bytes).map(_._4).filter(_ > 0).getOrElse(1)
        Some((dhashOfImage(normalizeOrientation(img, o)), o))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** ROTATION-NORMALIZED exact near-dup pairs — the dedup the EXIF
    * Orientation tag unlocks: candidates come from equality of the
    * orientation-normalized dHash (one equi-join on the 8-byte hash —
    * content defines the buckets, never all-pairs), so a re-upload
    * stored sideways with the matching Orientation tag collides with
    * its original where both the byte hash AND the naive dHash
    * scatter. One codec pass (materialized for the self-join's two
    * sides), image bytes never cross an exchange. */
  def rotationNormalizedPairs(df: DataFrame, idCol: Column, bytesCol: Column,
                              tracker: Option[graft.operators.Materialize.Tracker] = None): DataFrame = {
    val f = udf((bytes: Array[Byte]) => orientedDHash(bytes))
    val hashed0 = df
      .select(idCol.cast("long").as("doc_id"), f(bytesCol).as("__x"))
      .where(col("__x").isNotNull)
      .select(col("doc_id"), col("__x._1").as("ndhash"),
        col("__x._2").as("orientation"))
    val hashed = graft.operators.Materialize.eager(hashed0)
    tracker.foreach(_.track(hashed))
    val a = hashed.select(col("doc_id").as("id_a"), col("ndhash"),
      col("orientation").as("orient_a"))
    val b = hashed.select(col("doc_id").as("id_b"), col("ndhash"),
      col("orientation").as("orient_b"))
    a.join(b, Seq("ndhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("orient_a"), col("orient_b"))
  }

  /** llm127 fixture: pairs of PNGs sharing planted NORMALIZED-space
    * dHash bits — member 0 stores the display image (Orientation 1),
    * member 1 stores the pixels physically rotated with the matching
    * eXIf Orientation tag (180°/90°CW/90°CCW cycling by pair), so
    * only the orientation-normalized hash recovers the collision.
    * docId encodes pair = id/2, member = id%2. */
  private[graft] def fixturePngOriented(docId: Long): Array[Byte] = {
    val pair = docId / 2
    val member = (docId % 2).toInt
    val n = renderBitsImage { b =>
      graft.functions.Portable.hash64Jvm(s"R$pair:$b") % 2 == 1
    }
    val (w, h) = (n.getWidth, n.getHeight)
    val orientation = if (member == 0) 1 else (pair % 3) match {
      case 0 => 3
      case 1 => 6
      case 2 => 8
    }
    // store the INVERSE of the display transform, so normalization
    // reproduces n exactly (all-integer pixel moves, PNG lossless)
    val stored = orientation match {
      case 1 => n
      case 3 =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          out.setRGB(x, y, n.getRGB(w - 1 - x, h - 1 - y))
        out
      case 6 => // stored is h×w; display(x,y) = stored(y, w-1-x) must equal n(x,y)
        val out = new java.awt.image.BufferedImage(h, w,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (sy <- 0 until w; sx <- 0 until h)
          out.setRGB(sx, sy, n.getRGB(w - 1 - sy, sx))
        out
      case 8 => // display(x,y) = stored(w'-1-y, x), w' = h
        val out = new java.awt.image.BufferedImage(h, w,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (sy <- 0 until w; sx <- 0 until h)
          out.setRGB(sx, sy, n.getRGB(sy, h - 1 - sx))
        out
    }
    pngWithExif(encodePng(stored), buildTiffExif(
      le = pair % 2 == 0, make = s"Cam${pair % 5}", model = s"M-${pair % 3}",
      orientation = orientation,
      dateTime = "2024:01:01 10:00:00"))
  }

  /** Per-image dHash frame: (doc_id, dhash) with dhash null for
    * undecodable bytes. The UDF sits only at the codec boundary
    * ([[extractFeatures]]'s rationale); downstream Hamming
    * banding/joins are plain Column algebra over the 8-byte hash —
    * `bit_count(a ^ b) <= k` pairs, or band the 64 bits into 4×16-bit
    * buckets for the LSH-style candidate join at corpus scale. */
  def imageDHash(df: DataFrame, idCol: Column, bytesCol: Column): DataFrame = {
    val f = udf((bytes: Array[Byte]) => dhash64(bytes))
    df.select(idCol.cast("long").as("doc_id"), f(bytesCol).as("dhash"))
  }

  /** Deterministic synthetic PNG — the oracle-replayable image
    * fixture: a 24×16 truecolor image whose channel values are pure
    * integer functions of (base id, x, y); ids ≥ 100000 render the
    * SAME base image with channels inverted from x ≥ 20 (a localized
    * edit that moves only the lattice's last column → a few dHash
    * bits). PNG is lossless, so ImageIO must hand back exactly these
    * values — the llm69 oracle recomputes the pixels from the formula
    * and replays the full dHash pipeline in SQL, which proves the
    * REAL encode→decode→hash path end-to-end. */
  private[graft] def fixturePng(id: Long): Array[Byte] =
    encodePng(renderFixtureFrame(id % 100000L, if (id >= 100000L) 20 else 24))

  /** The shared 24×16 fixture-frame renderer: channel values are pure
    * integer functions of (base, x, y); columns from `invertFromX` get
    * channel-inverted (24 = never — x < 24 always). */
  private def renderFixtureFrame(base: Long, invertFromX: Int): java.awt.image.BufferedImage = {
    val (w, h) = (24, 16)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      def ch(a: Long, b: Long, c: Long): Int = ((base * a + x * b + y * c) % 256L).toInt
      var (r, g, b2) = (ch(31, 7, 13), ch(17, 11, 3), ch(23, 5, 19))
      if (x >= invertFromX) { r = 255 - r; g = 255 - g; b2 = 255 - b2 }
      img.setRGB(x, y, (r << 16) | (g << 8) | b2)
    }
    img
  }

  /** IMAGE QUALITY PROBE through the real ImageIO decode — the
    * vision-corpus gate: under/over-exposure (integer BT.601 luma),
    * contrast (scaled integer variance n·ΣL² − (ΣL)²), and grayscale
    * detection (r=g=b census). All counters are integers over decoded
    * channel values, so any engine replays them exactly from the
    * pixel formula of a lossless fixture.
    *
    * @return (nPixels, sumLuma, sumLumaSq, nGray); None if undecodable */
  private[graft] def imageQualityQ(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (bytes == null) None
    else try {
      codecInit
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sumL = 0L; var sumL2 = 0L; var gray = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            val l = (299L * r + 587L * g + 114L * b) / 1000L
            sumL += l; sumL2 += l * l
            if (r == g && g == b) gray += 1
            x += 1
          }
          y += 1
        }
        Some((w.toLong * h, sumL, sumL2, gray))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[fixturePng]] with planted QUALITY defects: `dark` divides every
    * channel by 8 (under-exposure, variance drops 64×), `gray` copies
    * the red formula into all three channels — pure integer overrides
    * the oracle replays per pixel. */
  private[graft] def fixturePngQuality(id: Long, dark: Boolean,
                                       gray: Boolean): Array[Byte] = {
    val (w, h) = (24, 16)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      def ch(a: Long, b: Long, c: Long): Int = ((id * a + x * b + y * c) % 256L).toInt
      var (r, g, b2) = (ch(31, 7, 13), ch(17, 11, 3), ch(23, 5, 19))
      if (gray) { g = r; b2 = r }
      if (dark) { r /= 8; g /= 8; b2 /= 8 }
      img.setRGB(x, y, (r << 16) | (g << 8) | b2)
    }
    encodePng(img)
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    codecInit // JVM-global in-memory stream cache, first codec use
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // EXIF/TIFF metadata (pure-JVM header parse at the codec seam —
  // the capture-time/device signal the reference's media columns
  // carry as metadata structs, SURVEY §1.3; public formats: JPEG
  // ISO/IEC 10918-1 marker stream, TIFF 6.0 IFD layout, Exif 2.x)

  /** Parsed image metadata: (endian "II"/"MM", make, model,
    * orientation 1-8 (0 when absent), taken_at "YYYY:MM:DD HH:MM:SS"
    * ("" when absent), n_ifd_entries). */
  private[graft] type ExifMeta = (String, String, String, Int, String, Int)

  /** EXIF/TIFF IFD0 parse — accepts a bare TIFF stream OR a JPEG whose
    * APP1 segment carries the standard `Exif\0\0` + TIFF payload. The
    * walk is fully bounds-checked: corrupt/truncated/foreign bytes
    * yield None, never a throw (the decodeStub discipline — a bad blob
    * must not kill a 100 TB scan). Reads the four IFD0 staples a
    * dedup/curation pipeline keys on: Make (0x010F), Model (0x0110),
    * Orientation (0x0112, SHORT), DateTime (0x0132). */
  private[graft] def parseExif(bytes: Array[Byte]): Option[ExifMeta] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      def u8(o: Int): Int = bytes(o) & 0xff
      // locate the TIFF header: bare TIFF, or inside the JPEG APP1
      val tiffOff: Int =
        if ((u8(0) == 0x49 && u8(1) == 0x49) ||
            (u8(0) == 0x4D && u8(1) == 0x4D)) 0
        else if (u8(0) == 0xFF && u8(1) == 0xD8) { // JPEG SOI: walk markers
          var p = 2
          var found = -1
          var stop = false
          while (!stop && found < 0 && p + 4 <= bytes.length && u8(p) == 0xFF) {
            val marker = u8(p + 1)
            if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) p += 2
            else {
              val len = (u8(p + 2) << 8) | u8(p + 3)
              if (len < 2 || p + 2 + len > bytes.length) stop = true
              else if (marker == 0xE1 && len >= 8 &&
                       bytes(p + 4) == 'E' && bytes(p + 5) == 'x' &&
                       bytes(p + 6) == 'i' && bytes(p + 7) == 'f' &&
                       bytes(p + 8) == 0 && bytes(p + 9) == 0) found = p + 10
              else if (marker == 0xDA) stop = true // SOS: entropy data follows
              else p += 2 + len
            }
          }
          found
        } else if (bytes.length > 8 && u8(0) == 0x89 && u8(1) == 0x50 &&
                   u8(2) == 0x4E && u8(3) == 0x47) { // PNG: walk chunks to eXIf
          var p = 8
          var found = -1
          def be32(o: Int): Long =
            (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) |
              (u8(o + 2).toLong << 8) | u8(o + 3).toLong
          while (found < 0 && p + 12 <= bytes.length) {
            val len = be32(p)
            if (len < 0 || len > bytes.length || p + 12 + len > bytes.length) p = bytes.length
            else {
              val typ = new String(bytes, p + 4, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
              if (typ == "eXIf") found = p + 8 // chunk data IS the TIFF
              else if (typ == "IEND") p = bytes.length
              else p += 12 + len.toInt
            }
          }
          found
        } else -1
      if (tiffOff < 0 || tiffOff + 8 > bytes.length) return None
      val le = u8(tiffOff) == 0x49
      if (le && u8(tiffOff + 1) != 0x49) return None
      if (!le && (u8(tiffOff) != 0x4D || u8(tiffOff + 1) != 0x4D)) return None
      def u16(o: Int): Int =
        if (o < 0 || o + 2 > bytes.length) -1
        else if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
      def u32(o: Int): Long =
        if (o < 0 || o + 4 > bytes.length) -1L
        else if (le) u8(o).toLong | (u8(o + 1).toLong << 8) |
          (u8(o + 2).toLong << 16) | (u8(o + 3).toLong << 24)
        else (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) |
          (u8(o + 2).toLong << 8) | u8(o + 3).toLong
      if (u16(tiffOff + 2) != 42) return None
      val ifdRel = u32(tiffOff + 4)
      if (ifdRel < 0 || tiffOff + ifdRel + 2 > bytes.length) return None
      val ifd = tiffOff + ifdRel.toInt
      val count = u16(ifd)
      if (count < 0 || count > 512 ||
          ifd + 2 + count * 12 > bytes.length) return None
      var (make, model, dt) = ("", "", "")
      var orient = 0
      var i = 0
      while (i < count) {
        val e = ifd + 2 + i * 12
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4)
        def ascii(): String = {
          if (typ != 2 || cnt <= 0 || cnt > 4096) ""
          else {
            val off = if (cnt <= 4) e + 8 else tiffOff + u32(e + 8).toInt
            if (off < 0 || off + cnt > bytes.length) ""
            else {
              val raw = new String(bytes, off, cnt.toInt,
                java.nio.charset.StandardCharsets.US_ASCII)
              raw.takeWhile(_ != '\u0000')
            }
          }
        }
        tag match {
          case 0x010F => make = ascii()
          case 0x0110 => model = ascii()
          case 0x0112 => if (typ == 3 && cnt == 1) orient = u16(e + 8)
          case 0x0132 => dt = ascii()
          case _      => ()
        }
        i += 1
      }
      Some((if (le) "II" else "MM", make, model, orient, dt, count))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Build a standard Exif APP1 segment (`FF E1 len "Exif\0\0"` +
    * TIFF) carrying IFD0 entries Make/Model/Orientation/DateTime, in
    * either byte order — the writer half the fixture uses; production
    * only parses. */
  private[llm] def buildExifApp1(le: Boolean, make: String, model: String,
                                 orientation: Int, dateTime: String): Array[Byte] = {
    val tiffBytes = buildTiffExif(le, make, model, orientation, dateTime)
    val payload = "Exif\u0000\u0000".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ tiffBytes
    val app1 = java.nio.ByteBuffer.allocate(4 + payload.length)
    app1.put(0xFF.toByte); app1.put(0xE1.toByte)
    app1.putShort((payload.length + 2).toShort) // len includes itself
    app1.put(payload)
    app1.array()
  }

  /** The raw TIFF (header + IFD0 + out-of-line values) shared by the
    * JPEG APP1 and PNG eXIf writers. */
  private[llm] def buildTiffExif(le: Boolean, make: String, model: String,
                                 orientation: Int, dateTime: String): Array[Byte] = {
    val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN
                else java.nio.ByteOrder.BIG_ENDIAN
    val makeB = (make + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val modelB = (model + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dtB = (dateTime + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // layout: 8-byte header, IFD0 (2 + 4·12 + 4), then the out-of-line
    // ASCII values (all three > 4 bytes in practice; ≤4 goes inline)
    val dataStart = 8 + 2 + 4 * 12 + 4
    val outOfLine = Seq(makeB, modelB, dtB).filter(_.length > 4)
    val tiff = java.nio.ByteBuffer.allocate(
      dataStart + outOfLine.map(_.length).sum).order(order)
    tiff.put(if (le) "II".getBytes else "MM".getBytes)
    tiff.putShort(42)
    tiff.putInt(8) // IFD0 right after the header
    tiff.putShort(4) // 4 entries
    var cursor = dataStart
    def asciiEntry(tag: Int, v: Array[Byte]): Unit = {
      tiff.putShort(tag.toShort); tiff.putShort(2 /* ASCII */)
      tiff.putInt(v.length)
      if (v.length <= 4) {
        val inline = java.util.Arrays.copyOf(v, 4)
        tiff.put(inline) // inline value, zero-padded, order-independent
      } else { tiff.putInt(cursor); cursor += v.length }
    }
    // tags ascending, per TIFF 6.0
    asciiEntry(0x010F, makeB)
    asciiEntry(0x0110, modelB)
    tiff.putShort(0x0112); tiff.putShort(3 /* SHORT */); tiff.putInt(1)
    tiff.putShort(orientation.toShort); tiff.putShort(0) // SHORT packs first
    asciiEntry(0x0132, dtB)
    tiff.putInt(0) // no IFD1
    outOfLine.foreach(tiff.put)
    tiff.array()
  }

  /** Insert an `eXIf` chunk (PNG 1.2 extension, standardized 2017:
    * chunk data = the raw TIFF) right after IHDR - ancillary, so
    * every PNG decoder still reads the image; [[parseExif]] walks the
    * chunk list to it. */
  private[llm] def pngWithExif(png: Array[Byte], tiff: Array[Byte]): Array[Byte] = {
    // PNG layout: 8-byte signature, then chunks; IHDR is always first
    // (4 len + 4 type + 13 data + 4 crc) -> insertion point is 33
    val at = 8 + 4 + 4 + 13 + 4
    require(png.length > at, "not a PNG")
    val chunk = java.nio.ByteBuffer.allocate(12 + tiff.length)
    chunk.putInt(tiff.length)
    chunk.put("eXIf".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    chunk.put(tiff)
    val crc = new java.util.zip.CRC32()
    crc.update("eXIf".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    crc.update(tiff)
    chunk.putInt(crc.getValue.toInt)
    png.take(at) ++ chunk.array() ++ png.drop(at)
  }

  /** Deterministic JPEG-with-EXIF fixture: a real ImageIO-encoded
    * JPEG (decodable end-to-end) with a handcrafted Exif APP1 spliced
    * after SOI — metadata fields are pure functions of the id, byte
    * order alternates II/MM, so the oracle replays every parsed field
    * from the generation formula while the bytes walk the real
    * marker/IFD path. */
  private[graft] def fixtureJpegExif(id: Long): Array[Byte] = {
    codecInit // JVM-global in-memory stream cache, first codec use
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(renderFixtureFrame(id, 24), "jpg", out)
    val jpeg = out.toByteArray
    val app1 = buildExifApp1(
      le = id % 2 == 0,
      make = s"Cam${id % 5}",
      model = s"M-${id % 3}",
      orientation = (1 + id % 8).toInt,
      dateTime = f"2024:${1 + id % 12}%02d:${1 + id % 28}%02d 10:00:00")
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** Deterministic synthetic VIDEO — the oracle-replayable fixture for
    * the keyframe pipeline: a REAL RIFF/AVI container (the same layout
    * [[parseAviMjpeg]] walks for production MJPEG) whose stream chunks
    * carry PNG-encoded frames, so the demux, per-frame decode, dHash,
    * and scene-change math all run for real while the pixel values
    * stay formula-replayable in SQL (PNG is lossless; JPEG's DCT is
    * not — the JPEG frame path is pinned in sbt instead,
    * MultimodalSpec/LlmSpec). Scene cuts at frames `2 + id % 2` and 4
    * change the gradient base (a large dHash jump); odd frames within
    * a scene get the llm69 last-columns inversion (a few bits — below
    * any sane keyframe threshold). `startFrame` > 0 renders a TRIMMED
    * cut of the same content (frames startFrame..nFrames−1, scene
    * schedule unchanged) — the re-upload edit video near-dedup must
    * survive. */
  private[graft] def fixtureAviPng(id: Long, nFrames: Int = 6,
                                   startFrame: Int = 0): Array[Byte] = {
    val cut1 = 2 + (id % 2L).toInt
    val frames = (startFrame until nFrames).map { f =>
      val scene = (if (f >= cut1) 1 else 0) + (if (f >= 4) 1 else 0)
      encodePng(renderFixtureFrame(id * 7L + scene * 31L + 5L,
        if (f % 2 == 1) 20 else 24))
    }
    aviContainer(frames)
  }

  /** [[fixtureAviPng]]'s HASH-PIXEL sibling for cross-video fixtures:
    * the linear lattice repeats every 256 base values (identical
    * frames across unrelated videos — fine within one video, a
    * hot-fingerprint degeneracy for a corpus-wide join), so frames
    * here take every channel from the portable hash of
    * (content id, scene, x, y) — unique per (cid, scene) at any
    * corpus size, still replayable in SQL from the same hash. Scene
    * schedule, odd-frame last-columns inversion, and trim semantics
    * as [[fixtureAviPng]]. */
  private[graft] def fixtureAviHashed(id: Long, nFrames: Int = 6,
                                      startFrame: Int = 0): Array[Byte] = {
    val cut1 = 2 + (id % 2L).toInt
    val frames = (startFrame until nFrames).map { f =>
      val scene = (if (f >= cut1) 1 else 0) + (if (f >= 4) 1 else 0)
      encodePng(renderHashedFrame(id, scene, invert = f % 2 == 1))
    }
    aviContainer(frames)
  }

  /** BIT-PLANTED dHash fixture image — the cluster-chain geometry
    * generator: the 64 dHash bits of the rendered image equal a
    * hash-derived pattern XOR a tier mask (tier 1 flips bits 0–5,
    * tier 2 flips 0–11), realized as per-row luminance walks of ±8
    * gray levels between lattice columns (strict inequality both
    * directions, so the REAL PNG→ImageIO→dHash path must reproduce
    * the planted bits exactly). Tiers step 6 Hamming bits apart with
    * endpoints 12 apart — a transitive near-dup chain only a closure
    * can group, while the 4×16-bit banding still surfaces every
    * adjacent (and the rejected endpoint) candidate. id encodes
    * (tier = id / 100000, cid = id % 100000). */
  private[graft] def fixturePngBits(id: Long): Array[Byte] = {
    val cid = id % 100000L
    val tier = (id / 100000L).toInt
    encodePng(renderBitsImage { b =>
      val base = graft.functions.Portable.hash64Jvm(s"$cid:$b") % 2 == 1
      val m1 = tier >= 1 && b < 6
      val m2 = tier == 2 && b >= 6 && b < 12
      base ^ m1 ^ m2
    })
  }

  /** The shared bit-planting renderer: a 24×16 grayscale image whose
    * 64 dHash bits equal `bit(0..63)`, realized as per-row luminance
    * walks of ±8 gray levels between lattice columns (strict
    * inequality both directions — the REAL decode must reproduce the
    * planted bits exactly). */
  /** BURST fixture: PNG whose dHash bits are planted per (burst,
    * member) and whose eXIf chunk carries the burst's device + a
    * capture time inside the burst's 10-second window. docId encodes
    * burst = id/4, member = id%4; members share the burst's base bit
    * pattern with member m ≥ 1 flipping bits [2(m−1), 2m) — pairwise
    * Hamming ≤ 4. Every 3rd burst's member 3 is a STRANGER: same
    * device, same window (a different photographer's shot landing in
    * the block), but independent bits — the content verify, not the
    * blocking, must reject it. */
  private[graft] def fixturePngBurst(docId: Long): Array[Byte] = {
    val burst = docId / 4
    val member = (docId % 4).toInt
    val stranger = member == 3 && burst % 3 == 0
    val png = encodePng(renderBitsImage { b =>
      val seed = if (stranger) s"S$burst:$b" else s"$burst:$b"
      val base = graft.functions.Portable.hash64Jvm(seed) % 2 == 1
      val flip = !stranger && member >= 1 && b >= 2 * (member - 1) && b < 2 * member
      base ^ flip
    })
    val dd = 1 + (burst / 1440) % 28
    val hh = (burst / 60) % 24
    val mm = burst % 60
    pngWithExif(png, buildTiffExif(
      le = burst % 2 == 0,
      make = s"Cam${burst % 5}",
      model = s"M-${burst % 3}",
      orientation = 1,
      dateTime = f"2024:01:$dd%02d $hh%02d:$mm%02d:0$member"))
  }

  /** BURST-SHOT near-dup clusters — EXIF-blocked perceptual dedup,
    * the photo-library treatment (composing [[parseExif]]'s new
    * device/time signal with the dHash family): candidates are pairs
    * sharing (Make, Model, 10-second capture window) — CONTENT-BLIND
    * blocking that never touches pixels, cutting the candidate space
    * to within-block pairs (bursts are tens of shots, so blocks are
    * tiny at ANY corpus size — no LSH stage needed where llm70 pays
    * banding); the verify is Hamming ≤ `maxHamming` on the 64-bit
    * dHash, and connected components turn verified pairs into burst
    * clusters with a min-id representative. One codec pass (both
    * UDFs at the scan), one shuffle on the (device, window) block
    * key, one on the 8-byte cluster ids — image bytes never cross an
    * exchange. The 10-second window is string-truncation of the EXIF
    * DateTime (chars 1–18): tumbling semantics, zero timezone/parse
    * ambiguity for cross-engine replay; a burst straddling a boundary
    * splits (the standard tumbling trade — union a shifted bucketing
    * for sliding semantics). */
  def burstShotClusters(df: DataFrame, idCol: Column, bytesCol: Column,
                        maxHamming: Int,
                        tracker: Option[graft.operators.Materialize.Tracker] = None): DataFrame = {
    val meta = udf((bytes: Array[Byte]) => parseExif(bytes))
    val dh = udf((bytes: Array[Byte]) => dhash64(bytes))
    val shots0 = df
      .select(idCol.cast("long").as("doc_id"),
        meta(bytesCol).as("__x"), dh(bytesCol).as("dhash"))
      .where(col("__x").isNotNull && col("dhash").isNotNull)
      .select(col("doc_id"),
        col("__x._2").as("make"), col("__x._3").as("model"),
        substring(col("__x._5"), 1, 18).as("tbucket"), col("dhash"))
    // one codec pass feeds the self-join's both sides and the output
    val shots = graft.operators.Materialize.eager(shots0)
    tracker.foreach(_.track(shots))
    val a = shots.select(col("doc_id").as("id_a"), col("make"), col("model"),
      col("tbucket"), col("dhash").as("__ha"))
    val b = shots.select(col("doc_id").as("id_b"), col("make"), col("model"),
      col("tbucket"), col("dhash").as("__hb"))
    val pairs = a.join(b, Seq("make", "model", "tbucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("__ha").bitwiseXOR(col("__hb"))) <= maxHamming)
      .select(col("id_a"), col("id_b"))
    val cc = Dedup.connectedComponents(pairs, tracker = tracker)
      .withColumnRenamed("doc_id", "__d")
    val labeled = shots.select(col("doc_id"))
      .join(cc, col("doc_id") === col("__d"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("burst_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("burst_id"))
    labeled
      .withColumn("n_shots", count(lit(1)).over(w))
      .withColumn("keep", col("burst_id") === col("doc_id"))
  }

  private def renderBitsImage(bit: Int => Boolean): java.awt.image.BufferedImage = {
    val (w, h) = (24, 16)
    // lattice columns for w=24: xpx(gx) = min(gx*24/9, 23)
    val xpx = (0 to 8).map(gx => math.min(gx * w / 9, w - 1))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (gy <- 0 until 8) {
      // per-row walk: v(0)=128, ±8 per planted bit — range [64, 192]
      val v = new Array[Int](9)
      v(0) = 128
      for (gx <- 0 until 8) v(gx + 1) = v(gx) + (if (bit(gy * 8 + gx)) 8 else -8)
      for (y <- gy * 2 until math.min(gy * 2 + 2, h); x <- 0 until w) {
        // step function: the value of the nearest lattice column at or left
        val g = v(xpx.lastIndexWhere(_ <= x))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
    }
    img
  }

  private def renderHashedFrame(cid: Long, scene: Int,
                                invert: Boolean): java.awt.image.BufferedImage = {
    val (w, h) = (24, 16)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val hv = graft.functions.Portable.hash64Jvm(s"$cid:$scene:$x:$y")
      var (r, g, b) = ((hv % 256L).toInt, ((hv >> 8) % 256L).toInt,
        ((hv >> 16) % 256L).toInt)
      if (invert && x >= 20) { r = 255 - r; g = 255 - g; b = 255 - b }
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** Minimal RIFF/AVI assembly around encoded frames — the layout
    * [[parseAviMjpeg]] walks (avih main header + movi `00dc` chunks);
    * defaults are the fixture geometry (24×16 @ 40 ms/frame).
    * private[llm] so codec tests feed parseAviMjpeg the exact
    * production container instead of a parallel copy. */
  private[llm] def aviContainer(frames: Seq[Array[Byte]], w: Int = 24,
                                h: Int = 16, usPerFrame: Int = 40000): Array[Byte] = {
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        le(payload.length) ++ payload ++ pad
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ children)
    val avih = chunk("avih",
      le(usPerFrame) ++ le(0) ++ le(0) ++ le(0) ++
      le(frames.size) ++ le(0) ++ le(1) ++ le(0) ++
      le(w) ++ le(h) ++ new Array[Byte](16))
    val movi = list("movi", frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      list("hdrl", avih) ++ movi
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ le(body.length) ++ body
  }

  /** KEYFRAME detection over a video column — the frame-sampling stage
    * a multimodal training pipeline runs before captioning/dedup (one
    * representative frame per scene, not one per tick): demux the
    * container ([[parseAviMjpeg]]'s RIFF walk), sample up to
    * `maxFrames` frames evenly, dHash each through the real image
    * codec, and keep the frames whose Hamming distance from the
    * PREVIOUS sampled frame exceeds `hammingThreshold` (plus the first
    * frame, hamming = −1 — every video has at least one keyframe).
    * The UDF sits only at the codec seam and emits (frame_idx, dhash)
    * pairs — 12 bytes per sampled frame, never pixels; the
    * scene-change math is Column algebra (lag window per video,
    * bounded by maxFrames rows, then bit_count). Undecodable frames
    * drop; non-AVI bytes yield no rows (corrupt blobs never kill the
    * scan). */
  def videoKeyframes(df: DataFrame, idCol: Column, bytesCol: Column,
                     maxFrames: Int, hammingThreshold: Int): DataFrame = {
    val fh = udf { (bytes: Array[Byte]) =>
      parseAviMjpeg(bytes).map { case (_, _, _, frames) =>
        val picks =
          if (frames.size <= maxFrames) frames.indices
          else (0 until maxFrames).map(i => i * frames.size / maxFrames)
        picks.flatMap(i => dhash64(frames(i)).map(dh => (i, dh)))
      }.getOrElse(Seq.empty[(Int, Long)])
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    df.select(idCol.cast("long").as("doc_id"), fh(bytesCol).as("__fr"))
      .select(col("doc_id"), explode(col("__fr")).as("f"))
      .select(col("doc_id"), col("f._1").as("frame_idx"), col("f._2").as("dhash"))
      .withColumn("__p", lag(col("dhash"), 1).over(w))
      .withColumn("hamming", when(col("__p").isNull, lit(-1))
        .otherwise(bit_count(col("dhash").bitwiseXOR(col("__p")))).cast("int"))
      .filter(col("hamming") === -1 || col("hamming") > hammingThreshold)
      .select(col("doc_id"), col("frame_idx"), col("dhash"), col("hamming"))
  }

  /** The √dim × √dim Rec.601 luminance lattice over decoded pixels,
    * normalized to [0,1] — shared by the image codec and the per-frame
    * video features. */
  private def luminanceLattice(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    Array.tabulate(dim) { i =>
      val x = ((i % g) * img.getWidth / g).min(img.getWidth - 1)
      val y = (((i / g) % g) * img.getHeight / g).min(img.getHeight - 1)
      val rgb = img.getRGB(x, y)
      val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      (lum / 255.0).toFloat
    }
  }

  // ------------------------------------------------------------------
  // Real audio codec (javax.sound.sampled — WAV/AIFF/AU in every JVM)

  /** Output schema of [[extractAudioInfo]]: container metadata plus the
    * sampled feature vector; sample_rate/channels/duration_us are null
    * when the bytes did not parse as audio. */
  val audioInfoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", FloatType),
    StructField("channels", IntegerType),
    StructField("duration_us", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** REAL audio decode for audio media types: javax.sound.sampled
    * parses the container (WAV/AIFF/AU — in the JVM, no external dep),
    * yielding (sampleRate, channels, duration µs, features). Features
    * are `dim` mean-absolute-amplitude windows over the first channel,
    * normalized to [0,1] — the cheap loudness-envelope fingerprint for
    * dedup/similarity, deterministic across JVMs (integer PCM in,
    * fixed-order double accumulation). PCM 8-bit (signed/unsigned) and
    * 16-bit (either endianness) are decoded; anything else, corrupt
    * bytes, or null yields None and callers fall back to the hash stub
    * — a bad blob NEVER kills a 100 TB scan. */
  private[llm] def decodeAudio(bytes: Array[Byte], dim: Int): Option[(Float, Int, Long, Array[Float])] = {
    if (bytes == null) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val data = ais.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val nFrames = if (frameBytes > 0) data.length / frameBytes else 0
        if (nFrames <= 0 || (bits != 8 && bits != 16)) None
        else {
          val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val big = fmt.isBigEndian
          // first-channel sample → |amplitude| in [0,1]
          def amp(frame: Int): Double = {
            val off = frame * frameBytes
            if (bits == 8) {
              val v = if (signed) data(off).toInt else (data(off) & 0xff) - 128
              math.abs(v / 128.0)
            } else {
              val (b0, b1) = if (big) (data(off), data(off + 1)) else (data(off + 1), data(off))
              val v = (b0.toInt << 8) | (b1 & 0xff)
              math.abs(v / 32768.0)
            }
          }
          val feats = Array.tabulate(dim) { w =>
            val from = (w.toLong * nFrames / dim).toInt
            val until = (((w + 1).toLong * nFrames / dim).toInt).max(from + 1).min(nFrames)
            var s = 0.0
            var i = from
            while (i < until) { s += amp(i); i += 1 }
            (s / (until - from)).toFloat
          }
          val durationUs = math.round(nFrames * 1e6d / fmt.getSampleRate)
          Some((fmt.getSampleRate, channels, durationUs, feats))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** INTEGER-EXACT loudness envelope over the SAME real javax.sound
    * decode as [[decodeAudio]] — the oracle-portable fingerprint:
    * per-window sums of |sample| accumulate as integers (order-free),
    * and each window reports `sum·1e6 DIV (count·fullScale)` — pure
    * integer arithmetic any engine replays exactly from raw PCM
    * values, where decodeAudio's sequential double accumulation is
    * JVM-deterministic but not aggregation-order-free. Returns
    * (sampleRate, channels, duration µs, per-window quantized
    * envelope); None on undecodable/unsupported bytes. */
  private[graft] def audioEnvelopeQ(bytes: Array[Byte], dim: Int): Option[(Float, Int, Long, Array[Long])] = {
    if (bytes == null) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val data = ais.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val nFrames = if (frameBytes > 0) data.length / frameBytes else 0
        if (nFrames <= 0 || (bits != 8 && bits != 16)) None
        else {
          val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val big = fmt.isBigEndian
          val fullScale = 1L << (bits - 1)
          def absAmp(frame: Int): Long = {
            val off = frame * frameBytes
            if (bits == 8) {
              val v = if (signed) data(off).toInt else (data(off) & 0xff) - 128
              math.abs(v.toLong)
            } else {
              val (b0, b1) = if (big) (data(off), data(off + 1)) else (data(off + 1), data(off))
              val v = if (signed) (b0.toInt << 8) | (b1 & 0xff)
                      else (((b0 & 0xff) << 8) | (b1 & 0xff)) - 32768
              math.abs(v.toLong)
            }
          }
          val env = Array.tabulate(dim) { w =>
            val from = (w.toLong * nFrames / dim).toInt
            val until = (((w + 1).toLong * nFrames / dim).toInt).max(from + 1).min(nFrames)
            var s = 0L
            var i = from
            while (i < until) { s += absAmp(i); i += 1 }
            s * 1000000L / ((until - from).toLong * fullScale)
          }
          Some((fmt.getSampleRate, channels,
            math.round(nFrames * 1e6d / fmt.getSampleRate), env))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** MULTIMODAL REFERENTIAL-INTEGRITY AUDIT — the lake-scale
    * consistency check a media corpus owes its text side: documents
    * whose media reference resolves to nothing (orphans — a training
    * run either crashes or silently trains text-only) and media rows
    * no document references (dangling — paid storage, no training
    * signal; also the GC candidate list). Two anti-join-shaped hash
    * joins keyed on the 8-byte id — the only rows on any exchange are
    * (id) / (source, two longs); the dangling count broadcasts back
    * as a one-row frame.
    *
    * @return (source, n_docs, orphan_docs, dangling_media) */
  def referentialAudit(docs: DataFrame, docIdCol: Column, sourceCol: Column,
                       media: DataFrame, mediaIdCol: Column): DataFrame = {
    // round-21 (guide §2.4): BOTH audit legs ride ONE full-outer join —
    // the old shape ran a left join (orphans) AND a left-anti join
    // (dangling), scanning docs and media twice each. Doc-absent rows
    // (dangling media) fold into the __isdoc=false group of the same
    // aggregate; the global dangling count is attached by a window over
    // the AGGREGATED frame (sources+1 rows — bounded by source count,
    // the documented small-grain window exception).
    import org.apache.spark.sql.expressions.Window
    val j = docs.select(docIdCol.as("__did"), sourceCol.as("source"))
      .join(media.select(mediaIdCol.as("__mid")),
        col("__did") === col("__mid"), "full_outer")
    j.groupBy(col("__did").isNotNull.as("__isdoc"), col("source"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__mid").isNull, 1L).otherwise(0L)).as("__orph"))
      .withColumn("dangling_media",
        coalesce(sum(when(!col("__isdoc"), col("__n")))
          .over(Window.partitionBy()), lit(0L)))
      .filter(col("__isdoc"))
      .select(col("source"), col("__n").as("n_docs"),
        col("__orph").as("orphan_docs"), col("dangling_media"))
  }

  /** AUDIO QUALITY PROBE over the same real javax.sound decode as
    * [[audioEnvelopeQ]] — the speech-corpus gate: silence fraction
    * (dead air, truncated recordings), clipping fraction (gain
    * damage), and an integer loudness level. All counters are
    * integers over the decoded PCM magnitudes, so any engine replays
    * them exactly from raw sample values.
    *
    * @return (nFrames, nSilent |v|<silenceThresh,
    *          nClipped |v|>=clipThresh, sumAbs); None if undecodable */
  private[graft] def audioQualityQ(bytes: Array[Byte], silenceThresh: Long,
                                   clipThresh: Long): Option[(Long, Long, Long, Long)] = {
    if (bytes == null) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val data = ais.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val nFrames = if (frameBytes > 0) data.length / frameBytes else 0
        if (nFrames <= 0 || bits != 16) None
        else {
          val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val big = fmt.isBigEndian
          var silent = 0L; var clipped = 0L; var sumAbs = 0L
          var i = 0
          while (i < nFrames) {
            val off = i * frameBytes
            val (b0, b1) = if (big) (data(off), data(off + 1)) else (data(off + 1), data(off))
            val v = if (signed) (b0.toInt << 8) | (b1 & 0xff)
                    else (((b0 & 0xff) << 8) | (b1 & 0xff)) - 32768
            val a = math.abs(v.toLong)
            if (a < silenceThresh) silent += 1
            if (a >= clipThresh) clipped += 1
            sumAbs += a
            i += 1
          }
          Some((nFrames.toLong, silent, clipped, sumAbs))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[fixtureWav]] with planted QUALITY defects: `silence` zeroes
    * samples [500, 1000) (25% dead air), `clip` pins samples
    * [1500, 1600) to full scale preserving sign (5% clipping) — both
    * pure integer overrides of the base formula, so the oracle
    * replays every sample. */
  private[graft] def fixtureWavQuality(id: Long, silence: Boolean,
                                       clip: Boolean): Array[Byte] = {
    val n = 2000
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val v = ((id * 7919L + i * 104729L) % 65536L) - 32768L
      val s =
        if (silence && i >= 500 && i < 1000) 0L
        else if (clip && i >= 1500 && i < 1600) { if (v >= 0) 32767L else -32768L }
        else v
      out.putShort(s.toShort)
      i += 1
    }
    out.array()
  }

  /** Deterministic synthetic WAV — the oracle-replayable audio
    * fixture, [[fixturePng]]'s audio sibling: mono PCM signed 16-bit
    * little-endian, 8 kHz, 2000 samples with
    * `sample(i) = (base·7919 + i·104729) mod 65536 − 32768` — pure
    * integer functions of (base id, i). WAV PCM is lossless, so the
    * javax.sound decode must hand back exactly these values; the
    * llm71 oracle recomputes them from the formula and replays the
    * integer envelope in SQL, proving the REAL container-parse →
    * PCM-decode → fingerprint path end-to-end. */
  private[graft] def fixtureWav(id: Long): Array[Byte] = fixtureWav(id, 2000)

  /** `perturbFrom` < n renders an EDITED take of the same recording:
    * samples from that index have their MAGNITUDE halved (truncating
    * division on the absolute value, sign preserved — decoded |v|
    * then equals |v| // 2 exactly, floor = truncation on
    * non-negatives, so SQL replays it; naive v/2 would diverge from
    * SQL floor division on negative samples). The localized-edit
    * audio twin for near-dup fixtures. */
  private[graft] def fixtureWav(id: Long, perturbFrom: Int): Array[Byte] = {
    val n = 2000
    val base = id
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // rate, byte rate
      .putShort(2).putShort(16)   // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val v = ((base * 7919L + i * 104729L) % 65536L) - 32768L
      val s = if (i >= perturbFrom) { val m = math.abs(v) / 2; if (v < 0) -m else m }
              else v
      out.putShort(s.toShort)
      i += 1
    }
    out.array()
  }

  // ------------------------------------------------------------------
  // Real video CONTAINER parsing (ISO-BMFF / MP4 box structure — the
  // public ISO 14496-12 layout; frame DECODE stays stubbed: no video
  // codec ships with the JVM)

  /** Output schema of [[extractVideoInfo]]: container metadata plus
    * the (stub) feature vector; metadata null when the bytes are not
    * an ISO-BMFF container. */
  val videoInfoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** REAL ISO-BMFF (MP4/MOV) container metadata: walks the box tree —
    * `[size(4) type(4) payload]`, big-endian, size includes the
    * header — to `moov/mvhd` (timescale + duration → milliseconds)
    * and `moov/trak/tkhd` (track width/height, 16.16 fixed point).
    * Box walking is the real production step before any frame work
    * (demux targeting, corrupt-file triage, duration-based sampling
    * plans); frame decode itself remains behind [[decodeStub]].
    * Corrupt or non-BMFF bytes yield None — never an exception. */
  private[llm] def parseMp4Meta(bytes: Array[Byte]): Option[(Long, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
      def boxes(from: Int, until: Int): Seq[(String, Int, Int)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var p = from
        while (p + 8 <= until) {
          val size = buf.getInt(p)
          val name = new String(bytes, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (size < 8 || p + size > until) return out.toSeq // corrupt tail: stop
          out += ((name, p + 8, p + size))
          p += size
        }
        out.toSeq
      }
      val top = boxes(0, bytes.length)
      if (!top.exists(_._1 == "ftyp")) return None // not an ISO-BMFF file
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      val inMoov = boxes(moov._2, moov._3)
      val durationMs = inMoov.find(_._1 == "mvhd").flatMap { case (_, s, _) =>
        val version = buf.get(s) & 0xff
        // v0: ts(4)+mod(4)+timescale(4)+duration(4); v1: 8-byte times
        val (timescale, duration) =
          if (version == 1) (buf.getInt(s + 20).toLong, buf.getLong(s + 24))
          else (buf.getInt(s + 12).toLong, buf.getInt(s + 16).toLong & 0xffffffffL)
        if (timescale <= 0) None else Some(duration * 1000L / timescale)
      }
      val dims = inMoov.filter(_._1 == "trak").flatMap { case (_, s, e) =>
        boxes(s, e).find(_._1 == "tkhd").map { case (_, ts, _) =>
          val version = buf.get(ts) & 0xff
          // v0: vf(4)+creation(4)+modification(4)+track_ID(4)+reserved(4)+duration(4)
          // v1: vf(4)+creation(8)+modification(8)+track_ID(4)+reserved(4)+duration(8)
          val base = if (version == 1) ts + 36 else ts + 24
          // …then reserved(8) + layer(2) + alt(2) + volume(2) + pad(2) + matrix(36)
          val wOff = base + 8 + 2 + 2 + 2 + 2 + 36
          (buf.getInt(wOff) >>> 16, buf.getInt(wOff + 4) >>> 16) // 16.16 fixed
        }
      }.find { case (w, h) => w > 0 && h > 0 }
      durationMs.map(d => (d, dims.map(_._1).getOrElse(0), dims.map(_._2).getOrElse(0)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL ISO-BMFF sample extraction for JPEG-coded video tracks
    * (codec fourcc `jpeg`/`mjpa`/`mjpb` — Motion-JPEG in MP4/MOV):
    * walks `moov/trak/mdia/minf/stbl` and materializes each sample's
    * byte range from the sample tables — `stsd` (codec check),
    * `stsz` (sample sizes, uniform or per-sample), `stsc`
    * (sample→chunk runs), `stco`/`co64` (chunk offsets). Each
    * returned slice is one complete JPEG image. Tracks with any
    * other codec (H.264 etc.) return None — frame DECODE for those
    * stays the declared stub; this is the demux step a production
    * codec plugs into. Corrupt bytes yield None, never an
    * exception. */
  private[llm] def parseMp4JpegSamples(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      def boxes(from: Int, until: Int): Seq[(String, Int, Int)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var p = from
        while (p + 8 <= until) {
          val size = buf.getInt(p)
          val name = new String(bytes, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (size < 8 || p + size > until) return out.toSeq
          out += ((name, p + 8, p + size))
          p += size
        }
        out.toSeq
      }
      def child(parent: (String, Int, Int), name: String): Option[(String, Int, Int)] =
        boxes(parent._2, parent._3).find(_._1 == name)
      val top = boxes(0, bytes.length)
      if (!top.exists(_._1 == "ftyp")) return None
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      boxes(moov._2, moov._3).filter(_._1 == "trak").iterator.flatMap { trak =>
        for {
          mdia <- child(trak, "mdia")
          minf <- child(mdia, "minf")
          stbl <- child(minf, "stbl")
          stsd <- child(stbl, "stsd")
          // stsd: version/flags(4) entry_count(4), entries of
          // [size(4) fourcc(4) …] — only JPEG-family codecs decode
          codec = new String(bytes, stsd._2 + 12, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          if codec == "jpeg" || codec == "mjpa" || codec == "mjpb"
          stsz <- child(stbl, "stsz")
          stsc <- child(stbl, "stsc")
          stco <- child(stbl, "stco").orElse(child(stbl, "co64"))
        } yield {
          val uniformSize = buf.getInt(stsz._2 + 4)
          val sampleCount = buf.getInt(stsz._2 + 8)
          def sampleSize(i: Int): Int =
            if (uniformSize != 0) uniformSize else buf.getInt(stsz._2 + 12 + 4 * i)
          val wide = stco._1 == "co64"
          val chunkCount = buf.getInt(stco._2 + 4)
          def chunkOffset(c: Int): Long =
            if (wide) buf.getLong(stco._2 + 8 + 8 * c)
            else buf.getInt(stco._2 + 8 + 4 * c).toLong & 0xffffffffL
          // stsc runs: (first_chunk 1-based, samples_per_chunk, sdi)
          val runCount = buf.getInt(stsc._2 + 4)
          val runs = (0 until runCount).map { r =>
            (buf.getInt(stsc._2 + 8 + 12 * r), buf.getInt(stsc._2 + 12 + 12 * r))
          }
          def samplesInChunk(c1: Int): Int = // c1 is 1-based
            runs.takeWhile(_._1 <= c1).lastOption.map(_._2).getOrElse(0)
          val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var sample = 0
          var c = 0
          while (c < chunkCount && sample < sampleCount) {
            var off = chunkOffset(c)
            var j = 0
            val n = samplesInChunk(c + 1)
            while (j < n && sample < sampleCount) {
              val sz = sampleSize(sample)
              if (off + sz > bytes.length || sz <= 0) return None // corrupt table
              frames += java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + sz)
              off += sz; j += 1; sample += 1
            }
            c += 1
          }
          frames.toSeq
        }
      }.nextOption()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL video features for Motion-JPEG in MP4/MOV: container
    * metadata from [[parseMp4Meta]], frames demuxed by the sample
    * tables ([[parseMp4JpegSamples]]), decoded through the JVM's JPEG
    * codec and averaged into the same temporal luminance fingerprint
    * as [[decodeAviVideo]]. None when the container is not BMFF, the
    * track is not JPEG-coded, or no frame decodes. */
  private[llm] def decodeMp4Video(bytes: Array[Byte], dim: Int, maxFrames: Int = 8)
      : Option[(Long, Int, Int, Array[Float])] =
    parseMp4JpegSamples(bytes).flatMap { frames =>
      val meta = parseMp4Meta(bytes)
      val picks =
        if (frames.size <= maxFrames) frames.indices
        else (0 until maxFrames).map(i => i * frames.size / maxFrames)
      codecInit // JVM-global in-memory stream cache, first codec use
      val acc = new Array[Double](dim)
      var n = 0
      picks.foreach { i =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(i)))
          if (img != null && img.getWidth > 0) {
            val f = luminanceLattice(img, dim)
            var j = 0
            while (j < dim) { acc(j) += f(j); j += 1 }
            n += 1
          }
        } catch { case scala.util.control.NonFatal(_) => () } // one bad frame never kills the row
      }
      if (n == 0) None
      else {
        val (d, w, h) = meta.getOrElse((0L, 0, 0))
        Some((d, w, h, Array.tabulate(dim)(j => (acc(j) / n).toFloat)))
      }
    }

  // ------------------------------------------------------------------
  // Real video FRAME decode for MJPEG-in-AVI (RIFF container walk +
  // the JVM's own JPEG codec) — Motion-JPEG is the video codec the
  // JVM can decode end to end (in AVI here, in MP4/MOV above);
  // other codecs stay behind the declared stub.

  /** RIFF/AVI walk (the public layout: `RIFF <size LE> AVI `, chunks
    * `[fourcc][size LE][data][pad-to-even]`, `LIST` chunks nest) to
    * the `avih` main header (µs/frame, total frames, width, height)
    * and the `movi` list's `##dc`/`##db` stream chunks — for MJPEG
    * each one is a complete JPEG image. Corrupt or non-AVI bytes
    * yield None, never an exception. */
  private[llm] def parseAviMjpeg(bytes: Array[Byte])
      : Option[(Long, Int, Int, Seq[Array[Byte]])] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      def cc(p: Int): String =
        new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def le4(p: Int): Long =
        (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
          ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
      var avih: Option[Int] = None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until) {
          val name = cc(p)
          val size = le4(p + 4).toInt
          if (size < 0 || p + 8 + size > until) return // corrupt tail: stop
          if (name == "LIST" && size >= 4) walk(p + 12, p + 8 + size)
          else if (name == "avih") avih = Some(p + 8)
          else if (name.endsWith("dc") || name.endsWith("db")) // stream data chunks
            frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)
          p += 8 + size + (size & 1) // chunks pad to even offsets
        }
      }
      walk(12, bytes.length)
      avih.map { s =>
        val usPerFrame = le4(s)
        val totalFrames = le4(s + 16)
        val w = le4(s + 32).toInt
        val h = le4(s + 36).toInt
        (usPerFrame * totalFrames / 1000L, w, h, frames.toSeq)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL video features for MJPEG-AVI: sample up to `maxFrames`
    * frames evenly across the stream, decode each through the JVM's
    * JPEG codec, and average their luminance lattices — a temporal
    * visual fingerprint of the same shape as the image features.
    * None when the container is not AVI or no frame decodes (callers
    * fall back to the metadata-only / stub path). */
  private[llm] def decodeAviVideo(bytes: Array[Byte], dim: Int, maxFrames: Int = 8)
      : Option[(Long, Int, Int, Array[Float])] =
    parseAviMjpeg(bytes).flatMap { case (durMs, w, h, frames) =>
      val picks =
        if (frames.size <= maxFrames) frames.indices
        else (0 until maxFrames).map(i => i * frames.size / maxFrames)
      codecInit // JVM-global in-memory stream cache, first codec use
      val acc = new Array[Double](dim)
      var n = 0
      picks.foreach { i =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(i)))
          if (img != null && img.getWidth > 0) {
            val f = luminanceLattice(img, dim)
            var j = 0
            while (j < dim) { acc(j) += f(j); j += 1 }
            n += 1
          }
        } catch { case scala.util.control.NonFatal(_) => () } // one bad frame never kills the row
      }
      if (n == 0) None
      else Some((durMs, w, h, Array.tabulate(dim)(j => (acc(j) / n).toFloat)))
    }

  /** Video container metadata + features in one pass: (doc_id,
    * duration_ms, width, height, features). MJPEG rows — in AVI
    * ([[decodeAviVideo]]) or MP4/MOV ([[decodeMp4Video]]) — get REAL
    * frame-decoded features; ISO-BMFF rows with any other codec get
    * real container metadata with stub features (no H.264 codec in
    * the JVM — the declared remaining stub); anything else is
    * metadata-null with stub features. */
  def extractVideoInfo(df: DataFrame, idCol: String, dim: Int): DataFrame = {
    val info = udf { (bytes: Array[Byte]) =>
      decodeAviVideo(bytes, dim).orElse(decodeMp4Video(bytes, dim)) match {
        case Some((d, w, h, f)) =>
          (Some(d), if (w > 0) Some(w) else None, if (h > 0) Some(h) else None, f)
        case None =>
          val feats = if (bytes == null) Array.empty[Float] else decodeStub(bytes, dim)
          parseMp4Meta(bytes) match {
            case Some((d, w, h)) =>
              (Some(d), if (w > 0) Some(w) else None, if (h > 0) Some(h) else None, feats)
            case None => (Option.empty[Long], Option.empty[Int], Option.empty[Int], feats)
          }
      }
    }
    df.select(col(idCol).cast("long").as("doc_id"), info(col("media")).as("__v"))
      .select(col("doc_id"), col("__v._1").as("duration_ms"), col("__v._2").as("width"),
              col("__v._3").as("height"), col("__v._4").as("features"))
  }

  /** Media-type-dispatched decode — the codec seam: image/ media types
    * go through the real [[decodeImage]] codec, audio/ through the real
    * [[decodeAudio]] codec, video/ through the real Motion-JPEG frame
    * decodes ([[decodeAviVideo]] for AVI, [[decodeMp4Video]] for
    * MP4/MOV — non-JPEG video codecs remain the declared stub: no
    * H.264 codec ships with the JVM, though container metadata is
    * real via [[parseMp4Meta]]); anything else (and any media that
    * fails to parse) through the deterministic [[decodeStub]], so the
    * oracle-checked stub path and the real codecs coexist behind one
    * call. */
  private[llm] def decodeByType(bytes: Array[Byte], mediaType: String, dim: Int): Array[Float] =
    if (bytes == null) Array.empty[Float]
    else if (mediaType != null && mediaType.startsWith("image/"))
      decodeImage(bytes, dim).map(_._3).getOrElse(decodeStub(bytes, dim))
    else if (mediaType != null && mediaType.startsWith("audio/"))
      decodeAudio(bytes, dim).map(_._4).getOrElse(decodeStub(bytes, dim))
    else if (mediaType != null && mediaType.startsWith("video/"))
      decodeAviVideo(bytes, dim).orElse(decodeMp4Video(bytes, dim))
        .map(_._4).getOrElse(decodeStub(bytes, dim))
    else decodeStub(bytes, dim)

  /** Typed feature extraction dispatching on `media_meta.media_type`
    * (the [[asMedia]] layout): real image decode for images, hash-stub
    * features otherwise. Same plan shape as [[extractFeatures]] — one
    * UDF projection, no plan break. */
  def extractFeaturesTyped(df: DataFrame, idCol: String, dim: Int): DataFrame = {
    val decode = udf((bytes: Array[Byte], mt: String) => decodeByType(bytes, mt, dim))
    df.select(col(idCol).cast("long").as("doc_id"),
              decode(col("media"), col("media_meta.media_type")).as("features"))
  }

  /** Audio metadata + features in one decode pass: (doc_id,
    * sample_rate, channels, duration_us, features); metadata null
    * (features stub) for rows that are not decodable audio. */
  def extractAudioInfo(df: DataFrame, idCol: String, dim: Int): DataFrame = {
    val info = udf { (bytes: Array[Byte]) =>
      decodeAudio(bytes, dim) match {
        case Some((sr, ch, dur, f)) => (Some(sr), Some(ch), Some(dur), f)
        case None => (Option.empty[Float], Option.empty[Int], Option.empty[Long],
          if (bytes == null) Array.empty[Float] else decodeStub(bytes, dim))
      }
    }
    df.select(col(idCol).cast("long").as("doc_id"), info(col("media")).as("__a"))
      .select(col("doc_id"), col("__a._1").as("sample_rate"), col("__a._2").as("channels"),
              col("__a._3").as("duration_us"), col("__a._4").as("features"))
  }

  /** Image metadata + features in one decode pass: (doc_id, width,
    * height, features); width/height null (features stub) for rows
    * that are not decodable images. */
  def extractImageInfo(df: DataFrame, idCol: String, dim: Int): DataFrame = {
    val info = udf { (bytes: Array[Byte]) =>
      decodeImage(bytes, dim) match {
        case Some((w, h, f)) => (Some(w), Some(h), f)
        case None => (Option.empty[Int], Option.empty[Int],
          if (bytes == null) Array.empty[Float] else decodeStub(bytes, dim))
      }
    }
    df.select(col(idCol).cast("long").as("doc_id"), info(col("media")).as("__i"))
      .select(col("doc_id"), col("__i._1").as("width"), col("__i._2").as("height"),
              col("__i._3").as("features"))
  }
}
