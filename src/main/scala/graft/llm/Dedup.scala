package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.operators.Materialize

/** Deduplication operators for training-data pipelines at 100 TB.
  *
  * The reference's precedent for content-addressed processing is its
  * hash toolkit (debezium-server-eventhubs/.../HashFunction.java:18-63)
  * and the LLM-training-data sink
  * (debezium-server-instructlab/.../InstructLabSinkConsumer.java); these
  * operators extend that to corpus-level dedup.
  *
  * Scale design:
  *  - exact dedup = one hash shuffle on a 64-bit content hash (not the
  *    full text!) — group keys are 8 bytes, so the shuffle moves
  *    ~n*(8+carried cols) bytes regardless of document size;
  *  - MinHash/LSH = explode to (band, bucket) keys, shuffle once on the
  *    bucket, pair only within buckets — candidate pairs, never n².
  */
object Dedup {

  /** Exact dedup: keep the lowest-id document per distinct content.
    * Grouping is on hash64(text) so the shuffle key is fixed-width; the
    * (astronomically unlikely) 60-bit collision is accepted — use
    * sha2-256 via `contentHash` for a stricter key.
    */
  def exact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.groupBy(Portable.hash64(textCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Engine-portable dedup normalization: lowercase, strip everything
    * but ASCII alphanumerics and whitespace, collapse whitespace runs,
    * trim. Catches the trivially-perturbed copies raw [[exact]] misses
    * (case flips, punctuation noise, reflowed whitespace) — the
    * "fuzzy-exact" tier between exact and MinHash dedup that corpus
    * pipelines run first because it is still a pure map + one hash
    * shuffle. Character classes are spelled as explicit ASCII sets
    * (`[ \t\n\r]`, not `\s`) — the Java∩RE2 portable subset (the
    * [[Pii]] convention), so any engine computes the identical key. */
  def normalizeText(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(textCol), "[^a-z0-9 \\t\\n\\r]", ""),
      "[ \\t\\n\\r]+", " "))

  /** [[exact]] over the [[normalizeText]] key: one codegen'd
    * normalize+hash projection, one 8-byte-hash shuffle — identical
    * scale shape to [[exact]]; the normalized text itself never
    * shuffles (only its hash does). */
  def normalizedExact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    exact(df, normalizeText(textCol), idCol)

  /** INCREMENTAL exact dedup — the daily-delta ingestion shape: a new
    * batch dedups against the content-hash INDEX of the already-
    * ingested corpus (left-anti join), then within itself (keep-min,
    * the same convention as [[exact]]). Returns one row per surviving
    * hash: (content_hash, keep_id, n_copies). Append the survivors'
    * hashes to the index and the loop is closed — the full corpus is
    * never re-scanned per batch.
    *
    * Scale shape: the index is fixed-width 8-byte hashes (never text);
    * the anti-join and the group both key on content_hash, so they
    * share one shuffle boundary. At 100 TB the index dwarfs every
    * delta — persist it BUCKETED by content_hash
    * ([[graft.operators.Bucketing]]) and the anti-join plans
    * shuffle-free on the index side, touching only the delta's
    * buckets. */
  def incrementalExact(batch: DataFrame, batchText: Column, batchId: Column,
                       seen: DataFrame, seenText: Column): DataFrame = {
    val idx = seen.select(Portable.hash64(seenText).as("content_hash")).distinct()
    batch.select(Portable.hash64(batchText).as("content_hash"), batchId.as("doc_id"))
      .join(idx, Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** [[incrementalExact]] with a BLOOM-FILTER prefilter — the shape
    * that survives when the seen-index dwarfs every delta (the steady
    * state of continuous ingestion): most batch docs are NOT replays,
    * and a bloom filter proves "definitely unseen" without any join.
    * Only the `mightContain` minority (true replays + the fpp sliver
    * of false positives) pays the exact anti-join; the definite-nots
    * bypass it entirely, so the join's batch side shrinks from |delta|
    * to ~|replays|. The filter itself is built DISTRIBUTED by Spark's
    * native `BloomFilterAggregate` (partial buffers merge like any
    * aggregate; nothing corpus-sized touches the driver) and reaches
    * the probe side as a scalar subquery — the exact mechanism of
    * Spark's own runtime join filters — where the codegen'd
    * `BloomFilterMightContain` probes it per row.
    *
    * Result is EXACTLY [[incrementalExact]]'s output: blooms have no
    * false negatives, so no unseen doc is lost, and every false
    * positive is re-checked by the anti-join. A given hash value lands
    * on one side of the prefilter deterministically, so the final
    * keep-min group sees all its copies. */
  def incrementalExactBloom(batch: DataFrame, batchText: Column, batchId: Column,
                            seen: DataFrame, seenText: Column,
                            expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val idx = seen.select(Portable.hash64(seenText).as("content_hash")).distinct()
    val maybeSeen = bloomMightContain(idx, col("content_hash"),
      col("content_hash"), expectedItems, fpp)
    val hashed = batch.select(
      Portable.hash64(batchText).as("content_hash"), batchId.as("doc_id"))
    val survivors = hashed.filter(!maybeSeen)
      .unionByName(hashed.filter(maybeSeen).join(idx, Seq("content_hash"), "left_anti"))
    survivors.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Shared bloom plumbing for the prefiltered dedups: builds the
    * filter DISTRIBUTED over `buildDf`'s `buildCol` (scalar subquery —
    * the mechanism of Spark's own runtime join filters) and returns
    * the codegen'd `might_contain` probe over `probeCol`. Sized with
    * the standard optimal-bits formula; an undersized filter stays
    * CORRECT (saturation only inflates the maybe-minority —
    * BloomDedupSpec pins it). */
  private[graft] def bloomMightContain(buildDf: DataFrame, buildCol: Column,
                                       probeCol: Column,
                                       expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
    val bloom = buildDf.select(ColumnBridge.column(
        BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(buildCol)),
          Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression()).as("bf"))
      .scalar()
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(xxhash64(probeCol))))
  }

  /** Character n-gram shingles (distinct) as an array column. Pure
    * Column algebra (sequence/transform/substr are codegen'd builtins),
    * no UDF on the scan path. */
  def shingles(textCol: Column, n: Int): Column = {
    // Round-20: one scalar call per document (the GramIndex.gramArray
    // treatment) — the transform lambda evaluated INTERPRETED, paying
    // a boxed index + Substring eval per position. Code-point slicing
    // preserved (Spark substr semantics); distinct keeps first-seen
    // order like array_distinct. Composed-form equality is pinned in
    // DedupScrubPropertySpec.
    val f = udf((s: String) => if (s == null) null else shinglesJvm(s, n))
    f(textCol)
  }

  /** The pre-round-20 column-algebra form of [[shingles]] — the
    * contract the equality pin replays. */
  private[llm] def shinglesComposed(textCol: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(textCol) - (n - 1), lit(1))),
      i => textCol.substr(i, lit(n))))

  private[llm] def shinglesJvm(s: String, n: Int): Array[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val starts = new Array[Int](bytes.length + 1)
    var cp = 0
    var b = 0
    while (b < bytes.length) {
      starts(cp) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      cp += 1
    }
    starts(cp) = bytes.length
    val m = math.max(cp - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      val e = starts(math.min(i + n, cp))
      seen.add(new String(bytes, s0, e - s0, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Word token array: split on whitespace runs, dropping empties. */
  def tokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

  /** MinHash signature: for each of k hash functions, the min portable
    * hash over the document's shingle set. Computed by exploding
    * shingles then one groupBy(doc) with k min() aggregates — map-side
    * partial aggregation keeps the shuffle at k longs per doc, and the
    * digest runs ONCE per shingle in a codegen'd projection. (A
    * shuffle-free array-transform formulation was measured SLOWER:
    * higher-order-function lambdas are interpreted, so the shared
    * base-hash subexpression gets re-evaluated inside each of the k
    * array_min lambdas — k digests per shingle. The tiny k-longs/doc
    * shuffle is the cheaper trade at every scale.) The k functions are
    * independent universal-hash permutations, NOT double hashes —
    * min(h1 + i·h2) is dominated by h1's argmin for every i, which
    * collapses the signatures (round-2 fix). */
  def minhashSignature(df: DataFrame, idCol: Column, shinglesCol: Column, k: Int): DataFrame = {
    // project the digest ONCE per shingle; the k aggregate inputs are
    // then pure integer arithmetic (universal-hash permutations) over
    // the base-hash column
    val exploded = df.select(idCol.as("doc_id"), explode(shinglesCol).as("shingle"))
      .select(col("doc_id"), Portable.baseHash31(col("shingle")).as("__h"))
    minAggs(exploded, k)
  }

  /** MinHash signatures straight from a TEXT column — the fast path
    * when the caller doesn't otherwise need the shingle arrays (pure
    * pair generation, e.g. llm05/llm17): explodes character POSITIONS
    * and hashes each n-gram substring inside one codegen'd projection,
    * so no shingle array is ever built (array construction +
    * array-explode measured ~35% of the signature stage at sf0.1).
    * Repeated shingles don't change a min(), so the array path's
    * array_distinct is unnecessary — signatures are value-identical
    * to `minhashSignature(df.withColumn("sh", shingles(t, n)), …)`. */
  /** Publish at least the session's shuffle-partition width under a
    * CPU-dense per-row pass (the MD5 digest stages below). Round 22:
    * at bench SFs the whole corpus is ONE parquet row group, so the
    * scan plans ONE input partition and the digest pass — the dominant
    * cost of every minhash-family query — ran on a single task
    * regardless of core count (measured: the llm05-shape signature
    * pass 2.4 s serialized vs 0.6 s at width 32). The explicit
    * partition count matters twice over: it comes from the session
    * conf (scale-adaptive, not a constant), and REPARTITION_BY_NUM is
    * exempt from AQE partition coalescing, which folds small
    * by-column shuffle reads back to one partition. At real scale the
    * scan already plans >= width input splits and this is a NO-OP —
    * no extra corpus shuffle is ever paid where parallelism exists. */
  private[graft] def atWidth(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= width) df else df.repartition(width, key)
  }

  def minhashSignatureText(df: DataFrame, idCol: Column, textCol: Column,
                           n: Int, k: Int): DataFrame = {
    // one native pass per document (graft.functions.MinhashSigs): no
    // rows materialize, no aggregate hash map — the MD5 per shingle
    // is all that remains. Values are pinned bit-identical to the
    // explode path below (MinhashSigsSpec), so oracles are unchanged.
    // Null-text docs are DROPPED (intentional: a null document has no
    // shingles, and a null-signature row would poison every min-band
    // bucket). NB the pre-filter explode formulation did NOT drop
    // them — greatest() skips nulls, so it emitted one row with null
    // signature columns; the reference impls below carry the same
    // isNotNull filter so the parity property is exact.
    val sigs = atWidth(df.select(idCol.as("doc_id"), textCol.as("__t"))
        .where(col("__t").isNotNull), col("doc_id"))
      .select(col("doc_id"),
        graft.functions.MinhashSigs(col("__t"), n, k, withSet = false).as("__mh"))
    // ONE hash exchange of fixed-width rows (the same shape the old
    // groupBy shuffled): without it the map-only frame has no exchange
    // for ReuseExchange to share, so every self-join side RECOMPUTES
    // the full MD5 pass (measured 4 copies in llm05's plan), and the
    // whole chain inherits the scan's file parallelism (one row group
    // at small SF = one task). Post-exchange the signatures compute
    // once and fan out at spark.sql.shuffle.partitions width.
    sigs.repartition(col("doc_id"))
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("__mh"), i + 1).as(s"mh$i")): _*)
  }

  /** The pre-native explode formulation — kept as the REFERENCE
    * implementation the property suite pins [[minhashSignatureText]]
    * against (bit-identical signatures), and as documentation of the
    * value contract. Not on any hot path. */
  private[graft] def minhashSignatureTextExploded(df: DataFrame, idCol: Column,
                                                textCol: Column,
                                                n: Int, k: Int): DataFrame = {
    // isNotNull matches the native path's null-text drop (without it
    // greatest() skips the null length and this emits one row of null
    // signature columns — not a drop)
    val exploded = df.select(idCol.as("doc_id"), textCol.as("__t"))
      .where(col("__t").isNotNull)
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("__i"))
      .select(col("doc_id"),
        Portable.baseHash31(col("__t").substr(col("__i"), lit(n))).as("__h"))
    minAggs(exploded, k)
  }

  /** MinHash signatures AND the hashed shingle SET in one pass over
    * character positions — the verify-pipeline variant (LSH candidates
    * THEN exact jaccard, e.g. llm09): where [[minhashSignatureText]]
    * serves pure pair generation and [[minhashSignature]] serves
    * callers that already built shingle arrays, this serves callers
    * that need both signatures and an exact-verify set WITHOUT ever
    * building a string array: one codegen'd position explode projects
    * the n-gram substring once and hashes it twice (the portable
    * signature hash + the 8-byte verify hash), and ONE groupBy carries
    * k min()s and the collect_set together — one shuffle where the
    * array path took an array build + array_distinct + transform + a
    * separate signature shuffle. The persisted output is fixed-width
    * longs per doc (signature) + one long per DISTINCT shingle (set) —
    * strings never shuffle and never persist. Signatures are
    * value-identical to the other two paths; jaccard over the hashed
    * sets equals shingle-set jaccard (xxhash64 collisions aside —
    * negligible at 2^-64 per pair, the same trade every hashed-verify
    * stage in the pipeline makes). */
  def minhashSignatureAndSets(df: DataFrame, idCol: Column, textCol: Column,
                              n: Int, k: Int): DataFrame = {
    // same native one-pass expression as [[minhashSignatureText]],
    // with the distinct xxhash64 shingle set collected in the same
    // loop — the whole (signatures + verify set) frame is now a
    // MAP-ONLY projection: the old form shuffled k mins + a
    // collect_set buffer per doc through a hash aggregate
    val both = atWidth(df.select(idCol.as("doc_id"), textCol.as("__t"))
        .where(col("__t").isNotNull), col("doc_id"))
      .select(col("doc_id"),
        graft.functions.MinhashSigs(col("__t"), n, k, withSet = true).as("__b"))
    // same reuse-exchange barrier as minhashSignatureText (see there)
    both.repartition(col("doc_id"))
      .select(col("doc_id") +:
        ((0 until k).map(i =>
          element_at(col("__b").getField("mh"), i + 1).as(s"mh$i")) :+
          col("__b").getField("shh").as("shh")): _*)
  }

  /** Pre-native explode formulation of [[minhashSignatureAndSets]] —
    * the reference implementation for the parity property test; the
    * hashed sets compare as SETS (collect_set order was never
    * meaningful; the native form sorts). */
  private[graft] def minhashSignatureAndSetsExploded(df: DataFrame, idCol: Column,
                                                   textCol: Column,
                                                   n: Int, k: Int): DataFrame = {
    val exploded = df.select(idCol.as("doc_id"), textCol.as("__t"))
      .where(col("__t").isNotNull) // match the native null-text drop (see minhashSignatureText)
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("__i"))
      .select(col("doc_id"), col("__t").substr(col("__i"), lit(n)).as("__s"))
      .select(col("doc_id"), Portable.baseHash31(col("__s")).as("__h"),
              xxhash64(col("__s")).as("__x"))
    val aggs = (0 until k).map { i =>
      val (a, b) = Portable.universalCoeffs(i)
      min((col("__h") * lit(a) + lit(b)) % lit(Portable.UniversalP)).as(s"mh$i")
    } :+ collect_set(col("__x")).as("shh")
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Hashed shingle SETS alone — for verify stages whose candidates
    * come from elsewhere (planted pairs, an external index): the same
    * position-explode as [[minhashSignatureAndSets]] minus the k
    * signature aggregates. One long per distinct shingle per doc;
    * strings never shuffle. */
  /** Column-level hashed shingle SET of one text expression — the
    * per-row primitive behind [[hashedShingleSets]], exposed so a
    * caller comparing two texts derived from the SAME row (a doc and
    * its padded/suffixed variant) can build both sets in one scan
    * instead of joining two corpus passes on the row id (round-22
    * llm82: the join shuffled 8×-text-width shingle arrays both ways
    * to pair rows that were born paired). Null text ⇒ null set —
    * matching [[hashedShingleSets]]'s null-text drop when the caller
    * filters on non-null. */
  def hashedShingleSet(textCol: Column, n: Int): Column =
    graft.functions.MinhashSigs(textCol, n, 1, withSet = true).getField("shh")

  def hashedShingleSets(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int): DataFrame =
    // native one-pass set collection (k=1 signature rides along for
    // free) — map-only, no explode, no aggregate
    atWidth(df.select(idCol.as("doc_id"), textCol.as("__t"))
        .where(col("__t").isNotNull), col("doc_id"))
      .select(col("doc_id"), hashedShingleSet(col("__t"), n).as("shh"))
      .repartition(col("doc_id"))

  /** BOILERPLATE shingle mining: the n-gram strings that appear in at
    * least `minDf` distinct documents — navigation chrome, cookie
    * banners, license footers — recovered AS STRINGS for a strip
    * list. Two passes keep it scale-honest: document frequencies
    * count on 8-byte hashes (strings never shuffle), then ONLY the
    * heavy hitters — by definition a tiny set — join back against one
    * document scan to recover their text. The recovery join is a
    * broadcast semi of the hot-hash set, so the second pass adds no
    * shuffle of corpus strings either. Output: (shingle, df),
    * one row per distinct boilerplate n-gram. */
  def boilerplateShingles(df: DataFrame, idCol: Column, textCol: Column,
                          n: Int, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // pass 1 — df counts: per-doc DISTINCT hashes come from the
    // native in-row set pass (MinhashSigs withSet), so no
    // (doc, hash) distinct exchange precedes the count aggregate
    val hot = atWidth(df.select(idCol.as("doc_id"), textCol.as("__t"))
        .where(col("__t").isNotNull), col("doc_id"))
      .select(explode(
        graft.functions.MinhashSigs(col("__t"), n, 1, withSet = true)
          .getField("shh")).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    // pass 2 — string recovery for the tiny heavy-hitter set only.
    // Round-21: ONE JVM scan per doc against the broadcast hot-hash
    // map emits ONLY the matching grams (with their df) — the old
    // shape materialized EVERY position's substring, hashed it again,
    // and joined; >99.9% of those strings were allocated to be
    // dropped. The hot set is minDf-bounded and tiny by definition;
    // collecting it for the broadcast map is the same driver-sized
    // hop the broadcast join already paid. Hashes are XXH64 over the
    // same utf8 byte slices (code-point boundaries — Spark substr
    // semantics), so the match set is bit-identical.
    val hotMap = scala.collection.immutable.LongMap(
      hot.collect().map(r => r.getLong(0) -> r.getLong(1)): _*)
    val hotB = df.sparkSession.sparkContext.broadcast(hotMap)
    val matchesUdf = udf { (s: String) =>
      if (s == null) Array.empty[(String, Long)]
      else boilerplateMatchesJvm(s, n, hotB.value)
    }
    atWidth(df.select(idCol.as("doc_id"), textCol.as("__t"))
        .where(col("__t").isNotNull), col("doc_id"))
      .select(explode(matchesUdf(col("__t"))).as("__m"))
      .select(col("__m._1").as("shingle"), col("__m._2").as("__df"))
      .groupBy(col("shingle"))
      .agg(max(col("__df")).as("df"))
  }

  /** JVM scan behind [[boilerplateShingles]]' recovery pass: hash each
    * n-gram byte slice (XXH64, Spark's string seed) and emit only the
    * grams present in the hot map, with their document frequency. */
  private[llm] def boilerplateMatchesJvm(s: String, n: Int,
      hot: scala.collection.immutable.LongMap[Long]): Array[(String, Long)] = {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val starts = new Array[Int](bytes.length + 1)
    var cp = 0
    var b = 0
    while (b < bytes.length) {
      starts(cp) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      cp += 1
    }
    starts(cp) = bytes.length
    val m = math.max(cp - (n - 1), 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      val len = starts(math.min(i + n, cp)) - s0
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s0, len, 42L)
      val df = hot.getOrElse(h, Long.MinValue)
      if (df != Long.MinValue)
        out += ((new String(bytes, s0, len, java.nio.charset.StandardCharsets.UTF_8), df))
      i += 1
    }
    out.toArray
  }

  /** Shared signature aggregation: k universal-hash min()s over the
    * base-hash column — map-side partial agg keeps the shuffle at k
    * longs per doc. */
  private def minAggs(exploded: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map { i =>
      val (a, b) = Portable.universalCoeffs(i)
      min((col("__h") * lit(a) + lit(b)) % lit(Portable.UniversalP)).as(s"mh$i")
    }
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the k-wide signature into bands of `rowsPerBand`
    * and emit one (band, bucket-hash) per doc. Docs sharing any bucket
    * are near-dup candidates. */
  def lshBuckets(signatures: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val bands = (0 until k / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"),
             Portable.hash64(concat_ws("_", cols: _*)).as("bucket"))
    }
    signatures.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs from LSH buckets: self-join within (band, bucket),
    * id< to avoid dupes/self, distinct across bands. The join key is the
    * bucket, so at scale this is one shuffle and pairs stay local.
    *
    * `maxBucketSize` is the HOT-BUCKET CAP for corpus scale: a bucket
    * of size s contributes s·(s−1)/2 pairs, and real corpora hash
    * boilerplate (shared headers/footers, templates) into a few
    * mega-buckets that would dominate the join quadratically. Buckets
    * over the cap are dropped whole — standard LSH practice; a
    * genuinely near-dup pair still surfaces through its other, less
    * crowded bands. The cap costs one extra aggregation on the SAME
    * (band, bucket) key — co-partitioned with the join, no new
    * shuffle boundary. Default off (exhaustive, the oracle-checked
    * configuration). */
  def candidatePairs(buckets: DataFrame, maxBucketSize: Option[Int] = None): DataFrame = {
    val pruned = maxBucketSize match {
      case None => buckets
      case Some(cap) =>
        val ok = buckets.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= cap)
          .select(col("band"), col("bucket"))
        buckets.join(ok, Seq("band", "bucket"), "left_semi")
    }
    val a = pruned.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = pruned.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** INCREMENTAL near-dedup — the delta-ingestion form of the
    * MinHash/LSH pipeline, completing the family ([[incrementalExact]]
    * for exact replays, [[incrementalExactBloom]] for its steady
    * state): a new batch screens against the SEEN corpus's banded
    * bucket index, candidates Jaccard-verify against the hashed
    * shingle sets, and each flagged batch doc reports its best match
    * (highest jaccard, ties to the higher seen id — deterministic).
    * Returns (doc_id, matched_id, jaccard) for batch docs with a
    * match ≥ threshold; unmatched batch docs are the survivors the
    * caller keeps.
    *
    * Scale shape: in production the seen side's signatures+buckets
    * are the PERSISTED index (append each accepted batch and the loop
    * closes — the corpus is never re-signed); here they are computed
    * from `seen` directly. The screen is one equi join on (band,
    * bucket) — batch docs only ever meet the buckets they land in —
    * and the verify join moves hashed sets for candidates only,
    * never n². `maxBucketSize` is the same hot-bucket cap as
    * [[candidatePairs]]. */
  def incrementalNearDup(batch: DataFrame, batchId: Column, batchText: Column,
                         seen: DataFrame, seenId: Column, seenText: Column,
                         n: Int, k: Int, rowsPerBand: Int, threshold: Double,
                         maxBucketSize: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bDocs = minhashSignatureAndSets(batch, batchId, batchText, n, k)
    val sDocs = minhashSignatureAndSets(seen, seenId, seenText, n, k)
    def pruned(buckets: DataFrame): DataFrame = maxBucketSize match {
      case None => buckets
      case Some(cap) =>
        val ok = buckets.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= cap)
          .select(col("band"), col("bucket"))
        buckets.join(ok, Seq("band", "bucket"), "left_semi")
    }
    val bB = pruned(lshBuckets(bDocs, k, rowsPerBand))
      .select(col("band"), col("bucket"), col("doc_id"))
    val sB = pruned(lshBuckets(sDocs, k, rowsPerBand))
      .select(col("band"), col("bucket"), col("doc_id").as("matched_id"))
    val cands = bB.join(sB, Seq("band", "bucket"))
      .select(col("doc_id"), col("matched_id")).distinct()
    val verified = cands
      .join(bDocs.select(col("doc_id"), col("shh").as("sh_b")), "doc_id")
      .join(sDocs.select(col("doc_id").as("matched_id"), col("shh").as("sh_s")), "matched_id")
      .withColumn("jaccard", jaccard(col("sh_b"), col("sh_s")))
      .filter(col("jaccard") >= threshold)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("matched_id").desc)
    verified.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("doc_id"), col("matched_id"), col("jaccard"))
  }

  /** Non-overlapping fixed-size token passages (space-joined) — the
    * sub-document dedup unit (Dolma-style paragraph dedup generalized
    * to fixed chunks for corpora without paragraph breaks). Only full
    * chunks are emitted: a trailing partial chunk is dropped, and a
    * document shorter than `size` tokens yields no passages —
    * deterministic and engine-portable. Bind the token array to a real
    * column first (one tokenizer run per row); the slice inside the
    * lambda then reads an attribute, not a recomputed expression. */
  def passages(toks: Column, n: Int): Column = {
    require(n >= 1, "passage size must be >= 1")
    // round-20: one scalar call per document — the transform lambda
    // (slice + concat_ws per chunk) evaluated interpreted. Equality
    // with the composed form is pinned in LlmSpec.
    val f = udf((ts: scala.collection.Seq[String]) =>
      if (ts == null) null else passagesJvm(ts, n))
    f(toks)
  }

  /** The pre-round-20 column-algebra form of [[passages]] — the
    * contract the equality pin replays. */
  private[llm] def passagesComposed(toks: Column, n: Int): Column = {
    require(n >= 1, "passage size must be >= 1")
    val cnt = (size(toks) / n).cast("int")
    // sequence(1, 0) yields a DESCENDING [1, 0], not empty — guard the
    // under-one-chunk case explicitly
    when(cnt >= 1,
      transform(sequence(lit(1), cnt),
        i => concat_ws(" ", slice(toks, (i - lit(1)) * n + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private[llm] def passagesJvm(ts: scala.collection.Seq[String], n: Int): Array[String] = {
    val cnt = ts.length / n
    val out = new Array[String](cnt)
    val idx = ts.toIndexedSeq
    var i = 0
    while (i < cnt) {
      val sb = new java.lang.StringBuilder()
      var j = i * n
      val e = j + n
      while (j < e) {
        if (j > i * n) sb.append(' ')
        sb.append(idx(j)) // tokens() never emits null/empty tokens
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Per-document passage-duplication stats over a corpus: how much of
    * each document consists of passages that also appear in OTHER
    * documents. The passage travels as an 8-byte content hash after
    * the explode, so the shuffle is fixed-width regardless of passage
    * length; document frequency is one count-distinct per hash —
    * linear, the standard sub-document dedup scan. Repeats WITHIN one
    * document don't count as duplication (df is distinct docs).
    * Returns one row per input document: n_passages, n_dup_passages,
    * dup_passage_frac (0.0 for documents too short for any passage).
    */
  def passageDupStats(df: DataFrame, idCol: Column, textCol: Column,
                      size: Int): DataFrame = {
    val docs = df.select(idCol.as("doc_id"), tokens(textCol).as("__toks"))
      .select(col("doc_id"), explode_outer(passages(col("__toks"), size)).as("passage"))
      .select(col("doc_id"), Portable.hash64(col("passage")).as("__h"))
    val dfreq = docs.filter(col("__h").isNotNull)
      .groupBy(col("__h")).agg(count_distinct(col("doc_id")).as("__nd"))
    docs.join(dfreq, Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("__h")).as("n_passages"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("n_dup_passages"))
      .withColumn("dup_passage_frac",
        when(col("n_passages") === 0, lit(0.0))
          .otherwise(col("n_dup_passages").cast("double") / col("n_passages").cast("double")))
  }

  /** Sliding-span dedup as a TRANSFORMATION — the Lee et al. 2022
    * exact-substring REMOVAL at token-span granularity, completing
    * what [[spanDupStats]] measures and catching the offset-shifted
    * duplication [[scrubDuplicatePassages]]' aligned chunks
    * structurally miss: in every non-keeper document, each token
    * covered by ANY length-`n` span that also occurs in another
    * document is removed, and the survivors are rejoined in order.
    * Keep-first: the lowest-id document containing a span never
    * scrubs it.
    *
    * Scale shape: ONE position explode per document (the span hash is
    * computed in the projection — no span-string array exists), span
    * frequency/keeper stats and the join back ride 8-byte hashes,
    * coverage is a rows-frame max over ONE doc-hash window (a token
    * is covered iff a duplicated span STARTS within the previous n−1
    * positions), and the rebuild regroups per document. Token strings
    * move only in the window/regroup exchange that carries the
    * output.
    *
    * Returns (doc_id, n_tokens, n_removed, text_scrubbed); documents
    * shorter than `n` tokens pass through whitespace-normalized.
    */
  def scrubDuplicateSpans(df: DataFrame, idCol: Column, textCol: Column,
                          n: Int): DataFrame = {
    require(n >= 1, "span size must be >= 1")
    val base = df.select(idCol.as("doc_id"), tokens(textCol).as("__toks"))
    // one row per TOKEN position; a span hash only where a full span
    // starts (positions beyond len-n+1 carry a null hash)
    val rows = base
      .select(col("doc_id"), col("__toks"),
        // plain explode: the empty-array branch emits nothing, and the
        // final left join restores empty/null docs
        explode(when(size(col("__toks")) >= 1,
            sequence(lit(1), size(col("__toks"))))
          .otherwise(array().cast("array<int>"))).as("__p"))
      .select(col("doc_id"), col("__p"),
        element_at(col("__toks"), col("__p")).as("__tok"),
        when(col("__p") + (n - 1) <= size(col("__toks")),
          Portable.hash64(concat_ws(" ", slice(col("__toks"), col("__p"), lit(n)))))
          .as("__h"))
    val stats = rows.filter(col("__h").isNotNull)
      .groupBy(col("__h"))
      .agg(count_distinct(col("doc_id")).as("__nd"), min(col("doc_id")).as("__keeper"))
    val flagged = rows.join(stats, Seq("__h"), "left")
      .select(col("doc_id"), col("__p"), col("__tok"),
        when(col("__nd") >= 2 && col("doc_id") =!= col("__keeper"), 1L)
          .otherwise(0L).as("__ds"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__p"))
      .rowsBetween(-(n - 1), org.apache.spark.sql.expressions.Window.currentRow)
    val rebuilt = flagged
      .withColumn("__cov", max(col("__ds")).over(win))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__cov")).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__cov") === 0L,
            struct(col("__p"), col("__tok"))))),
          s => s.getField("__tok"))).as("text_scrubbed"))
    base.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** Passage-level dedup as a TRANSFORMATION — Dolma's paragraph
    * dedup completed: where [[passageDupStats]] only measures, this
    * REBUILDS each document with its corpus-duplicated passages
    * removed. Keep-first policy: a passage seen in ≥2 documents
    * survives only in the lowest-id one (within-document repeats are
    * not corpus duplication and always survive, matching the stats
    * operator). Documents too short for any full passage rebuild to
    * the empty string — chunking is lossy at the tail by contract.
    *
    * Scale shape: passages travel as 8-byte hashes into the
    * document-frequency/keeper aggregate and join back hash-keyed;
    * the only passage-STRING shuffle is the final per-document
    * regroup, which carries exactly the output text. Reassembly is
    * an array_sort(collect_list(struct(pos, passage))) — in-group
    * data only, no window.
    *
    * Returns (doc_id, n_kept, n_dropped, text_scrubbed).
    */
  def scrubDuplicatePassages(df: DataFrame, idCol: Column, textCol: Column,
                             size: Int): DataFrame = {
    require(size >= 1, "passage size must be >= 1")
    val base = df.select(idCol.as("doc_id"), tokens(textCol).as("__toks"))
      .select(col("doc_id"), passages(col("__toks"), size).as("__ps"))
    val inst = base
      .select(col("doc_id"), posexplode(col("__ps")).as(Seq("pos", "passage")))
      .select(col("doc_id"), col("pos"), col("passage"),
        Portable.hash64(col("passage")).as("__h"))
    val stats = inst.groupBy(col("__h"))
      .agg(count_distinct(col("doc_id")).as("__nd"), min(col("doc_id")).as("__keeper"))
    val kept = inst.join(stats, Seq("__h"))
      .withColumn("__keep", col("__nd") < 2 || col("doc_id") === col("__keeper"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("pos"), col("passage"))))),
          s => s.getField("passage"))).as("text_scrubbed"))
    base.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** Per-document SLIDING-span duplication stats — the exact-substring
    * dedup signal of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better") approximated at token-span
    * granularity: every length-`n` token window (positions 1..len-n+1,
    * overlapping) is hashed, and a window position counts as
    * duplicated when its span also occurs in ≥1 OTHER document.
    * Complements [[passageDupStats]]: non-overlapping chunks miss
    * offset-shifted duplication entirely (a document that embeds
    * another document's tail at an arbitrary offset shares almost no
    * aligned chunk, but shares nearly every sliding span) — this is
    * the operator that catches quote/suffix/boilerplate containment.
    *
    * Scale shape: one codegen'd position explode per document (no span
    * string array is ever built — the slice+concat+digest run inside
    * the projection), spans travel as 8-byte hashes, document
    * frequency is one count-distinct per hash, and the join back is
    * hash-keyed — linear in total token count, the same shape as the
    * reference-free passage scan. The explode emits ~len(toks) rows
    * per doc (vs len/n for passages); that factor-of-n is the price of
    * offset invariance and is the published algorithm's cost too. */
  def spanDupStats(df: DataFrame, idCol: Column, textCol: Column,
                   n: Int): DataFrame = {
    require(n >= 1, "span size must be >= 1")
    val docs = df.select(idCol.as("doc_id"), tokens(textCol).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        // sequence(1, 0) yields DESCENDING [1, 0], not empty — guard
        // the too-short case explicitly (same trap as passages())
        explode_outer(when(size(col("__toks")) >= n,
            sequence(lit(1), size(col("__toks")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("__i"))
      .select(col("doc_id"),
        when(col("__i").isNotNull,
          Portable.hash64(concat_ws(" ", slice(col("__toks"), col("__i"), lit(n)))))
          .as("__h"))
    val dfreq = docs.filter(col("__h").isNotNull)
      .groupBy(col("__h")).agg(count_distinct(col("doc_id")).as("__nd"))
    docs.join(dfreq, Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("__h")).as("n_spans"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_span_frac",
        when(col("n_spans") === 0, lit(0.0))
          .otherwise(col("n_dup_spans").cast("double") / col("n_spans").cast("double")))
  }

  /** n-gram Jaccard similarity between two shingle-set columns: a
    * single deterministic double division over exact set sizes.
    * INPUT CONTRACT (round-20 advice, made explicit): the native
    * expression requires `array<bigint>` inputs — the hashed-set
    * representation every pipeline stage in this module produces —
    * and fails loudly at analysis for anything else; a caller with
    * string-shingle arrays hashes them first (or uses
    * [[jaccardComposed]], which accepts any element type). */
  def jaccard(a: Column, b: Column): Column =
    // round-20: native one-pass expression over primitive longs —
    // the composed intersect/union form built four boxed hash tables
    // and two intermediate arrays per PAIR (the verify-stage floor of
    // llm09/llm87/llm148). Value contract pinned in LongJaccardSpec.
    graft.functions.LongJaccard(a, b)

  /** The pre-round-20 composed form of [[jaccard]] — the contract the
    * equality pin replays (works for any element type). */
  private[llm] def jaccardComposed(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** ASYMMETRIC set containment |A∩B| / |A| — the metric Jaccard
    * structurally cannot express: a short document fully embedded in
    * a long one (quote farms, scraped aggregators, doc-in-doc
    * boilerplate) has containment ≈ 1 while its Jaccard stays below
    * any dedup threshold because the union is dominated by the
    * container. Same hashed-shingle-set inputs as [[jaccard]]; use
    * both on candidate pairs and gate on either. */
  def containment(a: Column, b: Column): Column =
    // round-20: native one-pass sibling of LongJaccard (pinned in
    // LongJaccardSpec); the composed form below is the contract
    graft.functions.LongContainment(a, b)

  /** The pre-round-20 composed form of [[containment]]. */
  private[llm] def containmentComposed(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(a).cast("double")

  /** Edit-distance verification of candidate pairs — the
    * character-level sibling of the Jaccard verify: where shingle-set
    * Jaccard measures BAG overlap (insensitive to ordering and local
    * edits), Levenshtein counts the actual minimal edit script, the
    * right final gate when near-dups must be byte-provably close
    * (template detection, OCR-noise dedup). `pairs` is (id_a, id_b)
    * from any banded candidate source ([[candidatePairs]] — never n²);
    * each side's text is capped to its first `capChars` characters so
    * the O(len²) DP cell count is a CONSTANT per pair regardless of
    * document size (the standard truncated-verify trade; cap ≥ the
    * shingle width times the band count keeps the gate meaningful).
    * Spark's codegen'd `levenshtein(l, r, threshold)` abandons a pair
    * early once its distance provably exceeds `maxDist` (returns -1) —
    * at scale that prunes the quadratic DP to the banded diagonal.
    * Returns (id_a, id_b, edit_dist) for pairs within `maxDist`.
    *
    * 100 TB shape: two hash joins move only capped prefixes to the
    * candidate rows; the DP runs inside one codegen'd projection; no
    * shuffle is keyed on text. */
  def levenshteinVerify(pairs: DataFrame, docs: DataFrame, idCol: Column,
                        textCol: Column, capChars: Int, maxDist: Int): DataFrame = {
    require(capChars >= 1 && maxDist >= 0, "capChars >= 1, maxDist >= 0")
    val t = docs.select(idCol.as("__id"), substring(textCol, 1, capChars).as("__t"))
    pairs
      .join(t.select(col("__id").as("id_a"), col("__t").as("__ta")), "id_a")
      .join(t.select(col("__id").as("id_b"), col("__t").as("__tb")), "id_b")
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("edit_dist") >= 0) // -1 = early-abandoned above maxDist
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /** Hamming-banded near-dup pairs over any 64-bit perceptual hash
    * (image dHash, SimHash): split the hash into `bands` equal bit
    * slices and bucket-join on (band, slice) — two hashes within
    * Hamming distance d < bands MUST agree on at least one whole band
    * (pigeonhole: d flips cannot touch all `bands` slices), so for
    * `maxHamming < bands` the banding is EXACT, not approximate;
    * beyond that it degrades gracefully (a pair surfaces unless every
    * band was hit). Candidates verify with one codegen'd
    * `bit_count(a ^ b)` — no DP, no string movement, never n².
    *
    * Input: (doc_id, `hashCol`) — e.g. [[graft.llm.Multimodal]]
    * `imageDHash` output; null hashes (undecodable media) drop out.
    * Returns (id_a, id_b, hamming) for pairs within `maxHamming`.
    *
    * 100 TB shape: one explode to `bands` fixed-width keys per doc,
    * one equi join on (band, bucket) — buckets are 64/bands-bit
    * values, so collision load is corpus²/2^(64/bands) per band,
    * verified away by the popcount filter. */
  def dhashNearDupPairs(hashed: DataFrame, hashCol: Column, maxHamming: Int,
                        bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, "bands must divide 64")
    require(maxHamming >= 0 && maxHamming <= 64, "maxHamming in [0, 64]")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = hashed.filter(hashCol.isNotNull)
      .select(col("doc_id"), hashCol.as("__h"),
        explode(array((0 until bands).map { i =>
          struct(lit(i).as("band"),
            shiftright(hashCol, i * width).bitwiseAND(lit(mask)).as("bucket"))
        }: _*)).as("__bb"))
      .select(col("doc_id"), col("__h"),
        col("__bb.band").as("band"), col("__bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("__h").as("__ha"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("__h").as("__hb"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** LONGEST SHARED RUN — the exact-substring contamination LENGTH
    * metric: for every (sample, train doc) pair sharing positional
    * n-gram hashes, the longest run of CONSECUTIVE shared n-grams
    * along one alignment diagonal — i.e. longest common substring
    * length − n + 1. Where the memorization fraction (llm92 /
    * [[spanDupStats]]) says HOW MUCH of a sample is known, the run
    * length says whether it is one long verbatim quote or scattered
    * common phrases — the severity split a leak triage needs (Lee et
    * al. 2022's verbatim-span signal, per candidate pair). Islands
    * trick: match positions group on (pair, diagonal = pe − pt) and
    * rank by sample position; pe − rank is constant exactly along a
    * consecutive run, so one hash aggregate yields every run length.
    * Work is linear in TRUE positional matches (one hash equi-join
    * of (id, pos, 8-byte hash) rows — strings never shuffle; no
    * pairwise alignment, no n² anywhere). Output: each sample's best
    * match at run ≥ `minRun` (longest run, ties to the smaller train
    * id): (sample_id, matched_id, longest_run, longest_chars). */
  def longestSharedRun(samples: DataFrame, sampleId: Column, sampleText: Column,
                       train: DataFrame, trainId: Column, trainText: Column,
                       n: Int, minRun: Int): DataFrame = {
    def posHashes(df: DataFrame, id: Column, text: Column, out: String, pos: String) =
      df.select(id.as(out), text.as("__t")).where(col("__t").isNotNull)
        .select(col(out),
          explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as(pos),
          col("__t"))
        .select(col(out), col(pos),
          Portable.hash64(col("__t").substr(col(pos), lit(n))).as("h"))
    longestSharedRunFromHashes(
      posHashes(samples, sampleId, sampleText, "sample_id", "pe"),
      posHashes(train, trainId, trainText, "matched_id", "pt"),
      n, minRun)
  }

  /** [[longestSharedRun]] over PRE-HASHED sides — the entry point for
    * consumers holding a materialized gram index ([[GramIndex]]):
    * `sampleHashes` = (sample_id, pe, h), `trainHashes` =
    * (matched_id, pt, h), both 1-based positional n-gram hash64 rows. */
  def longestSharedRunFromHashes(sampleHashes: DataFrame, trainHashes: DataFrame,
                                 n: Int, minRun: Int): DataFrame = {
    val e = sampleHashes
    val t = trainHashes
    val m = e.join(t, "h")
      .select(col("sample_id"), col("matched_id"),
        (col("pe") - col("pt")).as("diag"), col("pe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sample_id"), col("matched_id"), col("diag"))
      .orderBy(col("pe"))
    m.withColumn("rk", row_number().over(w))
      .groupBy(col("sample_id"), col("matched_id"), col("diag"),
        (col("pe") - col("rk")).as("isl"))
      .agg(count(lit(1)).as("run"))
      .filter(col("run") >= minRun)
      .groupBy(col("sample_id"))
      .agg(max(struct(col("run").as("r"), (-col("matched_id")).as("nm"))).as("b"))
      .select(col("sample_id"), (-col("b.nm")).as("matched_id"),
        col("b.r").as("longest_run"),
        (col("b.r") + (n - 1)).as("longest_chars"))
  }

  /** CORPUS-WIDE EXACT-SUBSTRING SPAN REMOVAL — the production
    * counterpart of [[longestSharedRun]]'s audit (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": the
    * ExactSubstr treatment removes every duplicated span over the
    * length threshold corpus-wide, where document-grain dedup keeps
    * near-identical boilerplate that differs by one byte): every
    * maximal run of positions whose `n`-gram occurs in MORE THAN ONE
    * document is a shared span; spans covering ≥ `minSpan` chars are
    * CUT from every document carrying them, and the operator emits
    * each doc's cut ranges plus the scrubbed text (composing with
    * llm61/63's passage scrubs, which cut at sentence grain).
    * Removing EVERY occurrence is the deterministic corpus-grain
    * choice (an exact-duplicate pair loses its whole shared body from
    * both copies — run exact dedup first, as Lee et al. do; a
    * keep-one-canonical variant is a composition with a min-doc-id
    * pick over the same span frame).
    *
    * Scale shape: strings NEVER shuffle — the positional pass emits
    * (id, pos, 8-byte hash) rows straight off the scan (same as
    * [[longestSharedRun]]); "shared" is one hash aggregate
    * (min(doc) ≠ max(doc) — two longs per gram, no distinct-count);
    * islands are one window per doc over integer positions; the
    * merged cut ranges (linear in TRUE duplicated spans) broadcast
    * back against the corpus scan, and the scrub itself is one
    * higher-order-function projection per doc — the text is read
    * where it already sits. Output: (doc_id, n_cuts, cut_chars,
    * cut_ranges "s:len,…", scrubbed_text), one row per input doc. */
  def duplicateSpanScrub(docs: DataFrame, idCol: Column, textCol: Column,
                         n: Int, minSpan: Int,
                         tracker: Option[Materialize.Tracker] = None,
                         posHashes: Option[DataFrame] = None): DataFrame = {
    require(minSpan >= n, s"minSpan ($minSpan) must be >= gram size ($n)")
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(idCol.as("doc_id"), textCol.as("__t"))
    // the positional pass feeds TWO consumers — the shared-gram
    // aggregate and the join-back — so materialize it once (the
    // contaminationFrom discipline; unmaterialized it explodes and
    // hashes the corpus twice: measured 11.1 → 4.4 s at sf0.1).
    // A caller holding a gram index ([[GramIndex]]) passes the
    // (doc_id, p, h) frame of the SAME docs instead and skips the
    // corpus re-hash entirely.
    val ph0 = posHashes.getOrElse(d.where(col("__t").isNotNull)
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("p"),
        col("__t"))
      .select(col("doc_id"), col("p"),
        graft.functions.Portable.hash64(col("__t").substr(col("p"), lit(n))).as("h")))
    val ph = Materialize.eager(ph0)
    tracker.foreach(_.track(ph))
    // grams in ≥2 DISTINCT docs: min≠max is the two-long test — no
    // distinct-count, map-side partials all the way
    val shared = ph.groupBy(col("h"))
      .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
      .filter(col("__mn") =!= col("__mx")).select(col("h"))
    val sp = ph.join(shared, Seq("h"), "left_semi")
    val wRn = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val runs = sp.withColumn("rn", row_number().over(wRn))
      .groupBy(col("doc_id"), (col("p") - col("rn")).as("__isl"))
      .agg(min(col("p")).as("s"), (count(lit(1)) + (n - 1)).as("__chars"))
      .filter(col("__chars") >= minSpan)
      .select(col("doc_id"), col("s"), (col("s") + col("__chars") - 1).as("e"))
    // overlapping spans merge (two islands ≥2 positions apart can
    // still overlap char-wise by up to n−2): classic running-max
    // interval merge, one window per doc
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy(col("doc_id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = runs
      .withColumn("__pmax", max(col("e")).over(wPrev))
      .withColumn("__gid", sum(when(col("__pmax").isNull ||
        col("s") > col("__pmax"), 1).otherwise(0)).over(wGrp))
      .groupBy(col("doc_id"), col("__gid"))
      .agg(min(col("s")).cast("long").as("s"), max(col("e")).cast("long").as("e"))
    val cuts = merged.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__cuts"))
    // the ranges frame is linear in true duplicated spans — broadcast
    // it back; the corpus text never moves
    d.join(broadcast(cuts), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__cuts").isNull, lit(0))
          .otherwise(size(col("__cuts"))).cast("long").as("n_cuts"),
        when(col("__cuts").isNull, lit(0L)).otherwise(
          aggregate(col("__cuts"), lit(0L),
            (acc, r) => acc + (r.getField("e") - r.getField("s") + 1L)))
          .as("cut_chars"),
        when(col("__cuts").isNull, lit("")).otherwise(
          concat_ws(",", transform(col("__cuts"), r =>
            concat(r.getField("s").cast("string"), lit(":"),
              (r.getField("e") - r.getField("s") + 1L).cast("string")))))
          .as("cut_ranges"),
        when(col("__cuts").isNull, col("__t")).otherwise(
          // one pass over the sorted, non-overlapping ranges: keep
          // [cursor, s), skip to e+1; finish with the tail after the
          // last cut
          concat(
            aggregate(col("__cuts"),
              struct(lit("").as("acc"), lit(1L).as("cur")),
              (st, r) => struct(
                concat(st.getField("acc"),
                  col("__t").substr(st.getField("cur").cast("int"),
                    (r.getField("s") - st.getField("cur")).cast("int"))).as("acc"),
                (r.getField("e") + 1L).as("cur")),
              st => st.getField("acc")),
            col("__t").substr(
              (element_at(col("__cuts"), -1).getField("e") + 1L).cast("int"),
              length(col("__t")))))
          .as("scrubbed_text"))
  }

  /** Near-dup pairs by DISCRETE-FINGERPRINT containment — the
    * sequence-level dedup shape for items represented as a SET of
    * exact fingerprints (video keyframe dHashes, audio segment
    * hashes, chunk content hashes): candidates are items sharing ANY
    * fingerprint (one equi-join on the fingerprint value — content
    * itself defines the buckets, never all-pairs), verified by set
    * containment |A ∩ B| / min(|A|, |B|) ≥ `minContainment` — the
    * min-denominator makes a TRIM of a longer item score 1.0 where
    * Jaccard would dilute with the untrimmed remainder. Input is one
    * row per (item, fingerprint); duplicates collapse first, so work
    * is O(distinct fingerprints) + the candidate join, whose hot keys
    * are genuinely-shared content (a fingerprint shared by s items
    * yields s·(s−1)/2 candidate rows — cap upstream if a corpus has
    * degenerate universal fingerprints, the candidatePairs
    * maxBucketSize rationale). Output: (id_a, id_b, shared, n_a,
    * n_b, containment). */
  def fingerprintContainmentPairs(df: DataFrame, idCol: Column, fpCol: Column,
                                  minContainment: Double): DataFrame = {
    // null fingerprints (undecodable media → the codec stubs emit
    // null) must not count toward n_a/n_b: distinct would keep one
    // null row per item but the equi-join never matches nulls, so a
    // null-carrying item's containment denominator would be inflated
    // and its score deflated (round-17 advice) — sizes and candidates
    // must see the same fingerprint set
    val fps = df.select(idCol.as("doc_id"), fpCol.as("__fp"))
      .where(col("__fp").isNotNull).distinct()
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = fps.select(col("doc_id").as("id_a"), col("__fp"))
    val b = fps.select(col("doc_id").as("id_b"), col("__fp"))
    a.join(b, Seq("__fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared"), col("n_a"), col("n_b"),
        col("containment"))
  }

  /** SimHash sketch: one bit per position j — the sign of the vote
    * sum over the document's distinct tokens of (bit j of hash(token)
    * ? +1 : -1). Near-identical docs differ in few bits. Computed as
    * explode + one groupBy with `bits` conditional sums (map-side
    * partial agg → the shuffle carries `bits` ints per doc). */
  def simhash(df: DataFrame, idCol: Column, textCol: Column, bits: Int = 32): DataFrame = {
    require(bits <= 60, "hash64 yields 60 usable bits")
    val toks = df.select(idCol.as("doc_id"), explode(array_distinct(tokens(textCol))).as("tok"))
      .withColumn("h", Portable.hash64(col("tok")))
    val votes = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x + y)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Hamming distance between two simhash sketches (bit_count of XOR)
    * — the verify step after LSH candidate generation. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Connected components over a near-dup pair graph — the step that
    * turns verified PAIRS into duplicate CLUSTERS with one
    * representative each (cluster id = min doc id in the component):
    * pairs (a,b),(b,c) must keep ONE of {a,b,c}, which pairwise
    * dedup alone cannot decide.
    *
    * Iterative min-label propagation: each superstep every vertex
    * takes the min of its own and its neighbors' labels (one join +
    * one groupBy-min per step, all on 8-byte ids); converges in
    * O(component diameter) supersteps — duplicate families are
    * shallow — with early exit at fixpoint. The same per-step plan is
    * the building block of large-star/small-star if extreme-diameter
    * graphs ever appear.
    *
    * `checkpointDir`: when set, supersteps use RELIABLE checkpoints
    * (`df.checkpoint` into that directory) — executor-local blocks
    * die with their executor mid-computation; a long-running 100 TB
    * clustering job should pay the HDFS write for restartability.
    * Default (None) uses fast in-memory materialization
    * ([[graft.operators.Materialize.eager]]).
    *
    * Block hygiene (round-9 fix): every superseded superstep frame is
    * RELEASED as soon as its successor is materialized, so the loop
    * holds at most edges + two label frames of executor storage at any
    * moment — O(1) frames, not O(supersteps). The FINAL label frame is
    * what the returned plan reads; pass a `tracker` and call
    * `tracker.releaseAll()` after consuming the result to free it too
    * (without a tracker it is freed when the JVM collects the handle,
    * the pre-round-10 behavior). The convergence probe rides the
    * materialization job itself (`eagerCountingFlag` counts changed
    * labels in the same pass that stores the blocks), so each local
    * superstep is ONE job — no per-iteration join+count.
    *
    * Throws if `maxIter` supersteps pass without reaching the
    * fixpoint: a silent early exit would return PARTIALLY propagated
    * labels — one component split into several cluster ids — which is
    * data corruption for a dedup pipeline. Components deeper than the
    * default 20 mean an unusually chained duplicate family: raise
    * maxIter (cost is per-superstep, not quadratic). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          checkpointDir: Option[String] = None,
                          tracker: Option[Materialize.Tracker] = None): DataFrame = {
    // Iterative frames use EAGER materialization, not lazy persist:
    // (a) the candidate pipeline materializes exactly once (the union
    //     below references it twice, and concurrently-scheduled union
    //     branches RACE an unfilled cache into double computation);
    // (b) every superstep starts from a constant-size LogicalRDD leaf —
    //     with lazy persist, unpersisting a parent mid-loop invalidates
    //     dependent caches and each later superstep recomputes a
    //     compounding lineage (measured: 1.5s → 5.4s per iteration).
    def save(df: DataFrame): DataFrame = Materialize.eagerOrCheckpoint(df, checkpointDir)
    val reliable = checkpointDir.isDefined
    val p0 = save(pairs)
    // the edge frame joins on `b` EVERY superstep — materialize it
    // pre-partitioned on that key so the published hash-partitioning
    // satisfies each round's join distribution and only the label side
    // exchanges per superstep (round-21, guide §2.4)
    val edges = save(p0.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(p0.select(col("id_b").as("a"), col("id_a").as("b")))
      .repartition(col("b")))
    Materialize.release(p0) // edges is materialized; nothing reads p0 again
    var labels = save(edges.select(col("a").as("v")).distinct()
      .withColumn("label", col("v")))
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val fromNbrs = edges.join(labels.withColumnRenamed("v", "b"), "b")
        .select(col("a").as("v"), col("label"))
      // Each vertex's own row rides the union tagged __own, so the
      // min-label aggregation ALSO yields the previous label — the
      // changed-flag comes out of the same shuffle, replacing the old
      // per-superstep join+count convergence pass.
      val stepped = labels.withColumn("__own", lit(true))
        .unionByName(fromNbrs.withColumn("__own", lit(false)))
        .groupBy("v")
        .agg(min("label").as("label"),
             min(when(col("__own"), col("label"))).as("__old"))
        .select(col("v"), col("label"),
                coalesce(col("label") =!= col("__old"), lit(true)).as("__changed"))
      val (next, changed) =
        if (reliable) {
          val n = save(stepped)
          // reliable path: the probe is a limit-1 scan of the durable
          // checkpoint — cheap, and the frame carries no executor blocks
          (n, !n.filter(col("__changed")).isEmpty)
        } else {
          val (n, c) = Materialize.eagerCountingFlag(stepped, "__changed")
          (n, c > 0L)
        }
      Materialize.release(labels) // superseded; `next` is materialized
      labels = next.drop("__changed") // cheap projection over the materialized leaf
      done = !changed
      iter += 1
    }
    Materialize.release(edges)
    if (!done) {
      // the error path must not strand the last label frame — the caller
      // never sees it, so nothing downstream could release it
      Materialize.release(labels)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter supersteps — a component has " +
        s"diameter > $maxIter and its labels are only partially propagated; raise maxIter")
    }
    tracker.foreach(_.track(labels))
    labels.select(col("v").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Quality-aware cluster representative selection: keep the
    * BEST-SCORING member of each duplicate cluster instead of
    * [[connectedComponents]]' min-id convention — the production
    * dedup policy (when near-identical documents differ, keep the
    * cleanest copy, not the lowest id). Deterministic: ties break on
    * the lower doc id.
    *
    * Scale shape: one join of the cluster labels with the score frame
    * on the 8-byte doc id, then a row_number window PARTITIONED BY
    * CLUSTER — safe at any corpus size because duplicate families are
    * small by construction (a window by a handful of rows per
    * partition key), unlike per-source windows which
    * [[Curation.keepTopQualityPerGroup]] exists to avoid. Returns one
    * row per cluster: (cluster_id, doc_id, score). */
  def bestPerCluster(clusters: DataFrame, scores: DataFrame,
                     scoreId: Column, scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    clusters.join(scores.select(scoreId.as("doc_id"), scoreCol.as("score")), "doc_id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cluster_id"), col("doc_id"), col("score"))
  }

  /** Cross-corpus contamination check — the eval-set DECONTAMINATION
    * step of a training pipeline: for each eval document, the best
    * rare-shingle overlap ratio against any training document
    * (1.0 = the eval doc's distinctive content is fully inside some
    * training doc).
    *
    * Scale design: shingles with training document-frequency > maxDf
    * are dropped BEFORE the join — common shingles carry no signal
    * and would fan the inverted-index join out to ~every document;
    * the rare-n-gram index keeps the join linear in genuine matches
    * (the standard decontamination practice). Shuffles are on shingle
    * values then (eval, train) id pairs; ties in best-match rank
    * break on the higher train id, deterministically. Eval docs with
    * zero rare shingles have no distinctive content to test and drop
    * out.
    *
    * `checkpointDir`: when set, the materialized train-shingle frame
    * uses a RELIABLE checkpoint instead of an executor-local one —
    * same trade as [[connectedComponents]]: local checkpoint blocks
    * die with their executor (no lineage left to recompute), so a
    * long 100 TB decontamination run should pay the durable write for
    * restartability. (The directory is a JVM-global SparkContext
    * setting; it is only applied when none is configured yet — see
    * [[graft.operators.Materialize.eagerOrCheckpoint]].) Default
    * (None) keeps fast in-memory materialization; the RESULT plan
    * reads the materialized frame, so pass a `tracker` and release it
    * after consumption to free the executor blocks. */
  def contamination(train: DataFrame, trainId: Column, trainShinglesCol: Column,
                    evalDf: DataFrame, evalId: Column, evalShinglesCol: Column,
                    maxDf: Int, checkpointDir: Option[String] = None,
                    tracker: Option[Materialize.Tracker] = None): DataFrame =
    contaminationFrom(
      train.select(trainId.as("train_id"), explode(trainShinglesCol).as("__s"))
        .select(col("train_id"), xxhash64(col("__s")).as("sh")),
      evalDf.select(evalId.as("eval_id"), explode(evalShinglesCol).as("__s"))
        .select(col("eval_id"), xxhash64(col("__s")).as("sh")),
      maxDf, checkpointDir, tracker)

  /** [[contamination]] straight from TEXT columns — the fast path when
    * the caller has no other use for the shingle arrays: character
    * positions explode and each n-gram substring hashes inside one
    * codegen'd projection (same trade as [[minhashSignatureText]]; the
    * per-doc distinct moves onto the 8-byte hashes, where it was
    * already going). Results are value-identical to building
    * `shingles(text, n)` first. */
  def contaminationText(train: DataFrame, trainId: Column, trainText: Column,
                        evalDf: DataFrame, evalId: Column, evalText: Column,
                        n: Int, maxDf: Int, checkpointDir: Option[String] = None,
                        tracker: Option[Materialize.Tracker] = None): DataFrame = {
    def posHashes(df: DataFrame, id: Column, text: Column, outId: String) =
      atWidth(df.select(id.as(outId), text.as("__t")), col(outId))
        .select(col(outId), col("__t"),
          explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("__i"))
        .select(col(outId), xxhash64(col("__t").substr(col("__i"), lit(n))).as("sh"))
    contaminationFrom(posHashes(train, trainId, trainText, "train_id"),
      posHashes(evalDf, evalId, evalText, "eval_id"), maxDf, checkpointDir, tracker)
  }

  /** [[contamination]] over PRE-HASHED shingle/gram arrays — each
    * element already the xxhash64 value the string path would have
    * computed (e.g. [[Tokenizer.tokenGramHashes]]). Value-identical to
    * hashing the string arrays here; the gram strings are never
    * materialized, exploded, or re-hashed (round-21, llm157's floor). */
  def contaminationHashed(train: DataFrame, trainId: Column, trainHashesCol: Column,
                          evalDf: DataFrame, evalId: Column, evalHashesCol: Column,
                          maxDf: Int, checkpointDir: Option[String] = None,
                          tracker: Option[Materialize.Tracker] = None): DataFrame =
    // NB deliberately NOT widened here (round-22): llm157's caller
    // already widens BEFORE its gram UDF (the right place — widening
    // below the UDF cannot parallelize it), and a redundant atWidth at
    // this seam A/B-measured +0.5 s of pure planning/exchange overhead.
    contaminationFrom(
      train.select(trainId.as("train_id"), explode(trainHashesCol).as("sh")),
      evalDf.select(evalId.as("eval_id"), explode(evalHashesCol).as("sh")),
      maxDf, checkpointDir, tracker)

  /** ROUGE-N RECALL of candidate documents against a reference/eval
    * set — the bag-WITH-COUNTS n-gram overlap the set-based tiers
    * cannot express: recall = Σ_g min(cnt_cand(g), cnt_ref(g)) /
    * Σ_g cnt_ref(g), so a reference bigram occurring 3 times needs 3
    * candidate occurrences for full credit (the standard
    * summarization/leak metric; [[contamination]]'s distinct-shingle
    * containment treats 1 and 3 alike). Pairs are IMPLICIT: the join
    * is the inverted index on the n-gram hash, so only (cand, ref)
    * pairs sharing at least one gram materialize — never |C|×|R|.
    * The recall is pure integer arithmetic
    * (`overlap·1e6 DIV ref_total` — no doubles anywhere), returned as
    * `rouge_q` in 1e-6 steps; `minRecallQ` gates output volume.
    *
    * 100 TB shape: gram streams shuffle as (id, 8-byte hash, count)
    * triples (strings die in the scan projection — the llm16/llm24
    * discipline); the ref side is an EVAL set, orders of magnitude
    * smaller than the corpus, so per-gram fan-out is bounded by the
    * ref side's gram frequency and `ref` totals broadcast. The same
    * accepted xxhash64-collision trade as every hashed verify. */
  def rougeRecall(cand: DataFrame, candId: Column, candText: Column,
                  ref: DataFrame, refId: Column, refText: Column,
                  n: Int, minRecallQ: Long = 0L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def gramCounts(df: DataFrame, id: Column, text: Column,
                   out: String, cnt: String): DataFrame =
      df.select(id.as(out), tokens(text).as("__toks"))
        .filter(size(col("__toks")) >= n)
        .select(col(out), col("__toks"),
          explode(sequence(lit(1), size(col("__toks")) - (n - 1))).as("__i"))
        .select(col(out),
          xxhash64(concat_ws(" ",
            (0 until n).map(j => element_at(col("__toks"), col("__i") + lit(j))): _*)).as("g"))
        .groupBy(col(out), col("g")).agg(count(lit(1)).as(cnt))
    val cg = gramCounts(cand, candId, candText, "cand_id", "__cc")
    val rg = gramCounts(ref, refId, refText, "ref_id", "__rc")
    val rt = rg.groupBy(col("ref_id")).agg(sum(col("__rc")).as("__rt"))
    cg.join(rg, "g")
      .groupBy(col("cand_id"), col("ref_id"))
      .agg(sum(least(col("__cc"), col("__rc"))).as("overlap"))
      .join(broadcast(rt), "ref_id")
      .withColumn("rouge_q", expr("overlap * 1000000 DIV __rt"))
      .filter(col("rouge_q") >= minRecallQ)
      .select(col("cand_id"), col("ref_id"), col("overlap"), col("rouge_q"))
  }

  /** Shared decontamination core over per-doc shingle-hash streams
    * (columns: train_id/sh and eval_id/sh, repeats allowed — the
    * distinct lands here, on fixed-width hashes). */
  private def contaminationFrom(trainSh: DataFrame, evalSh: DataFrame,
                                maxDf: Int, checkpointDir: Option[String],
                                tracker: Option[Materialize.Tracker]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The exploded-distinct train shingles feed TWO consumers — the
    // rare-shingle document frequencies and the posting list joined
    // against eval — so materialize them once (eager, same rationale
    // as connectedComponents: lazy persist lets concurrently-scheduled
    // branches race an unfilled cache into double explosion).
    // Shingles travel as 8-byte xxhash64 values from the explode on:
    // every downstream shuffle/join/distinct keys on a fixed-width
    // long instead of the shingle string (~3x narrower rows, integer
    // comparisons). The hash never crosses the engine boundary — the
    // outputs are overlap COUNTS, identical modulo a full-64-bit
    // collision merging two shingles (~n²/2^65, vanishing), the same
    // accepted trade as `exact` dedup's content hash.
    val tsh = Materialize.eagerOrCheckpoint(trainSh.distinct(), checkpointDir)
    tracker.foreach(_.track(tsh))
    val rare = tsh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val trare = tsh.join(rare, "sh")
    val erare = evalSh.distinct().join(rare, "sh")
    val ec = erare.groupBy(col("eval_id")).agg(count(lit(1)).as("n_eval"))
    val shared = erare.join(trare, "sh")
      .groupBy(col("eval_id"), col("train_id")).agg(count(lit(1)).as("n_shared"))
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("overlap").desc, col("train_id").desc)
    shared.join(ec, "eval_id")
      .withColumn("overlap", col("n_shared").cast("double") / col("n_eval").cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("eval_id"), col("train_id"), col("overlap"))
  }

  /** Cross-source overlap matrix: for every pair of sources, how many
    * distinct shingles they share and the containment
    * `n_shared / min(n_a, n_b)` — the corpus-level contamination /
    * provenance-leak diagnostic (a mirror-heavy source pair lights up
    * before any per-document dedup runs).
    *
    * Scale shape: an inverted index folded into a BITMASK, not a
    * self-join. Each source gets one bit (the source dimension is
    * tens of tags — the ≤64 assert below; the bounded driver hop that
    * reads them is the same k-sized hop as k-means' centroids).
    * Shingle hashes position-explode straight off the text (no array
    * build) into the operator's ONE corpus-sized shuffle:
    * groupBy(hash) + BIT_OR of the source bit — a declarative long
    * aggregate, so the whole stage stays in whole-stage codegen with
    * 16-byte rows and map-side partials (the collect_set formulation
    * this replaces fell out of codegen into ObjectHashAggregate and
    * its sort-based fallback; the original self-join paid a SECOND
    * corpus-sized shuffle and recomputed the explode three times —
    * the two rewrites together measured ~35% faster at sf0.1, and
    * the removed join/recompute terms grow with corpus size where
    * the remaining cost is one scan + one shuffle). The mask
    * histogram that remains
    * is at most min(distinct shingles, 2^sources) rows and in
    * practice a few hundred (most shingles live in one source);
    * per-source totals and pair counts are conditional sums over it
    * against plan-literal masks, with a bit_count(mask) ≥ 2 gate so
    * the sources²-way pair expansion only touches genuinely shared
    * masks. Text never shuffles at all — not even source tags. */
  def sourceOverlap(df: DataFrame, sourceCol: Column, textCol: Column,
                    n: Int = 9): DataFrame = {
    // bounded driver hop: the source dimension (tens of values, never
    // corpus-scaled); sorted so bit order = lexicographic pair order
    val srcs = df.select(sourceCol.cast("string").as("source")).distinct()
      .orderBy(col("source")).collect().map(_.getString(0)).toIndexedSeq
    require(srcs.size <= 64,
      s"sourceOverlap's bitmask holds <= 64 sources, got ${srcs.size}")
    if (srcs.size < 2) // no pairs exist; an empty literal array can't type
      return df.sparkSession.emptyDataFrame.select(
        lit("").as("source_a"), lit("").as("source_b"),
        lit(0L).as("n_shared"), lit(0.0).as("containment"))
    val maskOf = map(srcs.zipWithIndex.flatMap {
      case (s, i) => Seq(lit(s), lit(1L << i)) }: _*)
    // widened before the md5 pass (round-22, see atWidth) — keyed on
    // the text itself (no id column crosses this operator's seam; the
    // source would be ~tens of values and skew the width)
    val hashed = atWidth(df.select(element_at(maskOf, sourceCol.cast("string")).as("m"),
        textCol.as("__t")), col("__t"))
      .select(col("m"),
        explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("__i"),
        col("__t"))
      .select(col("m"), Portable.hash64(col("__t").substr(col("__i"), lit(n))).as("h"))
    val hist = hashed.groupBy(col("h")).agg(expr("bit_or(m)").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
    // per-source distinct-shingle totals: one (source, bit) literal per
    // row of the tiny histogram
    val srcLits = array(srcs.zipWithIndex.map { case (s, i) =>
      struct(lit(s).as("source"), lit(1L << i).as("sm")) }: _*)
    val counts = hist.select(col("mask"), col("cnt"), explode(srcLits).as("s"))
      .filter(col("mask").bitwiseAND(col("s.sm")) =!= 0L)
      .groupBy(col("s.source").as("source")).agg(sum(col("cnt")).as("n"))
    // shared counts per ordered pair: masks containing BOTH bits
    val pairLits = array((for {
      i <- srcs.indices; j <- i + 1 until srcs.size
    } yield struct(lit(srcs(i)).as("source_a"), lit(srcs(j)).as("source_b"),
                   lit((1L << i) | (1L << j)).as("pm"))): _*)
    val pairs = hist.filter(expr("bit_count(mask)") >= 2)
      .select(col("mask"), col("cnt"), explode(pairLits).as("p"))
      .filter(col("mask").bitwiseAND(col("p.pm")) === col("p.pm"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(sum(col("cnt")).as("n_shared"))
    pairs
      .join(broadcast(counts.select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(counts.select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
  }

  /** PRIORITY-BASED DEDUP RETENTION MATRIX — the attribution
    * diagnostic a multi-source dedup pass owes its operators: when
    * duplicate clusters resolve by source priority ("keep the copy
    * from the most trusted source"), WHICH sources lose documents TO
    * which. Per duplicate-key cluster the winner is the (priority,
    * doc id)-minimum; every other member becomes a (loser_source,
    * winner_source) drop row. A source losing heavily to one peer is
    * a mirror/scrape signature; losing to ITSELF is intra-source
    * duplication — different remediations, same matrix.
    *
    * Scale shape (100 TB): one hash aggregate per key carrying a
    * 3-field struct (the argmin rides `min(struct(prio, id, src))`
    * through map-side combine — one row per cluster on the exchange,
    * never the membership), one equi-join back on the 8-byte key,
    * one (source, source) aggregate. Priorities are a per-row Column
    * (broadcast-join a tiny map or compute from the source name).
    *
    * @return (loser_source, winner_source, n_dropped), losers only */
  def retentionMatrix(docs: DataFrame, idCol: Column, keyCol: Column,
                      sourceCol: Column, prioCol: Column): DataFrame = {
    val k = docs.select(idCol.as("__id"), keyCol.as("__key"),
      sourceCol.as("__src"), prioCol.as("__prio"))
    val winners = k.groupBy(col("__key"))
      .agg(min(struct(col("__prio"), col("__id"), col("__src"))).as("__w"))
      .select(col("__key"), col("__w.__id").as("__wid"),
        col("__w.__src").as("__wsrc"))
    k.join(winners, "__key")
      .where(col("__id") =!= col("__wid"))
      .groupBy(col("__src").as("loser_source"),
        col("__wsrc").as("winner_source"))
      .agg(count(lit(1)).as("n_dropped"))
  }
}
