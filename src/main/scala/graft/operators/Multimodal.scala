package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata
  * structs, plus a partition-wise "decode + feature extract" pass.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (byte histogram + checksum standing in
  * for pixel decode); everything Spark-side — schema shape, batch iteration
  * via mapPartitions, partitioning — is real and is what would carry a true
  * decoder at 100 TB (one narrow map stage, no shuffle).
  */
object Multimodal {

  /** Output schema of the fake feature extractor. */
  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("entropy_proxy", LongType, nullable = false)))

  /** Output schema of the frame sampler. The first frame surfaces as its
    * uppercase hex rendering (raw binary output round-trips differently
    * through the two engines' result paths; hex pins the exact bytes AND —
    * unlike md5, which DuckDB only defines over VARCHAR — stays computable
    * on the oracle side even when a 64-byte frame boundary splits a
    * multi-byte UTF-8 character, so non-ASCII corpora oracle-check too).
    */
  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("sampled_bytes", LongType, nullable = false),
    StructField("first_frame_hex", StringType, nullable = true)))

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------ metadata
    // Binary payload + metadata struct; oracle checks the byte accounting
    // (octet_length over the encoded payload) cross-engine.
    QueryDef("mm_binary_meta",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            struct(col("source").as("uri"), col("lang").as("modality_tag"),
              col("n_chars").as("declared_len")).as("meta"))
          .select(col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            col("meta.declared_len").as("declared_len"),
            (octet_length(col("payload")) === col("meta.declared_len"))
              .as("len_matches"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  n_chars AS declared_len,
             |  octet_length(encode(text)) = n_chars AS len_matches
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ features
    // STUB DECODER: a real deployment would decode image/audio bytes here
    // (e.g. JPEG -> pixels) inside the same mapPartitions; this container
    // has no codecs, so the "decode" is a deterministic byte computation
    // (position-weighted checksum + high-nibble histogram) with identical
    // plumbing (binary in, fixed-schema features out, executed
    // per-partition with zero shuffle). Because the fake decode is pure
    // byte math, the WHOLE operator is DuckDB-oracle-checked — the
    // plumbing's accounting is verified even though the codec is stubbed.
    QueryDef("mm_feature_stub",
      (s, d) => {
        val spark = s
        val binDf = Tables.documents(spark, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val rdd = binDf.queryExecution.toRdd.mapPartitions { iter =>
          iter.map { ir =>
            val docId = ir.getLong(0)
            val bytes = ir.getBinary(1)
            // --- fake decode begins (stands in for codec work) ---
            var checksum = 0L // position-weighted byte sum
            val hist = new Array[Long](16)
            var i = 0
            while (i < bytes.length) {
              checksum += (i % 31 + 1).toLong * (bytes(i) & 0xffL)
              hist((bytes(i) & 0xf0) >> 4) += 1
              i += 1
            }
            var nonZero = 0L
            var j = 0
            while (j < 16) { if (hist(j) > 0) nonZero += 1; j += 1 }
            // --- fake decode ends ---
            Row(docId, bytes.length.toLong, checksum, nonZero)
          }
        }
        spark.createDataFrame(rdd, featureSchema).orderBy(col("doc_id"))
      },
      // the oracle iterates BYTES via hex(encode(text)) — two hex chars per
      // byte — exactly like the Spark side iterates the UTF-8 payload;
      // character functions (ord/len/text[i]) would silently diverge on any
      // non-ASCII document (they see codepoints, Spark sees bytes)
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
             |  octet_length(encode(text)) AS nb FROM documents)
             |SELECT doc_id,
             |  CAST(nb AS BIGINT) AS n_bytes,
             |  CAST(COALESCE(list_sum(list_transform(range(1, nb+1),
             |    i -> CAST('0x' || substr(hx, 2*i-1, 2) AS BIGINT)
             |      * ((i-1) % 31 + 1))), 0) AS BIGINT) AS checksum,
             |  CAST(len(list_distinct(list_transform(range(1, nb+1),
             |    i -> CAST('0x' || substr(hx, 2*i-1, 2) AS BIGINT) // 16)))
             |    AS BIGINT) AS entropy_proxy
             |FROM b ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ frames
    // STUB FRAME SAMPLER: stands in for video frame-sampling — the payload
    // is chunked into fixed-size "frames" (64 B here; real frames come
    // from the container format) and every 4th frame is kept. The Spark
    // plumbing (binary in, frame batch shape out, per-partition iteration,
    // zero shuffle) is the real thing a codec-backed sampler would use.
    QueryDef("mm_frame_sample",
      (s, d) => {
        val spark = s
        val binDf = Tables.documents(spark, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val rdd = binDf.queryExecution.toRdd.mapPartitions { iter =>
          iter.map { ir =>
            val docId = ir.getLong(0)
            val bytes = ir.getBinary(1)
            val frameSize = 64
            val nFrames = (bytes.length + frameSize - 1) / frameSize
            var sampled = 0L
            var sampledBytes = 0L
            var first: Array[Byte] = null
            var f = 0
            while (f < nFrames) {
              if (f % 4 == 0) { // keep every 4th frame
                val start = f * frameSize
                val len = math.min(frameSize, bytes.length - start)
                if (first == null)
                  first = java.util.Arrays.copyOfRange(bytes, start, start + len)
                sampled += 1
                sampledBytes += len
              }
              f += 1
            }
            val firstHex = if (first == null) null
              else first.map("%02X".format(_)).mkString
            Row(docId, nFrames.toLong, sampled, sampledBytes, firstHex)
          }
        }
        spark.createDataFrame(rdd, frameSchema).orderBy(col("doc_id"))
      },
      // frame chunking is pure arithmetic over the BYTE length, and the
      // first frame renders as the first 128 chars of the hex(bytes)
      // string — byte-exact on both engines regardless of encoding
      Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
             |  octet_length(encode(text)) AS nb FROM documents)
             |SELECT doc_id,
             |  (nb + 63) // 64 AS n_frames,
             |  ((nb + 63) // 64 + 3) // 4 AS n_sampled,
             |  CASE WHEN nb = 0 THEN 0
             |    ELSE 64 * (((nb + 63) // 64 + 3) // 4 - 1)
             |      + LEAST(64, nb - 256 * (((nb + 63) // 64 + 3) // 4 - 1))
             |  END AS sampled_bytes,
             |  CASE WHEN nb = 0 THEN NULL
             |    ELSE substr(hx, 1, 128) END AS first_frame_hex
             |FROM b ORDER BY doc_id""".stripMargin))
  )
}
