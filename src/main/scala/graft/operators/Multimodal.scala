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
    // has no codecs, so the "decode" is a deterministic byte histogram +
    // rolling checksum with identical plumbing (binary in, fixed-schema
    // features out, executed per-partition with zero shuffle).
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
            var checksum = 1469598103934665603L // FNV offset
            val hist = new Array[Long](16)
            var i = 0
            while (i < bytes.length) {
              checksum = (checksum ^ (bytes(i) & 0xffL)) * 1099511628211L
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
      None)
  )
}
