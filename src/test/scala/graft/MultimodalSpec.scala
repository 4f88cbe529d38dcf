package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Byte-exact semantics of the multimodal stub operators on NON-ASCII
  * input — the operators iterate the UTF-8 payload bytes, never
  * characters, and the DuckDB oracles mirror that via hex(encode(text)).
  * This fixture includes multi-byte characters (2- and 3-byte UTF-8), a
  * document whose 64-byte frame boundary splits a character, and an empty
  * document; expectations are computed independently from the raw UTF-8
  * bytes, so a regression to character-based logic on either side fails
  * here.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-nonascii").toString
    Seq(
      (1L, "héllo wörld"),                       // 2-byte chars
      (2L, "日本語のテキストが続きます。" * 4),   // 3-byte chars, >64 bytes:
                                                 // frame boundary splits one
      (3L, ""),                                  // empty payload
      (4L, "plain ascii text"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("xx"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val texts = Map(
    1L -> "héllo wörld",
    2L -> "日本語のテキストが続きます。" * 4,
    3L -> "",
    4L -> "plain ascii text")

  test("mm_feature_stub computes over UTF-8 bytes, not characters") {
    val got = SparkEntry.queries("mm_feature_stub")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    texts.foreach { case (id, s) =>
      val bytes = s.getBytes(UTF_8)
      var checksum = 0L
      val hist = new Array[Long](16)
      bytes.zipWithIndex.foreach { case (b, i) =>
        checksum += (i % 31 + 1).toLong * (b & 0xffL)
        hist((b & 0xf0) >> 4) += 1
      }
      val expect = (bytes.length.toLong, checksum, hist.count(_ > 0).toLong)
      assert(got(id) === expect, s"doc $id")
      // character-based math MUST disagree for the non-ASCII docs — this
      // is what makes the test sensitive to an ord/len-style regression
      if (id == 1L || id == 2L) assert(bytes.length != s.length)
    }
  }

  test("mm_frame_sample chunks bytes; first frame hex survives a split char") {
    val got = SparkEntry.queries("mm_frame_sample")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)),
          if (r.isNullAt(4)) null else r.getString(4))).toMap
    texts.foreach { case (id, s) =>
      val bytes = s.getBytes(UTF_8)
      val nFrames = (bytes.length + 63) / 64
      val sampled = (0 until nFrames).count(_ % 4 == 0).toLong
      val sampledBytes = (0 until nFrames).filter(_ % 4 == 0)
        .map(f => math.min(64, bytes.length - f * 64).toLong).sum
      val firstHex = if (bytes.isEmpty) null
        else bytes.take(64).map("%02X".format(_)).mkString
      assert(got(id)._1 === ((nFrames.toLong, sampled, sampledBytes)), s"doc $id")
      assert(got(id)._2 === firstHex, s"doc $id")
    }
    // doc 2's 64-byte frame cuts a 3-byte character: 128 hex chars, and
    // decoding the frame alone would NOT round-trip as UTF-8 — proving the
    // sampler works on bytes
    assert(got(2L)._2.length === 128)
  }
}
