package graft

import graft.operators.{MediaFeatures, Multimodal}
import org.apache.spark.sql.functions._

/** Local replay oracle for the multimodal decode path, plus the codec
  * properties the oracles rely on (lossless PNG round-trip). */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("PNG codec: decode of encode is the identity on gray buffers") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(12)
      val px = Array.fill((w * h))(rnd.nextInt(256).toByte)
      val png = Multimodal.MediaCodec.encodePng(px, w, h)
      // a real container, not a passthrough: PNG magic bytes
      assert((png.take(8).map(_ & 0xff) sameElements
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)), "PNG signature")
      val (dw, dh, dpx) = Multimodal.MediaCodec.decodePng(png)
      assert(dw == w && dh == h)
      assert(dpx.toSeq == px.toSeq, "lossless round-trip")
    }
  }

  test("fixture text is pure ASCII (the media oracles' byte=char assumption)") {
    // The media_features/media_resize/frame_sample DuckDB oracles replay
    // the UTF-8 payload bytes via substr/ascii, which index CHARACTERS —
    // byte-equivalent only while the corpus is ASCII. Fail loudly here
    // if a future fixture regeneration breaks that, instead of letting
    // the parity gate chase phantom byte diffs.
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(nonAscii == 0, s"$nonAscii docs contain non-ASCII text")
  }

  test("media_features matches a local byte-histogram replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    val expected = docs.map { case (id, text, nChars) =>
      val payload = text.getBytes("UTF-8")
      val w = (nChars % 16 + 4).toInt
      val h = (nChars % 8 + 4).toInt
      // the decoded buffer every kind must produce: content bytes
      // zero-padded to width*height (images get there via a real PNG
      // encode/decode round-trip; the codec test above pins that the
      // round-trip is the identity)
      val px = java.util.Arrays.copyOf(payload, w * h)
      val hist = new Array[Long](Multimodal.HIST_BINS)
      var sum = 0L
      px.foreach { b =>
        val v = b & 0xff; hist(v * Multimodal.HIST_BINS / 256) += 1; sum += v
      }
      id -> ((payload.length, sum.toDouble / px.length, hist.toSeq))
    }.toMap
    val got = Multimodal.mediaFeatures(spark, sfDir).as[MediaFeatures].collect()
    assert(got.length == expected.size)
    got.foreach { f =>
      val (nb, mean, hist) = expected(f.media_id)
      assert(f.n_bytes == nb, s"media ${f.media_id} bytes")
      assert(math.abs(f.mean_byte - mean) < 1e-5, s"media ${f.media_id} mean")
      assert(f.histogram == hist, s"media ${f.media_id} histogram")
    }
  }

  test("histogram bins sum to decoded pixel count (width*height)") {
    val bad = Multimodal.mediaFeatures(spark, sfDir)
      .join(Multimodal.mediaCatalog(spark, sfDir), "media_id")
      .filter(aggregate(col("histogram"), lit(0L), (a, x) => a + x)
        =!= col("width") * col("height"))
    assert(bad.isEmpty)
  }

  test("frame_sample emits only stride-aligned frames of video media") {
    val rows = Multimodal.frameSample(spark, sfDir)
      .select("media_id", "frame_idx").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, idx) =>
      assert(id % 3 == 2, s"media $id is not video")
      assert(idx % Multimodal.FRAME_STRIDE == 0)
    }
  }
}
