package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: opaque binary payload + typed metadata (the
  * multimodal data model — image/audio/video as `binary` columns). */
final case class MediaRecord(media_id: Long, kind: String,
    width: Int, height: Int, payload: Array[Byte])

/** Decoded-feature row emitted by the (stubbed) decoder. */
final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    mean_byte: Double, histogram: Seq[Long])

/** Sampled frame row. */
final case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Int,
    frame_hash: String)

/** Resized-image row: nearest-neighbour downsample of the decoded
  * pixel buffer, fingerprinted portably (rolling hash over pixel
  * values — md5 of raw bytes is not reconstructable engine-neutrally,
  * arithmetic is). */
final case class MediaResize(media_id: Long, kind: String, src_w: Int,
    src_h: Int, rw: Int, rh: Int, px_hash: Long, mean_px: Double)

/** Multimodal columns (brief north star): image/audio/video as opaque
  * `binary` payloads with typed metadata, processed in partition-sized
  * batches — the Scala analogue of `mapInPandas` batch processing is a
  * `mapPartitions` over a typed Dataset: one iterator per partition,
  * vectorizable per-batch work, typed output schema.
  *
  * The payloads are synthesized deterministically from `documents`
  * (UTF-8 bytes of the text — the container ships no media, FIXTURES
  * pattern), so every byte-level result is reproducible and
  * oracle-/test-checkable. The REAL codec boundary is stubbed:
  * [[DecodeStub.decodeImage]] stands in for a JPEG/PNG decoder and is
  * clearly marked — the surrounding plumbing (schema, metadata,
  * partitioning, batch iteration, typed output) is real and tested.
  *
  * 100 TB posture: payload bytes never leave the executors (no
  * collect); catalog metadata queries prune the payload column
  * entirely (columnar Parquet would not even read it); per-partition
  * batch processing keeps decoder state (a real codec's buffers)
  * amortized across a partition, exactly like a Pandas-UDF batch.
  */
object Multimodal extends QueryModule {

  /** Frame-sampling stride for the fake video payloads. */
  val FRAME_STRIDE = 3
  val HIST_BINS = 16

  /** THE STUB — the real image/audio codec is not in this container.
    * `decodeImage` would inflate a compressed payload into pixels; the
    * deterministic stand-in treats the payload bytes AS the pixel
    * buffer (row-major, 1 byte/px). Swap this object for a real codec
    * binding to productionize; nothing else changes. */
  object DecodeStub {
    def decodeImage(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      // ??? <- real codec goes here; deterministic fake below.
      val px = new Array[Byte](width * height)
      var i = 0
      while (i < px.length) { px(i) = if (i < payload.length) payload(i) else 0; i += 1 }
      px
    }
  }

  /** Media synthesis: kind by doc_id mod 3; width/height from n_chars
    * (documented fake dims, deterministic at every sf). */
  private def mediaDf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      (col("n_chars") % 16 + 4).cast("int").as("width"),
      (col("n_chars") % 8 + 4).cast("int").as("height"),
      encode(col("text"), "utf-8").as("payload"))

  // --- media_catalog: metadata-only scan (payload pruned) ----------------
  def mediaCatalog(spark: SparkSession, dir: String): DataFrame =
    mediaDf(spark, dir)
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        octet_length(col("payload")).as("n_bytes"),
        format_string("media/%05d.%s", col("media_id"), col("kind")).as("media_uri"))
      .orderBy(col("media_id"))

  val mediaCatalogSql =
    """SELECT doc_id AS media_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |  CAST(n_chars % 16 + 4 AS INT) AS width,
      |  CAST(n_chars % 8 + 4 AS INT) AS height,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  printf('media/%05d.%s', doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]) AS media_uri
      |FROM documents ORDER BY media_id""".stripMargin

  // --- media_features: batched decode + feature extraction ---------------
  /** Decode (stub) + byte-histogram feature extraction, one partition
    * batch at a time — the mapInPandas shape. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDf(spark, dir).as[MediaRecord]
      .repartition(col("media_id"))
      .mapPartitions { batch =>
        batch.map { m =>
          val px = DecodeStub.decodeImage(m.payload, m.width, m.height)
          val hist = new Array[Long](HIST_BINS)
          var sum = 0L
          px.foreach { b =>
            val v = b & 0xff
            hist(v * HIST_BINS / 256) += 1
            sum += v
          }
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            if (px.isEmpty) 0.0 else sum.toDouble / px.length,
            hist.toSeq)
        }
      }
      .toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 6))
      .orderBy(col("media_id"))
  }

  /** Gate projection of [[mediaFeatures]]: histogram as a csv string —
    * nested types crash generic row-comparison harnesses, so the
    * registered entry is scalar-only. */
  def mediaFeaturesGate(spark: SparkSession, dir: String): DataFrame =
    mediaFeatures(spark, dir)
      .withColumn("histogram", array_join(col("histogram").cast("array<string>"), ","))

  /** media_features oracle: the stub decoder is deterministic byte math
    * (pixel i = payload byte i, zero-padded to width·height), so the
    * whole decode+histogram is SQL-expressible over the ASCII text —
    * `ascii(substr(…))` replays the byte buffer (same ASCII assumption
    * the frame_sample oracle already asserts via md5 parity). */
  val mediaFeaturesSql =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |  CAST(n_chars % 16 + 4 AS INT) * CAST(n_chars % 8 + 4 AS INT) AS n_px,
       |  CAST(octet_length(encode(text)) AS INT) AS n_bytes, text
       |  FROM documents),
       |p AS (SELECT media_id, kind, n_bytes, n_px,
       |  list_transform(range(0, n_px), i ->
       |    CASE WHEN i < n_bytes THEN ascii(substr(text, CAST(i + 1 AS INT), 1)) ELSE 0 END) AS px
       |  FROM m)
       |SELECT media_id, kind, n_bytes,
       |  round(CAST(list_sum(px) AS DOUBLE) / n_px, 6) AS mean_byte,
       |  array_to_string(list_transform(range(0, $HIST_BINS),
       |    b -> CAST(len(list_filter(px, v -> v // ${256 / HIST_BINS} = b)) AS VARCHAR)), ',') AS histogram
       |FROM p ORDER BY media_id""".stripMargin

  // --- media_resize: nearest-neighbour downsample ------------------------
  /** Target thumbnail dims. */
  val RESIZE_W = 8
  val RESIZE_H = 8

  /** Decode (stub) + nearest-neighbour resize to a fixed thumbnail,
    * in the same partition-batch shape as [[mediaFeatures]] — the
    * resize step of the decode/extract/resize/sample quartet. The
    * source pixel for output (x, y) is (x·w/RW, y·h/RH) with integer
    * math, so the whole path is deterministic and SQL-oracled. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDf(spark, dir).as[MediaRecord]
      .repartition(col("media_id"))
      .mapPartitions { batch =>
        batch.map { m =>
          val px = DecodeStub.decodeImage(m.payload, m.width, m.height)
          val out = new Array[Long](RESIZE_W * RESIZE_H)
          var y = 0
          while (y < RESIZE_H) {
            var x = 0
            while (x < RESIZE_W) {
              val sy = y * m.height / RESIZE_H
              val sx = x * m.width / RESIZE_W
              out(y * RESIZE_W + x) = (px(sy * m.width + sx) & 0xff).toLong
              x += 1
            }
            y += 1
          }
          var hsh = 0L
          out.foreach(v => hsh = (hsh * Pipeline.FP_BASE + v) % Pipeline.FP_MOD)
          MediaResize(m.media_id, m.kind, m.width, m.height,
            RESIZE_W, RESIZE_H, hsh, out.sum.toDouble / out.length)
        }
      }
      .toDF()
      .withColumn("mean_px", round(col("mean_px"), 6))
      .orderBy(col("media_id"))
  }

  val mediaResizeSql =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |  CAST(n_chars % 16 + 4 AS INT) AS w, CAST(n_chars % 8 + 4 AS INT) AS h,
       |  CAST(octet_length(encode(text)) AS INT) AS n_bytes, text
       |  FROM documents),
       |p AS (SELECT media_id, kind, w, h,
       |  list_transform(range(0, w * h), i ->
       |    CASE WHEN i < n_bytes THEN ascii(substr(text, CAST(i + 1 AS INT), 1)) ELSE 0 END) AS px
       |  FROM m),
       |r AS (SELECT media_id, kind, w AS src_w, h AS src_h,
       |  list_transform(range(0, ${RESIZE_W * RESIZE_H}), i ->
       |    px[CAST(((i // $RESIZE_W) * src_h) // $RESIZE_H AS INT) * src_w
       |       + CAST(((i % $RESIZE_W) * src_w) // $RESIZE_W AS INT) + 1]) AS rp
       |  FROM p)
       |SELECT media_id, kind, src_w, src_h,
       |  $RESIZE_W AS rw, $RESIZE_H AS rh,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(rp, v -> CAST(v AS BIGINT))),
       |    (acc, v) -> (acc * ${Pipeline.FP_BASE} + v) % ${Pipeline.FP_MOD}) AS px_hash,
       |  round(CAST(list_sum(rp) AS DOUBLE) / ${RESIZE_W * RESIZE_H}, 6) AS mean_px
       |FROM r ORDER BY media_id""".stripMargin

  // --- frame_sample: every k-th frame of the video payloads --------------
  /** Frame = width·height bytes of the payload; emit every
    * [[FRAME_STRIDE]]-th frame with its md5 (the frame-sampling shape:
    * per-record fan-out inside a partition batch, no shuffle until the
    * final order). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDf(spark, dir).as[MediaRecord]
      .filter(col("kind") === "video")
      .repartition(col("media_id"))
      .mapPartitions { batch =>
        batch.flatMap { m =>
          val frameSize = m.width * m.height
          val nFrames = m.payload.length / frameSize
          (0 until nFrames).filter(_ % FRAME_STRIDE == 0).map { i =>
            val frame = m.payload.slice(i * frameSize, (i + 1) * frameSize)
            val md = java.security.MessageDigest.getInstance("MD5")
            FrameSample(m.media_id, i, frame.length,
              md.digest(frame).map(b => f"$b%02x").mkString)
          }
        }
      }
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Frame-sample oracle: md5 over the same slices in SQL. DuckDB
    * cannot slice BLOBs, so the oracle slices the source VARCHAR by
    * character — byte-equivalent because the fixture text is ASCII
    * (any non-ASCII byte would fail the md5 compare, so the gate
    * itself asserts the assumption). */
  val frameSampleSql =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |  CAST(n_chars % 16 + 4 AS INT) * CAST(n_chars % 8 + 4 AS INT) AS frame_size,
       |  text
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (SELECT media_id, frame_size,
       |  CAST(floor(octet_length(encode(text)) / frame_size) AS INT) AS n_frames, text
       |  FROM m),
       |s AS (SELECT media_id, i AS frame_idx, frame_size,
       |  substr(text, CAST(i * frame_size + 1 AS INT), frame_size) AS frame
       |  FROM f, unnest(range(0, n_frames)) AS u(i)
       |  WHERE i % $FRAME_STRIDE = 0)
       |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       |  CAST(frame_size AS INT) AS frame_bytes, md5(frame) AS frame_hash
       |FROM s ORDER BY media_id, frame_idx""".stripMargin

  override def entries: Seq[QueryDef] = Seq(
    QueryDef("media_catalog", mediaCatalog, Some(mediaCatalogSql),
      "typed metadata over synthesized binary media (payload pruned)"),
    QueryDef("media_features", mediaFeaturesGate, Some(mediaFeaturesSql),
      "stub-decoded byte-histogram features via partition batches"),
    QueryDef("frame_sample", frameSample, Some(frameSampleSql),
      "every k-th frame of video payloads with md5 fingerprints"),
    QueryDef("media_resize", mediaResize, Some(mediaResizeSql),
      "nearest-neighbour thumbnail resize via partition batches"))
}
