package graft.operators

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) is modeled as opaque `binary` payloads with
  * typed metadata. The container ships no codec libraries and the fixtures
  * no real media, so the image payloads are *synthesized* (deterministic
  * P6 PPM bytes per doc) — but the decode step is a REAL decoder: `Ppm`
  * below parses any binary PPM (magic, comment lines, ASCII dimension
  * tokens, raw RGB24 samples) exactly as the published netpbm format
  * specifies. Everything around it — schema, binary column handling,
  * per-partition batch shape, feature extraction layout — is the Spark
  * plumbing a production codec (libjpeg via JNI, or a Pandas UDF via
  * mapInPandas) drops into unchanged.
  */
object Multimodal {

  /** Features a decoder emits per image: dimensions + per-channel means. */
  case class ImageFeatures(
      doc_id: Long, byte_len: Int, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Minimal REAL codec for the netpbm P6 (binary RGB) format — pure JVM,
    * ~50 LoC, decodes any spec-conforming PPM: magic token, `#` comment
    * lines, whitespace-separated ASCII width/height/maxval, a single
    * whitespace byte, then width*height RGB24 samples. */
  object Ppm {

    /** Deterministic synthetic image for doc `id` (the fixture side —
      * the container has no real media): variable dims 8..16 x 8..14 and
      * pixel bytes from a linear congruence, plus a comment line so the
      * decoder's comment handling is exercised on every payload. */
    def encode(id: Long): Array[Byte] = {
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      val header = s"P6\n# graft synthetic\n$w $h\n255\n".getBytes("US-ASCII")
      val px = new Array[Byte](3 * w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((id + i.toLong * 7) % 256).toByte
        i += 1
      }
      header ++ px
    }

    def decode(id: Long, bytes: Array[Byte]): ImageFeatures = {
      var pos = 0
      def skipSpaceAndComments(): Unit = {
        var going = true
        while (going && pos < bytes.length) {
          val c = bytes(pos)
          if (c == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
          else going = false
        }
      }
      def token(): String = {
        skipSpaceAndComments()
        val start = pos
        while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar))
          pos += 1
        new String(bytes, start, pos - start, "US-ASCII")
      }
      val magic = token()
      require(magic == "P6", s"not a binary PPM: magic '$magic'")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
      pos += 1 // exactly ONE whitespace byte separates header from raster
      require(bytes.length - pos >= 3 * w * h, "truncated raster")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var k = 0
      while (k < w * h) {
        sr += bytes(pos) & 0xff
        sg += bytes(pos + 1) & 0xff
        sb += bytes(pos + 2) & 0xff
        pos += 3
        k += 1
      }
      val n = (w * h).toDouble
      ImageFeatures(id, bytes.length, w, h, sr / n, sg / n, sb / n)
    }
  }

  val queries: Map[String, Q] = Map(
    // Expression-level binary ops: payload synthesis, length, hash, slice
    // ("thumbnail" stub) — oracle-checked against DuckDB BLOB functions.
    // The binary thumbnail slice is hex-encoded for the driver harness
    // (pandas cannot hash bytearray cells).
    "m01_binary_payload" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          col("text").cast(BinaryType).as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          hex(substring(col("payload"), 1, 8)).as("thumb"))
        .orderBy("doc_id")
    },

    // Partition-parallel decode stage: typed mapPartitions over binary
    // payloads -> feature struct per row. Payload synthesis (first narrow
    // stage) stands in for the storage read; the decode is the REAL Ppm
    // parser above. The operator shape — narrow stage, per-partition
    // batching, typed Encoder output, no shuffle until the features are
    // columnar — is exactly the scale-out path for production codecs.
    "m02_decode_features" -> { (s, dir) =>
      import s.implicits._
      val payloads = t(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Ppm.encode(id))))
      payloads.mapPartitions(_.map { case (id, bytes) =>
        Ppm.decode(id, bytes)
      }).toDF()
        // channel sums are exact integers in double arithmetic, so the
        // means round deterministically across engines
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
        .orderBy("doc_id")
    },

    // Frame sampling (the video shape): each media payload expands to 4
    // evenly-strided fixed-width frame windows, one output row per frame
    // with its own fingerprint. Pure column expressions + explode — a
    // narrow stage whose output cardinality (4x) is controlled by the
    // sample rate, which is the knob that keeps a 100 TB video corpus
    // processable (sample, don't decode everything). A real pipeline
    // replaces the byte-window slice with a codec's frame extraction; the
    // partitioning, explode shape, and per-frame schema stay identical.
    "m03_frame_sample" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .withColumn("len", length(col("payload")))
        .withColumn("stride", greatest(floor(col("len") / 4), lit(1)))
        .select(col("doc_id"), col("payload"), col("stride"),
          explode(sequence(lit(0), lit(3))).as("frame_idx"))
        .select(col("doc_id"),
          col("frame_idx").cast(IntegerType).as("frame_idx"),
          (col("frame_idx") * col("stride") + 1).cast(IntegerType).as("frame_off"),
          md5(expr("substring(payload, cast(frame_idx*stride+1 as int), 16)"))
            .as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    })

  val oracles: Map[String, String] = Map(
    // ASCII fixture text: byte windows == char windows, so the frame
    // fingerprints replay exactly over SUBSTRING
    "m03_frame_sample" -> """
      WITH f AS (
        SELECT doc_id, text, LENGTH(text) AS len,
               GREATEST(LENGTH(text) // 4, 1) AS stride
        FROM documents),
      fr AS (
        SELECT doc_id, text, stride, UNNEST(RANGE(0, 4)) AS frame_idx FROM f)
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(frame_idx * stride + 1 AS INT) AS frame_off,
             MD5(SUBSTRING(text, CAST(frame_idx * stride + 1 AS INT), 16))
               AS frame_md5
      FROM fr ORDER BY doc_id, frame_idx""",
    "m01_binary_payload" -> """
      SELECT doc_id,
        CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS byte_len,
        MD5(text) AS payload_md5,
        HEX(ENCODE(SUBSTRING(text, 1, 8))) AS thumb
      FROM documents ORDER BY doc_id""",

    // The synthesized P6 payload is arithmetic over (doc_id, flat byte
    // index), so the oracle replays the decoder's ground truth exactly:
    // header length = len("P6\n# graft synthetic\n") + len(w) + 1 + len(h)
    // + 1 + len("255\n") = 27 + len(w) + len(h), and channel c's samples
    // sit at flat indices 3k + c with value (doc_id + 7*(3k+c)) % 256.
    "m02_decode_features" -> """
      WITH dims AS (
        SELECT doc_id,
               CAST(8 + doc_id % 9 AS INT) AS width,
               CAST(8 + doc_id % 7 AS INT) AS height
        FROM documents)
      SELECT doc_id,
        CAST(27 + LENGTH(CAST(width AS VARCHAR)) + LENGTH(CAST(height AS VARCHAR))
             + 3 * width * height AS INT) AS byte_len,
        width, height,
        ROUND(LIST_AVG(LIST_TRANSFORM(RANGE(0, width * height),
          k -> (doc_id + 7 * (3 * k + 0)) % 256)), 6) AS mean_r,
        ROUND(LIST_AVG(LIST_TRANSFORM(RANGE(0, width * height),
          k -> (doc_id + 7 * (3 * k + 1)) % 256)), 6) AS mean_g,
        ROUND(LIST_AVG(LIST_TRANSFORM(RANGE(0, width * height),
          k -> (doc_id + 7 * (3 * k + 2)) % 256)), 6) AS mean_b
      FROM dims ORDER BY doc_id""")
}
