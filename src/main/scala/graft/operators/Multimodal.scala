package graft.operators

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) is modeled as opaque `binary` payloads with
  * typed metadata — here synthesized deterministically from `documents.text`
  * since the fixtures carry no real media and the container has no decode
  * libraries. The *decode step is a stub* (clearly marked); everything
  * around it — schema, binary column handling, per-partition batch shape,
  * feature extraction layout — is the real Spark plumbing that a production
  * decoder (e.g. a Pandas UDF via mapInPandas, or a JNI codec in
  * mapPartitions) would drop into.
  */
object Multimodal {

  /** STUB decode: a real pipeline would decode image bytes here. The stub
    * derives deterministic pseudo-features from the payload bytes so the
    * batch shape, schema, and partitioning are exercised end-to-end. */
  case class MediaFeatures(
      doc_id: Long, byte_len: Int, mean_byte: Double, frames: Array[Int])

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
    // payloads -> feature struct per row. The decode body is the stub; the
    // operator shape (narrow stage, per-partition batching, typed Encoder
    // output) is the scale-out path for real codecs.
    "m02_decode_features" -> { (s, dir) =>
      import s.implicits._
      val payloads = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          // ??? real decoder goes here; deterministic stub features:
          val mean = if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          MediaFeatures(id, bytes.length, mean,
            Array.tabulate(4)(f => if (bytes.length > f) bytes(f) & 0xff else 0))
        }
      }.toDF()
        // frames serialized to JSON and the mean rounded: the byte sum is an
        // exact integer in double arithmetic, so round(…, 6) is
        // deterministic across engines and the row is harness-hashable.
        .select(col("doc_id"), col("byte_len"),
          round(col("mean_byte"), 6).as("mean_byte"),
          to_json(col("frames")).as("frames"))
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

    // The fixture text is pure ASCII (verified: octet_length(encode(text)) =
    // length(text) for every row), so byte values equal code points and the
    // decode-stub features are exactly reproducible in SQL.
    "m02_decode_features" -> """
      SELECT doc_id,
        CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS byte_len,
        ROUND(LIST_AVG(LIST_TRANSFORM(RANGE(1, LENGTH(text) + 1),
          i -> UNICODE(SUBSTRING(text, CAST(i AS INT), 1)))), 6) AS mean_byte,
        CAST(TO_JSON(LIST_TRANSFORM(RANGE(1, 5),
          f -> CASE WHEN LENGTH(text) >= f
                    THEN UNICODE(SUBSTRING(text, CAST(f AS INT), 1))
                    ELSE 0 END)) AS VARCHAR) AS frames
      FROM documents ORDER BY doc_id""")
}
