package graft.queries

import graft.{Q, Tables}
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal-column suite: media as opaque binary columns + typed
  * metadata, decoded executor-side via a typed mapPartitions pass (the
  * decode itself is a clearly-marked deterministic stub — no codecs in
  * this container; the oracle recomputes the same arithmetic from the
  * source text bytes).
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // mm01 — binary payload + metadata → per-partition typed decode.
    // brightness := byte-sum mod 256; phash := md5(payload) (stub
    // features; real plumbing: encoder, mapPartitions, schema).
    Q(
      "mm01_image_decode",
      """SELECT doc_id AS image_id,
        |  CAST(n_chars % 32 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 24 + 1 AS INTEGER) AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpg' ELSE 'webp' END AS format,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(list_aggregate(list_transform(generate_series(1, length(text)),
        |    i -> ascii(substr(text, i, 1))), 'sum') % 256 AS BIGINT) AS brightness,
        |  md5(text) AS phash
        |FROM documents ORDER BY image_id""".stripMargin
    ) { (s, dir) =>
      val images = MultimodalOps.imagesFromDocuments(Tables(s, dir, "documents"))
      MultimodalOps.decodeImages(s, images)
        .toDF()
        .orderBy(col("image_id"))
    },

    // ---------------------------------------------------------------
    // mm02 — frame sampling over a "video" payload: 32-byte frames,
    // every 2nd frame kept. Generate + explode, no shuffle.
    Q(
      "mm02_frame_sample",
      """SELECT doc_id,
        |  CAST(f AS BIGINT) AS frame_idx,
        |  md5(substr(text, CAST(f * 32 + 1 AS INTEGER), 32)) AS frame_md5,
        |  CAST(length(substr(text, CAST(f * 32 + 1 AS INTEGER), 32)) AS BIGINT) AS frame_bytes
        |FROM documents
        |CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS f) g
        |WHERE f < ceil(length(text) / 32.0) AND f % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.sampleFrames(
          Tables(s, dir, "documents"), "doc_id", "text",
          frameLen = 32, stride = 2)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // ---------------------------------------------------------------
    // mm03 — "audio" feature extraction stub: bytes as a waveform,
    // 16-byte frames, per-frame RMS-style energy (sum of squared byte
    // values — exact integer math, deterministic across engines). The
    // real plumbing is the frame explode + per-frame aggregation shape.
    Q(
      "mm03_audio_energy",
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(list_aggregate(list_transform(
        |    generate_series(CAST(f * 16 + 1 AS BIGINT), CAST(least(f * 16 + 16, length(text)) AS BIGINT)),
        |    i -> ascii(substr(text, CAST(i AS INTEGER), 1)) * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |    'sum') AS BIGINT) AS energy
        |FROM documents
        |CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS f) g
        |WHERE f < ceil(length(text) / 16.0)
        |ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("frame_idx", explode(sequence(lit(0L),
          ceil(length(col("text")) / 16.0).cast("long") - 1)))
        .withColumn("frame",
          col("text").substr((col("frame_idx") * 16 + 1).cast("int"), lit(16)))
        .select(col("doc_id"), col("frame_idx"),
          aggregate(
            transform(split(col("frame"), ""),
              c => ascii(c) * ascii(c)),
            lit(0L), (acc, x) => acc + x).as("energy"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // ---------------------------------------------------------------
    // mm04 — modality sniffing/routing: payloads carry REAL magic bytes
    // (PNG/JPEG/GIF89a/RIFF, injected by doc_id%5 — the ground truth),
    // and the operator must recover the format from the leading bytes
    // alone, the way an ingest router classifies a mixed media stream
    // without trusting metadata. The oracle knows the injection rule;
    // a sniff miss (or a text byte-collision) hash-mismatches. Also
    // checks the routed per-format byte accounting.
    Q(
      "mm04_modality_sniff",
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INTEGER)
        |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |    WHEN 3 THEN 'riff'
        |    -- a raw payload that happens to LEAD with an ASCII
        |    -- signature sniffs as that format — mirror it (the binary
        |    -- png/jpeg magics can't be a UTF-8 text prefix)
        |    ELSE CASE WHEN text LIKE 'GIF89a%' THEN 'gif'
        |              WHEN text LIKE 'RIFF%' THEN 'riff'
        |              ELSE 'unknown' END END AS fmt,
        |  CAST(octet_length(encode(text)) + CASE CAST(doc_id % 5 AS INTEGER)
        |    WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 6 WHEN 3 THEN 4
        |    ELSE 0 END AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val payloads = MultimodalOps.mixedPayloads(Tables(s, dir, "documents"))
      payloads.select(col("doc_id"),
          MultimodalOps.sniffModality(col("payload")).as("fmt"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy(col("doc_id"))
    }
  )
}
