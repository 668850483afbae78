package graft.queries

import graft.{Q, Tables}
import graft.operators.MultimodalOps
import org.apache.spark.sql.expressions.Window
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
    // every 2nd frame kept, 32-frame budget per clip (sampleFrames'
    // maxFrames default — the oracle's generate_series(0, 31)).
    // Generate + explode, no shuffle.
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
    // Frames cap at 64 per clip (= first 1024 chars) — the sample
    // budget, encoded identically on BOTH sides (the oracle's
    // generate_series(0, 63) and the Spark least()): previously the
    // Spark explode was unbounded and any fixture doc past 1024 chars
    // would have silently diverged (advisor-caught, round 7).
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
        .withColumn("frame_idx", explode(sequence(lit(0L), least(
          ceil(length(col("text")) / 16.0).cast("long") - 1, lit(63L)))))
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
    },

    // ---------------------------------------------------------------
    // mm05 — perceptual-hash image near-dup (the multimodal dedup
    // capstone: aHash → LSH bands → hamming verify, the image mirror
    // of d03's SimHash text pipeline). The 64-bit aHash comes from the
    // stub decode: 64 fixed 4-byte frames, per-frame energy Σ byte²
    // (exact integer math both engines), bit f = 1 iff 64·e_f exceeds
    // the image's total energy. Candidates come from a 4×16-bit band
    // equi-join with STRIPED bands (band b = bits f ≡ b mod 4), not
    // contiguous chunks: frames past a short payload are all-zero, so
    // a chunked tail band is one shared degenerate value for every
    // short image (142 of 500 docs at sf0.01 ≙ O(n²) pairs at
    // 100 TB), and worse, a short image's informative bits then live
    // in ONE band, so its true near-dups can only collide via
    // degenerate bands (measured: 63 of 1664 hamming≤2 pairs lost,
    // including a planted pair at sf0.001). Stripes span the whole
    // image, so every band keeps informative bits for every length; a
    // k-bit flip touches ≤ k bands, so hamming ≤ 2 still guarantees
    // ≥ 2 equal bands, now informative ones. The all-zero-band guard
    // stays as the backstop for the uniform-energy corner (hash = 0),
    // where it only drops truly information-free stripes. Measured at
    // sf0.01: 1664/1664 of exhaustive hamming≤2 pairs recovered, zero
    // spurious; MultimodalRecallSpec pins planted-pair recovery and
    // the recall floor against the exhaustive truth.
    // Signature build is a pure projection (no explode/shuffle until
    // the band join); hamming is xor+bit_count on 4 pre-decoded longs.
    Q(
      "mm05_image_neardup",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, substr(text, 1, length(text) - 1) AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |en AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), f ->
        |      CAST(coalesce(list_aggregate(list_transform(
        |        generate_series(f*4+1, least(f*4+4, length(text))),
        |        i -> ascii(substr(text, CAST(i AS INTEGER), 1))
        |           * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |        'sum'), 0) AS BIGINT)) AS es
        |  FROM corpus),
        |sig AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(es,
        |      e -> CASE WHEN e * 64 > list_aggregate(es, 'sum')
        |           THEN '1' ELSE '0' END), '') AS ahash
        |  FROM en),
        |bands AS (
        |  SELECT doc_id, ahash, band FROM (
        |    SELECT doc_id, ahash,
        |      unnest(list_transform([0, 1, 2, 3], b ->
        |        CAST(b AS VARCHAR) || array_to_string(list_transform(
        |          generate_series(0, 15), i -> substr(ahash, b + 4*i + 1, 1)), ''))) AS band
        |    FROM sig)
        |  WHERE substr(band, 2) <> repeat('0', 16)),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.ahash AS a_sig, b.ahash AS b_sig
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, CAST(list_aggregate(list_transform(generate_series(1, 64),
        |    i -> CASE WHEN substr(a_sig, i, 1) <> substr(b_sig, i, 1) THEN 1 ELSE 0 END),
        |    'sum') AS BIGINT) AS hamming
        |FROM cand
        |WHERE list_aggregate(list_transform(generate_series(1, 64),
        |    i -> CASE WHEN substr(a_sig, i, 1) <> substr(b_sig, i, 1) THEN 1 ELSE 0 END),
        |    'sum') <= 2
        |ORDER BY a_id, b_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.Stage
      val docs = Tables(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .select(Q.plantedId(col("doc_id"), 100000).as("doc_id"),
            expr("substr(text, 1, length(text) - 1)").as("text")))
      val sigs = graft.operators.Par.fan(corpus) // guide §2.5: parallelize the per-row signature pass
        .withColumn("es", expr(
          "transform(sequence(0, 63), f -> aggregate(" +
            "transform(filter(split(substr(text, f*4+1, 4), ''), c -> c <> '')," +
            " c -> CAST(ascii(c) * ascii(c) AS BIGINT))," +
            " CAST(0 AS BIGINT), (a, x) -> a + x))"))
        .withColumn("te", expr("aggregate(es, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("ahash", concat_ws("",
          transform(col("es"), e =>
            when(e * 64 > col("te"), lit("1")).otherwise(lit("0")))))
        .select(col("doc_id") +: col("ahash") +: (0 until 4).map(b =>
          conv(substring(col("ahash"), b * 16 + 1, 16), 2, 10)
            .cast("long").as(s"w$b")): _*)
        .transform(Stage.stage)  // one signature pass feeds both join sides
      val bands = sigs.select(col("doc_id") +:
          (0 until 4).map(b => col(s"w$b")) :+
          explode(array((0 until 4).map(b =>
            concat(lit(b.toString), expr(s"array_join(transform(" +
              s"sequence(0, 15), i -> substr(ahash, $b + 4*i + 1, 1)), '')"))): _*))
            .as("band"): _*)
        // degenerate-cell guard: an all-zero band blocks nothing
        .filter(substring(col("band"), 2, 16) =!= "0" * 16)
      val ham = (0 until 4).map { b =>
        bit_count(col(s"a.w$b").bitwiseXOR(col(s"b.w$b")))
      }.reduce(_ + _)
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          ham.cast("long").as("hamming"))
        .filter(col("hamming") <= 2)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    },

    // ---------------------------------------------------------------
    // mm06 — audio-fingerprint near-dup: mm05's pipeline with the
    // AUDIO fingerprint family instead of the image one. The signature
    // is energy-DELTA coding (the Shazam/Chromaprint bit): 33 4-byte
    // frames, bit f = 1 iff e_{f+1} >= e_f — sign-of-slope, invariant
    // to level shifts the way an audio fingerprint must be (aHash's
    // level-vs-mean bits are not). Ties code '1', so the silent tail
    // beyond a short payload is a run of 1s: the striped bands
    // (bit f → band f mod 4, mm05's lesson) each mix active slope
    // bits with tail bits, and the degenerate guard drops all-'0' AND
    // all-'1' bands (both carry no slope information; mm05 only had
    // the all-zero corner). Candidates from the 4×8-bit band
    // equi-join, verify hamming ≤ 2 by xor+bit_count on ONE long
    // (32 bits). Planted near-dups append one byte (%8 docs,
    // id+100000): only the last active frame's energy moves, so ≤ 2
    // delta bits flip and ≥ 2 bands stay equal — recall pinned
    // against the exhaustive truth in MultimodalRecallSpec (the
    // spec-before-trust discipline; third LSH op, third time).
    Q(
      "mm06_audio_neardup",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text || 'x' AS text
        |  FROM documents WHERE doc_id % 8 = 0),
        |en AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 32), f ->
        |      CAST(coalesce(list_aggregate(list_transform(
        |        generate_series(f*4+1, least(f*4+4, length(text))),
        |        i -> ascii(substr(text, CAST(i AS INTEGER), 1))
        |           * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |        'sum'), 0) AS BIGINT)) AS es
        |  FROM corpus),
        |sig AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(generate_series(0, 31),
        |      f -> CASE WHEN es[f+2] >= es[f+1] THEN '1' ELSE '0' END), '')
        |      AS fp
        |  FROM en),
        |bands AS (
        |  SELECT doc_id, fp, band FROM (
        |    SELECT doc_id, fp,
        |      unnest(list_transform([0, 1, 2, 3], b ->
        |        CAST(b AS VARCHAR) || array_to_string(list_transform(
        |          generate_series(0, 7), i -> substr(fp, b + 4*i + 1, 1)), ''))) AS band
        |    FROM sig)
        |  WHERE substr(band, 2) <> repeat('0', 8)
        |    AND substr(band, 2) <> repeat('1', 8)),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.fp AS a_sig, b.fp AS b_sig
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, CAST(list_aggregate(list_transform(generate_series(1, 32),
        |    i -> CASE WHEN substr(a_sig, i, 1) <> substr(b_sig, i, 1) THEN 1 ELSE 0 END),
        |    'sum') AS BIGINT) AS hamming
        |FROM cand
        |WHERE list_aggregate(list_transform(generate_series(1, 32),
        |    i -> CASE WHEN substr(a_sig, i, 1) <> substr(b_sig, i, 1) THEN 1 ELSE 0 END),
        |    'sum') <= 2
        |ORDER BY a_id, b_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.Stage
      val docs = Tables(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 8 === 0)
          .select(Q.plantedId(col("doc_id"), 100000).as("doc_id"),
            concat(col("text"), lit("x")).as("text")))
      val sigs = graft.operators.Par.fan(corpus) // guide §2.5: parallelize the per-row signature pass
        .withColumn("es", expr(
          "transform(sequence(0, 32), f -> aggregate(" +
            "transform(filter(split(substr(text, f*4+1, 4), ''), c -> c <> '')," +
            " c -> CAST(ascii(c) * ascii(c) AS BIGINT))," +
            " CAST(0 AS BIGINT), (a, x) -> a + x))"))
        .withColumn("fp", expr(
          "array_join(transform(sequence(0, 31), f -> " +
            "CASE WHEN element_at(es, f+2) >= element_at(es, f+1) " +
            "THEN '1' ELSE '0' END), '')"))
        .select(col("doc_id"), col("fp"),
          conv(col("fp"), 2, 10).cast("long").as("w"))
        .transform(Stage.stage)  // one signature pass feeds both join sides
      val bands = sigs.select(col("doc_id"), col("w"),
          explode(array((0 until 4).map(b =>
            concat(lit(b.toString), expr(s"array_join(transform(" +
              s"sequence(0, 7), i -> substr(fp, $b + 4*i + 1, 1)), '')"))): _*))
            .as("band"))
        // degenerate-cell guard: all-0 AND all-1 stripes carry no slope
        // information (silent tails are 1-runs under >=-ties)
        .filter(substring(col("band"), 2, 8) =!= "0" * 8 &&
          substring(col("band"), 2, 8) =!= "1" * 8)
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          bit_count(col("a.w").bitwiseXOR(col("b.w"))).cast("long")
            .as("hamming"))
        .filter(col("hamming") <= 2)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    },

    // ---------------------------------------------------------------
    // mm07 — video near-dup via frame-hash shingles (the third leg of
    // the image/audio/video dedup triptych): the payload is a frame
    // stream (16-byte frames, capped at 64), each frame hashes to
    // md5, and 4-frame SHINGLES (md5 of 4 consecutive frame hashes)
    // become the join key — so two videos match when they share a
    // 4-frame run at ANY temporal offset, which is what defeats the
    // standard attack on whole-file hashing (a trimmed intro). The
    // planted variant drops exactly the first frame (%12 docs,
    // id+100000): every remaining frame realigns bit-identically, so
    // the pair shares all but 1 of the base's shingles. UNLIKE the
    // banded LSH ops (mm05/mm06/d02), the shingle join is EXACT for
    // its metric — candidates are precisely the pairs sharing ≥ 1
    // shingle and the output counts |shingle intersection| ≥ 2 — so
    // no recall spec is owed; VideoShingleSpec pins the exact
    // intersection counts instead. Shingles dedup per video BEFORE
    // the join (repeated in-video content must not explode the pair
    // rows — the skew guard for boilerplate frames at 100 TB); the
    // join is a sort-merge on the content key and scales with the
    // duplication rate, d10's discipline.
    Q(
      "mm07_video_neardup",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, substr(text, 17) AS text
        |  FROM documents WHERE doc_id % 12 = 0),
        |fr AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0,
        |      CAST(least(ceil(length(text) / 16.0), 64) AS BIGINT) - 1),
        |      f -> md5(substr(text, CAST(f * 16 + 1 AS INTEGER), 16))) AS fh
        |  FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(fh) >= 4 THEN
        |      list_transform(generate_series(0, len(fh) - 4),
        |        s -> md5(fh[s+1] || fh[s+2] || fh[s+3] || fh[s+4]))
        |      ELSE CAST([] AS VARCHAR[]) END) AS s
        |    FROM fr))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 2
        |ORDER BY a_id, b_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 12 === 0)
          .select(Q.plantedId(col("doc_id"), 100000).as("doc_id"),
            expr("substr(text, 17)").as("text")))
      val shingles = corpus
        .withColumn("fh", expr(
          "transform(sequence(0, CAST(least(ceil(length(text) / 16.0), 64) " +
            "AS INT) - 1), f -> md5(substr(text, f * 16 + 1, 16)))"))
        .select(col("doc_id"), explode(expr(
          "CASE WHEN size(fh) >= 4 THEN transform(sequence(0, size(fh) - 4), " +
            "s -> md5(concat(element_at(fh, s+1), element_at(fh, s+2), " +
            "element_at(fh, s+3), element_at(fh, s+4)))) " +
            "ELSE array() END")).as("s"))
        .distinct() // per-video dedup BEFORE the join: the skew guard
      shingles.as("a")
        .join(shingles.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).cast("long").as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("a_id"), col("b_id"))
    },

    // ---------------------------------------------------------------
    // mm08 — image–text alignment scoring (the CLIP-score filter shape:
    // LAION-style pipelines drop pairs whose image and caption
    // embeddings disagree). The image embedding is the stub codec's
    // 64-d byte vector (byte value per position, wrapping when the
    // payload is shorter — same deterministic ascii arithmetic as
    // mm01/mm03); the caption embedding is the real `embeddings` row
    // joined on id; the score is the contract cosine (native codegen'd
    // dot/norm, round 6). The decode seam is where a real vision
    // encoder plugs in (MultimodalOps' documented stub boundary) — the
    // plumbing around it (per-row feature vector, equi-join on pair id,
    // scan-side threshold) is the real thing. Shape at 100 TB: the
    // feature projection is stateless; ONE equi-join on the pair id
    // (both sides id-partitioned at write time ⇒ co-located); the
    // aligned flag compares the same rounded double in both engines.
    Q(
      "mm08_caption_align",
      s"""WITH img AS (
        |  SELECT doc_id, list_transform(generate_series(1, 64), i ->
        |    CAST(ascii(substr(text,
        |      CAST(((i - 1) % length(text)) + 1 AS INTEGER), 1)) AS DOUBLE))
        |    AS iv
        |  FROM documents),
        |txt AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS tv
        |  FROM embeddings),
        |j AS (
        |  SELECT doc_id, ${DedupQueries.cosineSql("iv", "tv", 64)} AS align
        |  FROM img JOIN txt ON txt.vec_id = img.doc_id)
        |SELECT doc_id, align, align > 0 AS aligned
        |FROM j ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.VectorOps
      val img = Tables(s, dir, "documents")
        .select(col("doc_id"), expr(
          "transform(sequence(1, 64), i -> CAST(ascii(substring(text, " +
            "CAST(((i - 1) % length(text)) + 1 AS INT), 1)) AS DOUBLE))")
          .as("iv"))
      val txt = Tables(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("tv"))
      img.join(txt, col("vec_id") === col("doc_id"))
        .select(col("doc_id"),
          VectorOps.cosine(col("iv"), col("tv")).as("align"))
        .select(col("doc_id"), col("align"), (col("align") > 0).as("aligned"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // mm09 — container header parse (dims WITHOUT decode): width and
    // height read straight out of PNG IHDR bytes — big-endian u32 at
    // fixed spec offsets, guarded on the magic — as pure codegen'd
    // expressions. This is the metadata pass a media pipeline runs
    // over petabytes BEFORE deciding what to decode (resolution
    // filters, aspect buckets, corrupt-file routing); the expensive
    // codec never runs. The payload carries a spec-correct header
    // (ImageioDecodeSpec proves the same expressions read REAL
    // encoder output); the oracle knows the dim-injection rule, so a
    // wrong offset or endianness hash-mismatches. aspect is one IEEE
    // division of exact ints, round(,6). Shape at 100 TB: stateless
    // projection; only header bytes are touched, and a format-aware
    // reader would prune the body entirely.
    Q(
      "mm09_header_parse",
      """SELECT doc_id,
        |  CAST(16 + doc_id % 1000 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 777 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_body_bytes,
        |  round(CAST(16 + doc_id % 1000 AS DOUBLE) / (16 + doc_id % 777),
        |    6) AS aspect
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val p = MultimodalOps.pngHeaderPayloads(Tables(s, dir, "documents"))
      p.select(col("doc_id"),
          MultimodalOps.pngWidth(col("payload")).as("width"),
          MultimodalOps.pngHeight(col("payload")).as("height"),
          (length(col("payload")) - MultimodalOps.pngHeaderLen)
            .cast("long").as("n_body_bytes"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_body_bytes"),
          round(col("width").cast("double") / col("height"), 6)
            .as("aspect"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // mm10 — aspect-ratio bucketing + batch packing: vision training
    // pads every image in a batch to the batch's max dims, so batching
    // tall portraits with wide panoramas burns compute on padding
    // pixels. The operator buckets images by aspect (INTEGER cross
    // comparisons — 2w ≥ 3h for wide, 3w ≤ 2h for tall — so the
    // bucket boundary can never float-drift between engines), packs
    // each bucket into deterministic batches of 8 (doc_id order), and
    // reports the padding-waste fraction per bucket: 1 − Σarea /
    // Σ(n·maxw·maxh), all-integer sums with ONE final division.
    // Dims come from the REAL IHDR byte parse (mm09's path), not from
    // a side table — the oracle recomputes them from the fixture
    // formula. Shape at 100 TB: dims parse inside the scan projection
    // (payload column pruned — dims only reach the exchange); the
    // row_number runs per bucket, which at scale would be salted by
    // shard exactly like p09's epoch sharding — batches only need to
    // be LOCALLY dense, nothing global.
    Q(
      "mm10_aspect_bucket",
      """WITH img AS (
        |  SELECT doc_id, CAST(16 + (doc_id * 7) % 1000 AS BIGINT) AS w,
        |    CAST(16 + (doc_id * 3) % 777 AS BIGINT) AS h
        |  FROM documents),
        |bk AS (
        |  SELECT doc_id, w, h,
        |    CASE WHEN 2 * w >= 3 * h THEN 'wide'
        |         WHEN 3 * w <= 2 * h THEN 'tall'
        |         ELSE 'square' END AS bucket
        |  FROM img),
        |bt AS (
        |  SELECT bucket, w, h,
        |    CAST((row_number() OVER (PARTITION BY bucket
        |      ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch
        |  FROM bk),
        |pb AS (
        |  SELECT bucket, batch, CAST(count(*) AS BIGINT) AS n,
        |    CAST(max(w) AS BIGINT) AS mw, CAST(max(h) AS BIGINT) AS mh,
        |    CAST(sum(w * h) AS BIGINT) AS area
        |  FROM bt GROUP BY bucket, batch)
        |SELECT bucket, CAST(sum(n) AS BIGINT) AS n_images,
        |  CAST(count(*) AS BIGINT) AS n_batches,
        |  round(1.0 - CAST(sum(area) AS DOUBLE) / sum(n * mw * mh), 6)
        |    AS waste_ratio
        |FROM pb GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val p = MultimodalOps.pngHeaderPayloadsScaled(
        Tables(s, dir, "documents"), 7, 3)
      val img = p.select(col("doc_id"),
        MultimodalOps.pngWidth(col("payload")).as("w"),
        MultimodalOps.pngHeight(col("payload")).as("h"))
      val bucket = when(lit(2) * col("w") >= lit(3) * col("h"), "wide")
        .when(lit(3) * col("w") <= lit(2) * col("h"), "tall")
        .otherwise("square")
      val bt = img.withColumn("bucket", bucket)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("doc_id"))))
        .withColumn("batch", expr("CAST((rn - 1) DIV 8 AS BIGINT)"))
      val pb = bt.groupBy(col("bucket"), col("batch"))
        .agg(count(lit(1)).cast("long").as("n"),
          max(col("w")).cast("long").as("mw"),
          max(col("h")).cast("long").as("mh"),
          sum(col("w") * col("h")).cast("long").as("area"))
      pb.groupBy(col("bucket"))
        .agg(sum(col("n")).cast("long").as("n_images"),
          count(lit(1)).cast("long").as("n_batches"),
          round(lit(1.0) - sum(col("area")).cast("double")
            / sum(col("n") * col("mw") * col("mh")), 6).as("waste_ratio"))
        .orderBy(col("bucket"))
    },

    // ---------------------------------------------------------------
    // mm11 — shot-boundary detection: the frame-sampling question
    // mm02 leaves open is WHERE to sample — a video's natural sample
    // points are its cuts, detected as energy discontinuities between
    // consecutive frames. Frames reuse mm03's stub feature (16-byte
    // frames, sum-of-squared-byte energy — exact integer arithmetic;
    // the decode is the documented stub boundary, the shape is real),
    // a per-video lag() compares neighbors, and a jump above the
    // threshold opens a new shot. Report per video: frames, shots,
    // max jump. Shape at 100 TB: frame energies explode map-side, ONE
    // exchange on doc_id serves both the lag window and the reduce;
    // window state is one row.
    Q(
      "mm11_shot_bounds",
      """WITH fr AS (
        |  SELECT doc_id, f,
        |    CAST(list_aggregate(list_transform(
        |      generate_series(CAST(f * 16 + 1 AS BIGINT),
        |        CAST(least(f * 16 + 16, length(text)) AS BIGINT)),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1))
        |        * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |      'sum') AS BIGINT) AS energy
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS f) g
        |  WHERE f < ceil(length(text) / 16.0)),
        |d AS (
        |  SELECT doc_id, energy - lag(energy) OVER (
        |    PARTITION BY doc_id ORDER BY f) AS je
        |  FROM fr)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(1 + sum(CASE WHEN abs(je) > 20000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shots,
        |  CAST(COALESCE(max(abs(je)), 0) AS BIGINT) AS max_jump
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // 64-frame cap per clip: mm03's sample budget, mirrored in the
      // oracle's generate_series(0, 63)
      val fr = Tables(s, dir, "documents")
        .withColumn("f", explode(sequence(lit(0L), least(
          ceil(length(col("text")) / 16.0).cast("long") - 1, lit(63L)))))
        .withColumn("frame",
          col("text").substr((col("f") * 16 + 1).cast("int"), lit(16)))
        .select(col("doc_id"), col("f"),
          aggregate(
            transform(split(col("frame"), ""), c => ascii(c) * ascii(c)),
            lit(0L), (acc, x) => acc + x).as("energy"))
      val wdw = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      fr.withColumn("je", col("energy") - lag(col("energy"), 1).over(wdw))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_frames"),
          (lit(1) + sum(when(abs(col("je")) > 20000, 1L).otherwise(0L)))
            .cast("long").as("n_shots"),
          coalesce(max(abs(col("je"))), lit(0L)).cast("long")
            .as("max_jump"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // mm12 — voice-activity segmentation: mm03's frame energies
    // thresholded into ACTIVE runs (gaps-and-islands: frame index
    // minus its rank among active frames groups each consecutive run)
    // — the audio-pipeline stage that cuts speech out of silence
    // before transcription. Per clip: segment count, active frames,
    // longest run. Every document keeps an accounting row — a clip
    // with NO active frames reports zeros via the left join, not a
    // missing row (the d09 lesson, applied from the start this time).
    // Integer arithmetic end to end; one exchange on doc_id serves
    // the rank window and both reduces.
    Q(
      "mm12_audio_vad",
      """WITH fr AS (
        |  SELECT doc_id, f,
        |    CAST(list_aggregate(list_transform(
        |      generate_series(CAST(f * 16 + 1 AS BIGINT),
        |        CAST(least(f * 16 + 16, length(text)) AS BIGINT)),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1))
        |        * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |      'sum') AS BIGINT) AS energy
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS f) g
        |  WHERE f < ceil(length(text) / 16.0)),
        |act AS (SELECT doc_id, f FROM fr WHERE energy > 160000),
        |isl AS (SELECT doc_id,
        |    f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS g
        |  FROM act),
        |seg AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS len
        |        FROM isl GROUP BY doc_id, g),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
        |          CAST(sum(len) AS BIGINT) AS n_active,
        |          CAST(max(len) AS BIGINT) AS longest
        |        FROM seg GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_segments, 0) AS n_segments,
        |  COALESCE(a.n_active, 0) AS n_active,
        |  COALESCE(a.longest, 0) AS longest
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      // 64-frame cap per clip — see mm03
      val fr = docs
        .withColumn("f", explode(sequence(lit(0L), least(
          ceil(length(col("text")) / 16.0).cast("long") - 1, lit(63L)))))
        .withColumn("frame",
          col("text").substr((col("f") * 16 + 1).cast("int"), lit(16)))
        .select(col("doc_id"), col("f"),
          aggregate(
            transform(split(col("frame"), ""), c => ascii(c) * ascii(c)),
            lit(0L), (acc, x) => acc + x).as("energy"))
      val act = fr.filter(col("energy") > 160000)
        .withColumn("g", col("f") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("f"))))
      val agg = act.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).cast("long").as("len"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_segments"),
          sum(col("len")).cast("long").as("n_active"),
          max(col("len")).cast("long").as("longest"))
      docs.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("longest"), lit(0L)).as("longest"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // mm13 — frequency-domain perceptual hash (classic pHash: 2D DCT,
    // low-frequency block, sign-vs-mean bits) over the 8×8 grid of
    // stub-decode frame energies, reported as a dup-vs-random
    // separation study against mm05's planted corpus. The DCT basis is
    // INTEGER fixed-point (round(cos(π(2x+1)u/16)·10⁴), embedded as
    // the same 64-entry literal in both engines) so every coefficient
    // is exact BIGINT arithmetic — no float trig parity risk between
    // JVM and DuckDB libm. The 2D transform is separable: two 8-term
    // passes (rows then columns, 1 024 multiply-adds) instead of the
    // naive 4 096; the whole signature is a per-image projection —
    // zero explode, zero shuffle. Bits: 4×4 low-frequency block minus
    // DC, bit = 1 iff 15·C(u,v) > Σblock (integer compare). Planted
    // near-dups (last char dropped) perturb one energy cell, which
    // smears across ALL coefficients but flips only near-zero signs —
    // the report shows dup-pair hamming far under the random-pair
    // baseline (adjacent doc ids; equi-join, no window). At 100 TB the
    // 15-bit hash band-joins exactly like mm05's aHash. Int64 headroom
    // is guaranteed by construction, not by fixture: the energy input
    // is ascii(c) % 256 in BOTH engines (a multibyte codepoint — up to
    // 1.1e6 — would push the second DCT pass past int64, where Spark
    // silently wraps and DuckDB raises; advisor, round 7), so max
    // magnitude is 8·8·260100·10⁴·10⁴ ≈ 1.7e15, safely in int64.
    Q(
      "mm13_phash_dct",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |    substr(text, 1, length(text) - 1) AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |tb AS (SELECT [10000, 10000, 10000, 10000, 10000, 10000, 10000, 10000,
        |  9808, 8315, 5556, 1951, -1951, -5556, -8315, -9808,
        |  9239, 3827, -3827, -9239, -9239, -3827, 3827, 9239,
        |  8315, -1951, -9808, -5556, 5556, 9808, 1951, -8315,
        |  7071, -7071, -7071, 7071, 7071, -7071, -7071, 7071,
        |  5556, -9808, 1951, 8315, -8315, -1951, 9808, -5556,
        |  3827, -9239, 9239, -3827, -3827, 9239, -9239, 3827,
        |  1951, -5556, 8315, -9808, 9808, -8315, 5556, -1951] AS tt),
        |en AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), f ->
        |      CAST(coalesce(list_aggregate(list_transform(
        |        generate_series(f*4+1, least(f*4+4, length(text))),
        |        i -> (ascii(substr(text, CAST(i AS INTEGER), 1)) % 256)
        |           * (ascii(substr(text, CAST(i AS INTEGER), 1)) % 256)),
        |        'sum'), 0) AS BIGINT)) AS es
        |  FROM corpus),
        |rr AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), i ->
        |      CAST(list_aggregate(list_transform(generate_series(0, 7),
        |        y -> es[(i // 8) * 8 + y + 1] * tt[(i % 8) * 8 + y + 1]),
        |        'sum') AS BIGINT)) AS r
        |  FROM en CROSS JOIN tb),
        |dd AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), j ->
        |      CAST(list_aggregate(list_transform(generate_series(0, 7),
        |        x -> r[x * 8 + (j % 8) + 1] * tt[(j // 8) * 8 + x + 1]),
        |        'sum') AS BIGINT)) AS dct
        |  FROM rr CROSS JOIN tb),
        |lfr AS (
        |  SELECT doc_id,
        |    list_transform([1, 2, 3, 8, 9, 10, 11, 16, 17, 18, 19,
        |      24, 25, 26, 27], j -> dct[j + 1]) AS lf
        |  FROM dd),
        |sig AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(lf, c ->
        |      CASE WHEN c * 15 > list_aggregate(lf, 'sum')
        |        THEN '1' ELSE '0' END), '') AS phash
        |  FROM lfr),
        |dup AS (SELECT a.phash AS pa, b.phash AS pb
        |  FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 100000
        |  WHERE a.doc_id % 10 = 0 AND a.doc_id < 100000),
        |rnd AS (SELECT a.phash AS pa, b.phash AS pb
        |  FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id < 100000 AND b.doc_id < 100000),
        |ham AS (
        |  SELECT 'dup' AS pair_type, list_aggregate(list_transform(
        |    generate_series(1, 15), i -> CASE WHEN substr(pa, i, 1)
        |      <> substr(pb, i, 1) THEN 1 ELSE 0 END), 'sum') AS h FROM dup
        |  UNION ALL
        |  SELECT 'rand' AS pair_type, list_aggregate(list_transform(
        |    generate_series(1, 15), i -> CASE WHEN substr(pa, i, 1)
        |      <> substr(pb, i, 1) THEN 1 ELSE 0 END), 'sum') AS h FROM rnd)
        |SELECT pair_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS avg_hamming,
        |  CAST(max(h) AS BIGINT) AS max_hamming
        |FROM ham GROUP BY pair_type ORDER BY pair_type""".stripMargin
    ) { (s, dir) =>
      import graft.operators.Stage
      val dctTable = Seq(10000, 10000, 10000, 10000, 10000, 10000, 10000,
        10000, 9808, 8315, 5556, 1951, -1951, -5556, -8315, -9808,
        9239, 3827, -3827, -9239, -9239, -3827, 3827, 9239,
        8315, -1951, -9808, -5556, 5556, 9808, 1951, -8315,
        7071, -7071, -7071, 7071, 7071, -7071, -7071, 7071,
        5556, -9808, 1951, 8315, -8315, -1951, 9808, -5556,
        3827, -9239, 9239, -3827, -3827, 9239, -9239, 3827,
        1951, -5556, 8315, -9808, 9808, -8315, 5556, -1951).map(_.toLong)
      val docs = Tables(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .select(Q.plantedId(col("doc_id"), 100000).as("doc_id"),
            expr("substr(text, 1, length(text) - 1)").as("text")))
      // The DCT runs as ROW explosion + codegen'd partial aggs, NOT a
      // chain of nested higher-order-function lambdas: a producer
      // column referenced inside a consumer's lambda is re-evaluated
      // once per lambda ITERATION after CollapseProject merges the
      // projects, so a 3-deep HOF chain (energies → row-DCT → col-DCT)
      // multiplies to ~10¹⁰ interpreted ops per row (measured: minutes
      // at sf0.001; this shape runs in milliseconds and is the form
      // that scales anyway — every pass is a hash-partitioned partial
      // agg inside whole-stage codegen).
      val tt = typedLit(dctTable)
      val en = graft.operators.Par.fan(corpus) // guide §2.5: parallelize the per-row signature pass
        .withColumn("f", explode(sequence(lit(0), lit(63))))
        .withColumn("frame",
          col("text").substr((col("f") * 4 + 1).cast("int"), lit(4)))
        .select(col("doc_id"), col("f"),
          aggregate(
            transform(filter(split(col("frame"), ""), c => c =!= ""),
              // % 256: int64 headroom by construction (see header)
              c => (pmod(ascii(c), lit(256)) * pmod(ascii(c), lit(256)))
                .cast("long")),
            lit(0L), (a, x) => a + x).as("e"))
      // separable 2D DCT: rows pass R(x,v) = Σ_y e(x,y)·T[v,y], then
      // columns pass C(u,v) = Σ_x R(x,v)·T[u,x]
      val rr = en
        .select(col("doc_id"), (col("f") / 8).cast("int").as("x"),
          (col("f") % 8).as("y"), col("e"))
        .withColumn("v", explode(sequence(lit(0), lit(7))))
        .groupBy(col("doc_id"), col("x"), col("v"))
        .agg(sum(col("e") *
          element_at(tt, (col("v") * 8 + col("y") + 1).cast("int"))).as("r"))
      val dd = rr
        .withColumn("u", explode(sequence(lit(0), lit(7))))
        .groupBy(col("doc_id"), col("u"), col("v"))
        .agg(sum(col("r") *
          element_at(tt, (col("u") * 8 + col("x") + 1).cast("int"))).as("c"))
      val sig = dd
        .filter(col("u") < 4 && col("v") < 4 &&
          !(col("u") === 0 && col("v") === 0))
        .select(col("doc_id"), (col("u") * 8 + col("v")).as("j"), col("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("ts"),
          sort_array(collect_list(struct(col("j"), col("c")))).as("cs"))
        .select(col("doc_id"),
          conv(array_join(transform(col("cs"), s =>
            when(s("c") * 15 > col("ts"), lit("1")).otherwise(lit("0"))), ""),
            2, 10).cast("long").as("pbits"))
        .transform(Stage.stage) // one signature pass feeds both pair studies
      val dup = sig.as("a")
        .filter(col("a.doc_id") % 10 === 0 && col("a.doc_id") < 100000)
        .join(sig.as("b"), col("b.doc_id") === col("a.doc_id") + 100000)
        .select(lit("dup").as("pair_type"),
          bit_count(col("a.pbits").bitwiseXOR(col("b.pbits"))).as("h"))
      val rnd = sig.as("a").filter(col("a.doc_id") < 100000)
        .join(sig.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1 && col("b.doc_id") < 100000)
        .select(lit("rand").as("pair_type"),
          bit_count(col("a.pbits").bitwiseXOR(col("b.pbits"))).as("h"))
      dup.unionByName(rnd)
        .groupBy(col("pair_type"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          // exact integer sum, ONE double division (avg()'s incremental
          // path isn't bit-identical across engines)
          round(sum(col("h")).cast("double") / count(lit(1)), 6)
            .as("avg_hamming"),
          max(col("h")).cast("long").as("max_hamming"))
        .orderBy(col("pair_type"))
    },

    // ---------------------------------------------------------------
    // mm14 — landmark audio fingerprinting (the Shazam constellation,
    // Wang ISMIR 2003, re-expressed as dataflow): per clip, energy
    // PEAKS (strict-left / non-strict-right local maxima — the
    // asymmetry keeps plateaus from double-counting) become landmarks;
    // each landmark pairs with the next landmarks in a 6-frame target
    // zone, and the fingerprint key hashes (e1, e2, Δframe) —
    // TIME-SHIFT INVARIANT by construction, because the key carries
    // only relative structure. Matching is the inverted index as an
    // equi-join on the key; a true copy shows a DOMINANT consistent
    // anchor-offset delta (the vote histogram), random collisions
    // scatter across deltas and die under the ≥4-vote floor. Planted
    // truth: every 10th clip (≥96 chars) re-ingested with its first
    // 32 bytes (2 frames) cut — a frame-aligned crop, which the
    // detector must match at offset_delta exactly +2.
    // Keys carry EXACT energies, measured lesson: a first cut
    // quantized them (e div 1000, real-audio robustness theater), and
    // the key vocabulary SATURATED — at 10× rows the per-key
    // multiplicity histogram went from Σm²=798k/max 49 to
    // Σm²=204.6M/max 1168 (256× candidate output for 14× input; soak
    // ratio 18). The stub's crop transform is exact, so exact keys
    // keep the detection contract while multiplicity tracks TRUE
    // duplication (Σm² 14× for 14× input, max 5 at both scales). With
    // real noisy audio the keys must coarsen again — and then
    // ALL-PAIRS matching is off the table: quantized-key matching has
    // to be probe-vs-index (a bounded incoming batch against the
    // catalog), exactly mm05/mm06's collision-rare-band lesson.
    // Scale posture: peaks from a doc_id-partitioned window; pairing
    // is a per-clip self-equi-join bounded by the 64-frame budget;
    // candidate matching is ONE equi-join on the fingerprint key
    // (index-shaped, never clip×clip); votes are a partial agg.
    Q(
      "mm14_audio_fingerprint",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, substr(text, 33) AS text
        |  FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 96),
        |fr AS (
        |  SELECT doc_id, f,
        |    CAST(list_aggregate(list_transform(
        |      generate_series(CAST(f * 16 + 1 AS BIGINT),
        |        CAST(least(f * 16 + 16, length(text)) AS BIGINT)),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1))
        |         * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |      'sum') AS BIGINT) AS e
        |  FROM corpus
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS f) g
        |  WHERE f < ceil(length(text) / 16.0)),
        |pk AS (
        |  SELECT doc_id, f, e FROM (
        |    SELECT doc_id, f, e,
        |      lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS ep,
        |      lead(e) OVER (PARTITION BY doc_id ORDER BY f) AS en
        |    FROM fr) t
        |  WHERE ep IS NOT NULL AND en IS NOT NULL AND e > ep AND e >= en),
        |fp AS (
        |  SELECT p1.doc_id AS doc_id, p1.f AS anchor,
        |    md5(CAST(p1.e AS VARCHAR) || ':' ||
        |        CAST(p2.e AS VARCHAR) || ':' ||
        |        CAST(p2.f - p1.f AS VARCHAR)) AS k
        |  FROM pk p1 JOIN pk p2 ON p2.doc_id = p1.doc_id
        |    AND p2.f - p1.f BETWEEN 1 AND 6),
        |m AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.anchor - b.anchor AS offset_delta
        |  FROM fp a JOIN fp b ON a.k = b.k AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, CAST(offset_delta AS BIGINT) AS offset_delta,
        |  CAST(count(*) AS BIGINT) AS votes
        |FROM m GROUP BY 1, 2, 3 HAVING count(*) >= 4
        |ORDER BY a_id, b_id, offset_delta""".stripMargin
    ) { (s, dir) =>
      import graft.operators.Stage
      val docs = Tables(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 10 === 0 && length(col("text")) >= 96)
          .select(Q.plantedId(col("doc_id"), 100000).as("doc_id"),
            expr("substr(text, 33)").as("text")))
      val fr = graft.operators.Par.fan(corpus) // guide §2.5: parallelize the per-row signature pass
        .withColumn("f", explode(sequence(lit(0L), least(
          ceil(length(col("text")) / 16.0).cast("long") - 1, lit(63L)))))
        .withColumn("frame",
          col("text").substr((col("f") * 16 + 1).cast("int"), lit(16)))
        .select(col("doc_id"), col("f"),
          aggregate(
            transform(split(col("frame"), ""),
              c => (ascii(c) * ascii(c)).cast("long")),
            lit(0L), (acc, x) => acc + x).as("e"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      val pk = fr
        .withColumn("ep", lag(col("e"), 1).over(w))
        .withColumn("en", lead(col("e"), 1).over(w))
        .filter(col("ep").isNotNull && col("en").isNotNull &&
          col("e") > col("ep") && col("e") >= col("en"))
        .select(col("doc_id"), col("f"), col("e"))
      val fp = pk.as("p1")
        .join(pk.as("p2"),
          col("p2.doc_id") === col("p1.doc_id") &&
            col("p2.f") - col("p1.f") >= 1 && col("p2.f") - col("p1.f") <= 6)
        .select(col("p1.doc_id").as("doc_id"), col("p1.f").as("anchor"),
          md5(concat_ws(":", col("p1.e"), col("p2.e"),
            (col("p2.f") - col("p1.f")))).as("k"))
        .transform(Stage.stage) // one fingerprint pass feeds both join sides
      fp.as("a")
        .join(fp.as("b"),
          col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          (col("a.anchor") - col("b.anchor")).as("offset_delta"))
        .groupBy(col("a_id"), col("b_id"), col("offset_delta"))
        .agg(count(lit(1)).cast("long").as("votes"))
        .filter(col("votes") >= 4)
        .select(col("a_id"), col("b_id"),
          col("offset_delta").cast("long").as("offset_delta"), col("votes"))
        .orderBy(col("a_id"), col("b_id"), col("offset_delta"))
    },

    // ---------------------------------------------------------------
    // mm15 — keyframe selection per shot (the step after mm11's shot
    // bounds: a video pipeline embeds ONE representative frame per
    // shot, not all frames): frames and their squared-ASCII energies
    // under mm03/mm11's 16-char-frame 64-frame-cap contract; a shot
    // starts where the energy jump exceeds mm11's threshold; the
    // keyframe is the shot's max-energy frame (ties → earliest, so
    // the argmax is a total order and both engines agree). Per (clip,
    // shot): start frame, length, keyframe index + energy. Shape at
    // 100 TB: the frame explode is bounded 64×, ONE doc_id exchange
    // serves the lag window, the cumulative shot-id window, and the
    // (doc, shot) agg — the argmax is an exact integer max(struct),
    // never a per-shot sort.
    Q(
      "mm15_keyframes",
      """WITH fr AS (
        |  SELECT doc_id, f,
        |    CAST(list_aggregate(list_transform(
        |      generate_series(CAST(f * 16 + 1 AS BIGINT),
        |        CAST(least(f * 16 + 16, length(text)) AS BIGINT)),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1))
        |        * ascii(substr(text, CAST(i AS INTEGER), 1))),
        |      'sum') AS BIGINT) AS energy
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS f) g
        |  WHERE f < ceil(length(text) / 16.0)),
        |d AS (
        |  SELECT doc_id, f, energy,
        |    CASE WHEN abs(energy - lag(energy) OVER (
        |      PARTITION BY doc_id ORDER BY f)) > 20000 THEN 1 ELSE 0 END
        |      AS cut
        |  FROM fr),
        |sh AS (
        |  SELECT doc_id, f, energy,
        |    1 + sum(cut) OVER (PARTITION BY doc_id ORDER BY f
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot
        |  FROM d),
        |rk AS (
        |  SELECT doc_id, shot, f, energy,
        |    row_number() OVER (PARTITION BY doc_id, shot
        |      ORDER BY energy DESC, f ASC) AS rn
        |  FROM sh)
        |SELECT doc_id, CAST(shot AS BIGINT) AS shot,
        |  CAST(min(f) AS BIGINT) AS start_f,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(max(CASE WHEN rn = 1 THEN f END) AS BIGINT) AS key_f,
        |  CAST(max(CASE WHEN rn = 1 THEN energy END) AS BIGINT)
        |    AS key_energy
        |FROM rk GROUP BY doc_id, shot
        |ORDER BY doc_id, shot""".stripMargin
    ) { (s, dir) =>
      val fr = Tables(s, dir, "documents")
        .withColumn("f", explode(sequence(lit(0L), least(
          ceil(length(col("text")) / 16.0).cast("long") - 1, lit(63L)))))
        .withColumn("frame",
          col("text").substr((col("f") * 16 + 1).cast("int"), lit(16)))
        .select(col("doc_id"), col("f"),
          aggregate(
            transform(split(col("frame"), ""), c => ascii(c) * ascii(c)),
            lit(0L), (acc, x) => acc + x).as("energy"))
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      val cum = byDoc.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      fr.withColumn("cut",
          when(abs(col("energy") - lag(col("energy"), 1).over(byDoc))
            > 20000, 1L).otherwise(0L))
        .withColumn("shot", lit(1L) + sum(col("cut")).over(cum))
        .groupBy(col("doc_id"), col("shot"))
        .agg(min(col("f")).cast("long").as("start_f"),
          count(lit(1)).cast("long").as("n_frames"),
          max(struct(col("energy").as("energy"),
            (-col("f")).as("negf"))).as("kf"))
        .select(col("doc_id"), col("shot").cast("long").as("shot"),
          col("start_f"), col("n_frames"),
          (-col("kf.negf")).cast("long").as("key_f"),
          col("kf.energy").cast("long").as("key_energy"))
        .orderBy(col("doc_id"), col("shot"))
    }
  )
}
