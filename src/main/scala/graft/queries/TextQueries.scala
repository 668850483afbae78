package graft.queries

import graft.{Q, Tables}
import graft.operators.{DedupOps, Stage, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis suite over `documents`: language-ID (character-trigram
  * profiles), quality scoring, token counting, fingerprinting.
  *
  * Scale posture (100 TB): language profiles are trained with one
  * explode + two-level aggregation (map-side partial agg), the profile
  * table is tiny and broadcast for classification; everything else is a
  * single stateless projection pass per document.
  */
object TextQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // t01 — language ID: per-lang top-20 character trigrams (count desc,
    // trigram asc), weight 21-rank; a doc's score per lang sums weights
    // of its distinct trigrams; argmax (ties → lang asc).
    Q(
      "t01_langid_ngram",
      """WITH tri AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, length(text) - 2),
        |      i -> substr(text, i, 3))) AS g
        |  FROM documents),
        |counts AS (SELECT lang, g, count(*) AS c FROM tri GROUP BY lang, g),
        |profile AS (
        |  SELECT lang AS p_lang, g, 21 - rank AS weight FROM (
        |    SELECT lang, g, c, row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, g ASC) AS rank FROM counts) r
        |  WHERE rank <= 20),
        |doc_tri AS (SELECT DISTINCT doc_id, lang, g FROM tri),
        |scores AS (
        |  SELECT d.doc_id, d.lang, p.p_lang, sum(p.weight) AS score
        |  FROM doc_tri d JOIN profile p ON d.g = p.g
        |  GROUP BY d.doc_id, d.lang, p.p_lang)
        |SELECT doc_id, lang, p_lang AS predicted, CAST(score AS BIGINT) AS score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, p_lang ASC) AS rn FROM scores) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      langPredictions(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("predicted"),
          col("score").cast("long").as("score"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t02 — quality scoring: deterministic ratio features + linear blend.
    Q(
      "t02_quality_score",
      """WITH f AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ts,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS n,
        |    CAST(len(list_filter(ts, x -> x = 'a' OR x = 'the'))
        |      AS BIGINT) AS s,
        |    CAST(len(list_distinct(ts)) AS BIGINT) AS u,
        |    n_chars - CAST(len(ts) AS BIGINT) + 1 AS mnum
        |  FROM f)
        |SELECT doc_id, n AS n_tokens,
        |  CAST((s * 2000000 + n) // (2 * n) AS DOUBLE) / 1000000.0
        |    AS stopword_ratio,
        |  CAST((u * 2000000 + n) // (2 * n) AS DOUBLE) / 1000000.0
        |    AS unique_ratio,
        |  CAST((mnum * 2000000 + n) // (2 * n) AS DOUBLE) / 1000000.0
        |    AS mean_token_len,
        |  CAST(((8 * (n - s) + 16 * u + least(mnum, 8 * n)) * 2000000
        |      + 32 * n) // (64 * n) AS DOUBLE) / 1000000.0 AS quality
        |FROM g ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextOps.qualityScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t03 — token counting: whitespace tokens, BPE-ish regex tokens
    // (letter runs / digit runs / single punctuation), chars, and the
    // ~4-chars-per-token BPE estimate.
    Q(
      "t03_token_counts",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_regex_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(floor((length(text) + 3) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(DedupOps.words(col("text"))).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
          .as("n_regex_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        floor((length(col("text")) + 3) / 4.0).cast("long").as("est_bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t04 — document fingerprinting: md5 over the whitespace-normalized
    // text, plus the minimum character-8-gram hash (a 1-permutation
    // winnowing fingerprint — robust to local edits).
    Q(
      "t04_fingerprint",
      """WITH f AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ') AS norm,
        |    text
        |  FROM documents)
        |SELECT doc_id,
        |  md5(norm) AS fp_norm,
        |  list_min(list_transform(generate_series(1, length(text) - 7),
        |    i -> md5(substr(text, i, 8)))) AS fp_min8
        |FROM f ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        md5(concat_ws(" ", DedupOps.words(col("text")))).as("fp_norm"),
        array_min(transform(TextOps.charNgrams(col("text"), 8), g => md5(g)))
          .as("fp_min8"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t05 — PII redaction: emails and URLs replaced by placeholder
    // tokens, with per-doc match counts (the scrub pass every
    // training-data pipeline runs). The fixture deterministically
    // injects PII since the corpus has none; patterns are kept in the
    // Java∩RE2 regex subset so both engines agree.
    Q(
      "t05_pii_redaction",
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com or https://site' || doc_id || '.example/p' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(t, 'https?://[a-z0-9./]+', '<URL>', 'g'),
        |    '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, 'https?://[a-z0-9./]+')) AS BIGINT) AS n_urls
        |FROM aug ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("t", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or https://site"),
          col("doc_id"), lit(".example/p")))
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("t"), lit("https?://[a-z0-9./]+"), lit("<URL>")),
            lit("[a-z0-9]+@[a-z0-9.]+"), lit("<EMAIL>")).as("redacted"),
          size(regexp_extract_all(col("t"),
            lit("[a-z0-9]+@[a-z0-9.]+"), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(col("t"),
            lit("https?://[a-z0-9./]+"), lit(0))).cast("long").as("n_urls"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t06 — repetition ratios (Gopher/C4-style quality signals): the
    // fraction of duplicate word bigrams and duplicate words — high
    // values flag boilerplate/spam for filtering.
    Q(
      "t06_repetition_ratio",
      """WITH f AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, ws,
        |    CASE WHEN len(ws) >= 2 THEN list_transform(generate_series(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1]) ELSE [] END AS bg
        |  FROM f)
        |SELECT doc_id,
        |  round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS dup_word_ratio,
        |  round(CASE WHEN len(bg) > 0
        |    THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |    ELSE 0.0 END, 6) AS dup_bigram_ratio
        |FROM g ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("ws", DedupOps.words(col("text")))
        .withColumn("bg", DedupOps.shingles(col("ws"), 2))
        .select(col("doc_id"),
          round(lit(1.0) -
            size(array_distinct(col("ws"))).cast("double") / size(col("ws")), 6)
            .as("dup_word_ratio"),
          round(when(size(col("bg")) > 0,
            lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
              size(col("bg"))).otherwise(0.0), 6)
            .as("dup_bigram_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t07 — TF-IDF keyword extraction: top-5 terms per document by
    // tf·ln(N/df), ties to the lexicographically smaller term. Shape at
    // 100 TB: term frequencies are a two-level hash aggregation,
    // document frequency is a second aggregation joined back on the
    // term (equi-key, shuffled hash join — the vocabulary is NOT
    // assumed broadcastable), the corpus size N rides along as a
    // one-row broadcast, and the per-doc top-5 runs through GroupTopK
    // (at most 5 rows per (doc, partition) reach the exchange, never
    // the full scored list). Ranking uses the round(6) score so both
    // engines order identically (Math.log vs libm log differ in the
    // last ulp).
    Q(
      "t07_tfidf_keywords",
      """WITH w AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.term,
        |    round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term ASC) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tfidf, rank FROM ranked
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val w = docs.select(col("doc_id"),
        explode(DedupOps.words(col("text"))).as("term"))
      val tf = Stage.stage(w.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
      // tf already holds one row per (doc, term), so document frequency
      // is a plain count over it — no second corpus tokenization and no
      // count(DISTINCT) expansion
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(df, Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 6)
            .as("tfidf"))
      graft.plans.GroupTopK.topKRanked(scored, Seq(col("doc_id")), 5, "rank",
          col("tfidf").desc, col("term").asc)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // ---------------------------------------------------------------
    // t08 — Unicode NFC normalization before fingerprinting: the same
    // logical text arriving composed ("é") or decomposed ("e"+U+0301)
    // must hash identically, or dedup (d01) silently misses cross-source
    // duplicates. The fixture decorates each document with a decomposed
    // prefix (e + combining acute) and a decomposed suffix (A + combining
    // ring); both engines canonically compose them (JDK Normalizer ≡
    // DuckDB nfc_normalize), so the hashes and the 2-codepoint length
    // contraction must agree. Native codegen'd expression
    // (functions/NfcNormalize) — single stateless projection pass, the
    // 100 TB shape; ASCII bodies take the isNormalized fast path and
    // allocate nothing.
    Q(
      "t08_nfc_normalize",
      """SELECT doc_id,
        |  md5(nfc_normalize('e' || chr(769) || text || 'A' || chr(778))) AS nfc_hash,
        |  CAST(length('e' || chr(769) || text || 'A' || chr(778))
        |    - length(nfc_normalize('e' || chr(769) || text || 'A' || chr(778)))
        |    AS BIGINT) AS composed_away
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // decomposed on purpose: e + U+0301 (combining acute), A + U+030A
      // (combining ring) — NFC composes both to single code points
      val decorated = concat(lit("é"), col("text"), lit("Å"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          md5(TextOps.nfc(decorated)).as("nfc_hash"),
          (length(decorated) - length(TextOps.nfc(decorated)))
            .cast("bigint").as("composed_away"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t09 — statistical LM perplexity scoring (the CCNet/Gopher-style
    // quality filter): a bigram model with add-one smoothing is trained
    // on the corpus itself, then every document is scored by its average
    // bigram log-probability and perplexity — fluent text scores low
    // ppl, gibberish high. Shape at 100 TB: the LM IS a table (bigram
    // counts + context counts), never a driver-side model — both are
    // one partial-agg'd shuffle each, scoring joins the instance stream
    // back on the bigram key (vocabulary-scale, NOT assumed
    // broadcastable — same discipline as t07's df join), and the per-doc
    // reduce is keyed by doc_id. Determinism: each bigram's
    // ln((c2+1)/(c1+V)) is rounded to 6 decimals (t07's ln contract —
    // Math.log vs libm differ in the last ulp), summed EXACTLY as
    // DECIMAL so per-doc accumulation is order-free, then one cast back.
    // Sub-bigram docs (nw < 2) keep an accounting row with NULL scores
    // (d09's short-doc lesson), pinned by BigramPplSpec since no fixture
    // doc is that short.
    Q(
      "t09_bigram_ppl",
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM ws WHERE len(w) >= 2),
        |bgc AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
        |        FROM bg GROUP BY 1),
        |voc AS (SELECT count(DISTINCT t) AS vocab
        |        FROM (SELECT unnest(w) AS t FROM ws)),
        |inst AS (
        |  SELECT doc_id,
        |    round(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + vocab AS DOUBLE)), 6)
        |      AS lp
        |  FROM bg JOIN bgc USING (bg)
        |  JOIN ctx ON ctx.w1 = split_part(bg.bg, ' ', 1)
        |  CROSS JOIN voc),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) AS slp
        |  FROM inst GROUP BY doc_id)
        |SELECT w.doc_id,
        |  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  slp / n_bigrams AS avg_logprob,
        |  round(exp(-(slp / n_bigrams)), 6) AS ppl
        |FROM ws w LEFT JOIN perdoc p ON w.doc_id = p.doc_id
        |ORDER BY w.doc_id""".stripMargin
    ) { (s, dir) =>
      val ws = Tables(s, dir, "documents")
        .select(col("doc_id"), DedupOps.words(col("text")).as("w"))
      // staged: the bigram instance stream feeds the model (bgc/ctx)
      // AND the scoring join — one tokenization pass, three consumers
      val bg = Stage.stage(ws.select(col("doc_id"),
        explode(when(size(col("w")) >= 2,
            expr("transform(sequence(1, size(w) - 1)," +
              " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
          .otherwise(array().cast("array<string>"))).as("bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1)))
      val bgc = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
      val ctx = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val voc = ws.select(explode(col("w")).as("t"))
        .agg(count_distinct(col("t")).as("vocab"))
      val inst = bg.join(bgc, Seq("bg")).join(ctx, Seq("w1"))
        .crossJoin(broadcast(voc))
        .select(col("doc_id"),
          round(log((col("c2") + 1).cast("double")
            / (col("c1") + col("vocab")).cast("double")), 6).as("lp"))
      val perDoc = inst.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("lp").cast("decimal(28,6)")).cast("double").as("slp"))
      // the per-doc average is NOT rounded: slp is an exact 6-decimal
      // DECIMAL sum, so slp/n is the same IEEE division in both
      // engines — while round(slp/n, 6) sits one count away from a
      // 7th-decimal half boundary whenever n divides slp into an
      // exact …5, where Spark's decimal-string HALF_UP and DuckDB's
      // binary-double rounding disagree (first hit at sf0.1, doc with
      // slp/n = -3.3883295)
      val avg = col("slp") / col("n_bigrams")
      ws.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).cast("long").as("n_bigrams"),
          avg.as("avg_logprob"),
          round(exp(-avg), 6).as("ppl"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t10 — the Gopher rule battery (Rae et al. 2021, table A1): the
    // standard hard-threshold quality filter every web-scale pipeline
    // runs BEFORE model-based scoring (t02/t09 are the soft scores; t10
    // is the rule gate). Seven rules with the paper's thresholds: word
    // count in [50, 100k], mean word length in [3, 10], symbol-to-word
    // ratio <= 0.1, >= 80% words with an alphabetic char, >= 2
    // stopwords, <= 90% bullet lines, <= 30% ellipsis lines. The
    // fixture corpus has no symbols/lines, so — t05's PII-injection
    // pattern — the query deterministically augments docs keyed by
    // doc_id ('#' tokens for %13/%7; 10-word lines; '- ' bullets for
    // %9; '...' for %11), making every injected rule genuinely fire
    // (sf0.01: 166/500 pass all; each rule individually discriminates).
    // Determinism: every threshold compares INTEGERS (10*nsym <= nw,
    // not nsym/nw <= 0.1) so no float boundary can disagree between
    // engines; mean_word_len is reported rounded but gated via
    // sumlen-vs-3*nw / 10*nw integer bounds. Shape at 100 TB: one
    // stateless projection pass per document — no shuffle at all
    // except the final presentation sort.
    Q(
      "t10_gopher_rules",
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ts0
        |  FROM documents),
        |aug AS (
        |  SELECT doc_id, list_concat(ts0, list_transform(generate_series(1,
        |    CASE WHEN doc_id % 13 = 0 THEN CAST(ceil(len(ts0) / 3.0) AS BIGINT)
        |         WHEN doc_id % 7 = 0 THEN CAST(ceil(len(ts0) / 8.0) AS BIGINT)
        |         ELSE 0 END), i -> '#')) AS ts
        |  FROM base),
        |lined AS (
        |  SELECT doc_id, ts,
        |    list_transform(generate_series(0, CAST(ceil(len(ts) / 10.0) AS BIGINT) - 1),
        |      i -> CASE WHEN doc_id % 9 = 0 THEN '- ' ELSE '' END ||
        |           array_to_string(ts[i*10+1:i*10+10], ' ') ||
        |           CASE WHEN doc_id % 11 = 0 THEN '...' ELSE '' END) AS lines
        |  FROM aug),
        |feat AS (
        |  SELECT doc_id, len(ts) AS nw, len(lines) AS nl,
        |    len(list_filter(ts, w -> w = '#')) AS nsym,
        |    len(list_filter(ts, w -> regexp_matches(w, '[a-z]'))) AS nalpha,
        |    len(list_filter(ts, w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS nstop,
        |    length(array_to_string(ts, '')) AS sumlen,
        |    len(list_filter(lines, l -> l LIKE '- %')) AS nbullet,
        |    len(list_filter(lines, l -> l LIKE '%...')) AS nell
        |  FROM lined)
        |SELECT doc_id,
        |  CAST(nw AS BIGINT) AS n_words, CAST(nl AS BIGINT) AS n_lines,
        |  round(CAST(sumlen AS DOUBLE) / nw, 6) AS mean_word_len,
        |  nw >= 50 AND nw <= 100000 AS r_word_count,
        |  sumlen >= 3 * nw AND sumlen <= 10 * nw AS r_mean_word_len,
        |  10 * nsym <= nw AS r_symbol_ratio,
        |  5 * nalpha >= 4 * nw AS r_alpha_words,
        |  nstop >= 2 AS r_stopwords,
        |  10 * nbullet <= 9 * nl AS r_bullet_lines,
        |  10 * nell <= 3 * nl AS r_ellipsis_lines,
        |  nw >= 50 AND nw <= 100000 AND sumlen >= 3 * nw AND sumlen <= 10 * nw
        |    AND 10 * nsym <= nw AND 5 * nalpha >= 4 * nw AND nstop >= 2
        |    AND 10 * nbullet <= 9 * nl AND 10 * nell <= 3 * nl AS pass
        |FROM feat ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val ts0 = DedupOps.words(col("text"))
      val extra = when(col("doc_id") % 13 === 0,
          ceil(size(col("ts0")) / 3.0).cast("int"))
        .when(col("doc_id") % 7 === 0,
          ceil(size(col("ts0")) / 8.0).cast("int"))
        .otherwise(lit(0))
      val aug = Tables(s, dir, "documents")
        .select(col("doc_id"), ts0.as("ts0"))
        .select(col("doc_id"),
          concat(col("ts0"), array_repeat(lit("#"), extra)).as("ts"))
      // 10-word lines with deterministic bullet/ellipsis decoration;
      // sequence(0, nl-1) is safe: ts is never empty, so nl >= 1
      val lines = transform(
        sequence(lit(0), ceil(size(col("ts")) / 10.0).cast("int") - 1),
        i => concat(
          when(col("doc_id") % 9 === 0, lit("- ")).otherwise(lit("")),
          concat_ws(" ", slice(col("ts"), i * 10 + 1, lit(10))),
          when(col("doc_id") % 11 === 0, lit("...")).otherwise(lit(""))))
      val feat = aug.select(col("doc_id"), col("ts"), lines.as("lines"))
        .select(col("doc_id"),
          size(col("ts")).as("nw"), size(col("lines")).as("nl"),
          size(filter(col("ts"), w => w === "#")).as("nsym"),
          size(filter(col("ts"), w => w.rlike("[a-z]"))).as("nalpha"),
          size(filter(col("ts"),
            w => w.isin("the", "a", "and", "of", "to"))).as("nstop"),
          length(array_join(col("ts"), "")).as("sumlen"),
          size(filter(col("lines"), l => l.startsWith("- "))).as("nbullet"),
          size(filter(col("lines"), l => l.endsWith("..."))).as("nell"))
      val rWc = col("nw") >= 50 && col("nw") <= 100000
      val rMwl = col("sumlen") >= lit(3) * col("nw") &&
        col("sumlen") <= lit(10) * col("nw")
      val rSym = lit(10) * col("nsym") <= col("nw")
      val rAlpha = lit(5) * col("nalpha") >= lit(4) * col("nw")
      val rStop = col("nstop") >= 2
      val rBullet = lit(10) * col("nbullet") <= lit(9) * col("nl")
      val rEll = lit(10) * col("nell") <= lit(3) * col("nl")
      feat.select(col("doc_id"),
          col("nw").cast("long").as("n_words"),
          col("nl").cast("long").as("n_lines"),
          round(col("sumlen").cast("double") / col("nw"), 6)
            .as("mean_word_len"),
          rWc.as("r_word_count"), rMwl.as("r_mean_word_len"),
          rSym.as("r_symbol_ratio"), rAlpha.as("r_alpha_words"),
          rStop.as("r_stopwords"), rBullet.as("r_bullet_lines"),
          rEll.as("r_ellipsis_lines"),
          (rWc && rMwl && rSym && rAlpha && rStop && rBullet && rEll)
            .as("pass"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t11 — blocklist term matching (the LDNOOBW-style safety filter
    // every web pipeline runs): tokens joined against a term list with
    // severities; a doc is flagged when it accumulates ≥ 2 hits or any
    // severity-3 term. The term list is a TABLE, not a literal-array
    // membership test — real blocklists run to 10⁴ terms across
    // languages, so the join side must be data, broadcast because it
    // is small relative to the corpus, never because it is bounded by
    // the query text. Fixture docs carry no blocklist terms, so t05's
    // injection pattern plants them: %6 docs get one 'badx' + one
    // 'bady' (2 hits → flagged by count), %13 docs get 'badz'
    // (severity 3 → flagged by severity; %78 docs trip both rules).
    // 'badq' sits in the list but never in the corpus (the join must
    // not fabricate hits). Clean docs keep a zero-hit accounting row
    // (d09's lesson): the hit aggregate LEFT-joins back to the corpus.
    // Shape at 100 TB: explode tokens → broadcast hash join on the
    // term → one partial-agg'd doc_id reduce; the corpus never
    // shuffles on the token.
    Q(
      "t11_blocklist",
      """WITH terms(term, severity) AS (
        |  VALUES ('badx', 1), ('bady', 2), ('badz', 3), ('badq', 3)),
        |aug AS (
        |  SELECT doc_id,
        |    text ||
        |    (CASE WHEN doc_id % 6 = 0 THEN ' badx bady' ELSE '' END) ||
        |    (CASE WHEN doc_id % 13 = 0 THEN ' badz' ELSE '' END) AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> x <> '')) AS w
        |  FROM aug),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits,
        |    count(DISTINCT tm.term) AS n_terms,
        |    max(tm.severity) AS max_sev
        |  FROM toks JOIN terms tm ON toks.w = tm.term
        |  GROUP BY doc_id)
        |SELECT a.doc_id,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(h.n_terms, 0) AS BIGINT) AS n_terms,
        |  CAST(coalesce(h.max_sev, 0) AS INT) AS max_severity,
        |  coalesce(h.n_hits, 0) >= 2 OR coalesce(h.max_sev, 0) >= 3 AS flagged
        |FROM aug a LEFT JOIN hits h ON a.doc_id = h.doc_id
        |ORDER BY a.doc_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val terms = Seq(("badx", 1), ("bady", 2), ("badz", 3), ("badq", 3))
        .toDF("term", "severity")
      val aug = Tables(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 6 === 0, lit(" badx bady")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" badz")).otherwise(lit("")))
          .as("t"))
      val toks = aug.select(col("doc_id"),
        explode(graft.operators.DedupOps.words(col("t"))).as("w"))
      val hits = toks.join(broadcast(terms), col("w") === col("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("term")).as("n_terms"),
          max(col("severity")).as("max_sev"))
      aug.select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).cast("long").as("n_hits"),
          coalesce(col("n_terms"), lit(0L)).cast("long").as("n_terms"),
          coalesce(col("max_sev"), lit(0)).cast("int").as("max_severity"),
          (coalesce(col("n_hits"), lit(0L)) >= 2 ||
            coalesce(col("max_sev"), lit(0)) >= 3).as("flagged"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t12 — Flesch-Kincaid readability grade (the classic education-
    // quality signal): 0.39·(words/sentences) + 11.8·(syllables/words)
    // − 15.59. Syllables use the standard vowel-group proxy
    // (max(1, count of [aeiou]+ runs) per word); the fixture has no
    // sentence punctuation, so sentences are the deterministic
    // ceil(words/10) proxy — the formula's shape, not a parser, is
    // what's under test. Counts are exact integers; the grade is an
    // exact RATIONAL (39·nw² + 1180·nsy·ns − 1559·ns·nw)/(100·ns·nw),
    // so (RoundTieSpec: 10 of 500 fixture grades sat exactly ON a
    // 4-decimal .5 boundary under the old two-IEEE-divisions form) the
    // 4-decimal rounding runs in exact BIGINT with a sign split
    // (HALF_UP = away-from-zero; both engines' integer division is
    // floor/trunc-identical on NON-negative operands only), then one
    // exact cast. Sentence proxy is the integer ceiling (nw+9) div 10
    // (q75's discipline). Headroom: num < 2⁶³/2e4 ⇒ docs to ~1e6
    // words at 1e5 sentences. Shape at 100 TB: one stateless
    // projection, no shuffle but the presentation sort.
    Q(
      "t12_readability",
      """WITH f AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS nw,
        |    (CAST(len(ws) AS BIGINT) + 9) // 10 AS ns,
        |    CAST(list_aggregate(list_transform(ws,
        |      w -> greatest(1, len(regexp_extract_all(w, '[aeiou]+')))),
        |      'sum') AS BIGINT) AS nsy
        |  FROM f),
        |d AS (
        |  SELECT doc_id, nw, ns, nsy,
        |    39 * nw * nw + 1180 * nsy * ns - 1559 * ns * nw AS num,
        |    100 * ns * nw AS den
        |  FROM c)
        |SELECT doc_id, nw AS n_words, ns AS n_sentences,
        |  nsy AS n_syllables,
        |  CAST(CASE WHEN num >= 0 THEN (num * 20000 + den) // (2 * den)
        |       ELSE -(((-num) * 20000 + den) // (2 * den)) END
        |    AS DOUBLE) / 10000.0 AS fk_grade
        |FROM d ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.TextOps.idiv
      val ws = graft.operators.DedupOps.words(col("text"))
      val counts = Tables(s, dir, "documents")
        .select(col("doc_id"), ws.as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("nw"),
          idiv(size(col("ws")).cast("long") + lit(9L), lit(10L))
            .as("ns"),
          aggregate(
            transform(col("ws"), w => greatest(lit(1),
              size(regexp_extract_all(w, lit("[aeiou]+"), lit(0))))),
            lit(0L), (acc, x) => acc + x).as("nsy"))
      val num = lit(39L) * col("nw") * col("nw") +
        lit(1180L) * col("nsy") * col("ns") -
        lit(1559L) * col("ns") * col("nw")
      val den = lit(100L) * col("ns") * col("nw")
      val e4 = when(num >= 0L,
        idiv(num * lit(20000L) + den, den * lit(2L)))
        .otherwise(-idiv((-num) * lit(20000L) + den, den * lit(2L)))
      counts.select(col("doc_id"), col("nw").as("n_words"),
          col("ns").as("n_sentences"), col("nsy").as("n_syllables"),
          (e4.cast("double") / lit(10000.0)).as("fk_grade"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t13 — encoding-damage (mojibake) detection: web-scale corpora
    // carry UTF-8-read-as-latin-1 double encodes ('é' → 'Ã©') and
    // U+FFFD replacement chars from lossy transcodes; both leave
    // fingerprint code points (Ã U+00C3, Â U+00C2, � U+FFFD) that
    // near-never occur in clean text. Damage is planted (%17 docs get
    // e/a double-encoded at id+400000; %23 docs get 1–3 U+FFFDs
    // appended at id+500000) and counted by pure replace/translate
    // LENGTH arithmetic — no regex, no unicode classes, so the count
    // is trivially engine-identical (Spark counts all three markers in
    // ONE translate; DuckDB, which lacks translate, sums three
    // replaces — same number). bad_ratio is a bigint/bigint IEEE
    // division, unrounded. Shape at 100 TB: a stateless projection —
    // usable as a scan-side filter with zero shuffles; the only
    // exchange here is the output sort.
    Q(
      "t13_mojibake",
      """WITH dup AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000,
        |    replace(replace(text, 'e', chr(195) || chr(169)),
        |            'a', chr(195) || chr(161))
        |  FROM documents WHERE doc_id % 17 = 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text || repeat(chr(65533), 1 + doc_id % 3)
        |  FROM documents WHERE doc_id % 23 = 0),
        |scored AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_t,
        |    CAST((length(text) - length(replace(text, chr(195), '')))
        |      + (length(text) - length(replace(text, chr(194), '')))
        |      + (length(text) - length(replace(text, chr(65533), '')))
        |      AS BIGINT) AS n_bad
        |  FROM dup)
        |SELECT doc_id, n_chars_t, n_bad,
        |  CAST(n_bad AS DOUBLE) / n_chars_t AS bad_ratio,
        |  n_bad > 0 AS damaged
        |FROM scored ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val dup = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select(Q.plantedId(col("doc_id"), 400000).as("doc_id"),
            regexp_replace(regexp_replace(col("text"),
              lit("e"), lit("Ã©")),
              lit("a"), lit("Ã¡")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 23 === 0)
          .select(Q.plantedId(col("doc_id"), 500000).as("doc_id"),
            concat(col("text"),
              expr("repeat('�', CAST(1 + doc_id % 3 AS INT))"))
              .as("text")))
      val nBad = (length(col("text")) -
        length(translate(col("text"), "ÃÂ�", "")))
        .cast("long")
      dup.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_t"),
          nBad.as("n_bad"))
        .select(col("doc_id"), col("n_chars_t"), col("n_bad"),
          (col("n_bad").cast("double") / col("n_chars_t")).as("bad_ratio"),
          (col("n_bad") > 0).as("damaged"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t14 — n-gram novelty scoring: what fraction of a doc's distinct
    // 8-word grams appears in NO earlier doc (first-seen = min doc_id
    // over the gram). Low novelty marks template/boilerplate-heavy
    // docs even when no single pair crosses a dedup threshold — the
    // corpus-level complement to d04's pairwise measure, and a
    // curriculum-ordering signal. Shape at 100 TB: the first-seen
    // aggregate and the join back are both keyed on the gram hash —
    // the t07/t09 discipline of never assuming the vocabulary is
    // broadcastable. The exploded gram table feeds BOTH consumers, so
    // it is staged once (the d14 trade — Stage.stage, reliable-mode
    // on a cluster) instead of recomputing the explode per consumer.
    // Docs under 8 words
    // keep an accounting row with n_grams = 0 and NULL novelty (the
    // d09 short-doc lesson; no fixture doc is that short, so the
    // contract is pinned here rather than by the gate). novelty is a
    // bigint/bigint IEEE division, unrounded.
    Q(
      "t14_ngram_novelty",
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
        |    AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(ws) - 7),
        |    i -> md5(array_to_string(ws[i:i+7], ' '))))) AS gh
        |  FROM toks WHERE len(ws) >= 8),
        |fs AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY gh),
        |pd AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(count(CASE WHEN fs.first_doc = g.doc_id THEN 1 END)
        |      AS BIGINT) AS n_novel
        |  FROM g JOIN fs USING (gh) GROUP BY g.doc_id)
        |SELECT t.doc_id,
        |  CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(n_novel AS DOUBLE) / n_grams AS novelty
        |FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id
        |ORDER BY t.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.operators.DedupOps
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), DedupOps.words(col("text")).as("ws"))
      val g = toks.filter(size(col("ws")) >= 8)
        .select(col("doc_id"),
          explode(array_distinct(transform(DedupOps.shingles(col("ws"), 8),
            x => md5(x)))).as("gh"))
        .transform(graft.operators.Stage.stage)
      val fs = g.groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
      val pd = g.join(fs, Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_grams"),
          count(when(col("first_doc") === col("doc_id"), 1))
            .cast("long").as("n_novel"))
      toks.select(col("doc_id"))
        .join(pd, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).cast("long").as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).cast("long").as("n_novel"),
          (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t15 — per-document character entropy (nats): Shannon entropy of
    // the character distribution, the cheap gibberish/mojibake/
    // binary-spill signal (natural text sits ~2.8–3.3 nats; runs of
    // one char or base64 spill move it far in either direction).
    // Characters come from sequence+substring by CODEPOINT — the
    // representation both engines index identically (an empty-regex
    // split would shear surrogate pairs in the JVM but not DuckDB).
    // Determinism: each term (n_c/n)·ln(n_c/n) is one IEEE op pair
    // from exact bigints; the per-doc sum folds in sorted-char order
    // (the p21 ordered-fold discipline); ONE round(,6) at the end.
    // Shape at 100 TB: the explode is linear in corpus chars and
    // partial-aggregates onto (doc_id, char) — alphabet-bounded per
    // doc; the fold runs over ≤|alphabet| rows per doc. No vocab
    // table, no join, no global state. CONTRACT: an empty doc gets NO
    // row (DuckDB's range(1,1) is naturally empty; Spark's
    // sequence(1,0) counts DOWN — the DedupOps.shingles pitfall — so
    // the explicit length guard below is what keeps the engines
    // agreeing on that absence).
    Q(
      "t15_char_entropy",
      """WITH ch AS (
        |  SELECT doc_id, substr(text, CAST(g AS INT), 1) AS c
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) + 1)) AS g
        |        FROM documents)),
        |cnt AS (
        |  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n_c
        |  FROM ch GROUP BY doc_id, c),
        |wt AS (
        |  SELECT doc_id, c, n_c,
        |    CAST(sum(n_c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |  FROM cnt),
        |tot AS (
        |  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    round(-list_reduce(
        |      list(CAST(n_c AS DOUBLE) / n * ln(CAST(n_c AS DOUBLE) / n)
        |        ORDER BY c),
        |      (a, b) -> a + b), 6) AS entropy
        |  FROM wt GROUP BY doc_id)
        |SELECT doc_id, n_chars, n_distinct, entropy
        |FROM tot ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val cnt = Tables(s, dir, "documents")
        .filter(length(col("text")) >= 1)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")))).as("g"))
        .select(col("doc_id"), expr("substring(text, g, 1)").as("c"))
        .groupBy(col("doc_id"), col("c"))
        .agg(count(lit(1)).cast("long").as("n_c"))
      val withTot = cnt.withColumn("n",
        sum(col("n_c")).over(Window.partitionBy(col("doc_id"))))
      withTot
        .select(col("doc_id"), col("n"), col("c"),
          (col("n_c").cast("double") / col("n")
            * log(col("n_c").cast("double") / col("n"))).as("term"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).cast("long").as("n_chars"),
          count(lit(1)).cast("long").as("n_distinct"),
          round(-aggregate(
            array_sort(collect_list(struct(col("c"), col("term")))),
            lit(0.0), (acc, x) => acc + x.getField("term")), 6)
            .as("entropy"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t16 — sentence statistics: split on [.!?]+ runs, trim, drop
    // empties, report per-doc sentence count, mean and max length in
    // chars — the readability-adjacent signal t12 consumes in
    // aggregate (and the cheap "wall of unpunctuated text" detector:
    // n_sentences = 1 with huge mean). Both engines split with the
    // same regex class and keep empty segments (Spark's split has no
    // trailing-strip at limit −1, DuckDB's regexp_split_to_array
    // likewise), so the explicit non-empty filter is the single
    // shared convention. mean = exact-int sum / exact-int count, ONE
    // IEEE division, round(,6). CONTRACT: a doc with zero non-empty
    // segments (all punctuation) gets NO row — stated, not implied
    // (the d09 lesson); every fixture doc carries real text, so the
    // output covers all docs here. Shape at 100 TB: stateless split +
    // one partial-agg'd shuffle on doc_id; segment text never leaves
    // the map side (lengths only).
    Q(
      "t16_sentence_stats",
      """WITH seg AS (
        |  SELECT doc_id, trim(s) AS s
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(text, '[.!?]+')) AS s
        |        FROM documents)
        |  WHERE trim(s) <> ''),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
        |    round(CAST(sum(length(s)) AS DOUBLE) / count(*), 6)
        |      AS mean_chars,
        |    CAST(max(length(s)) AS BIGINT) AS max_chars
        |  FROM seg GROUP BY doc_id)
        |SELECT doc_id, n_sentences, mean_chars, max_chars
        |FROM st ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val seg = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), "[.!?]+")).as("raw"))
        .select(col("doc_id"), trim(col("raw")).as("s"))
        .filter(col("s") =!= "")
        // lengths only from here — the segment text never reaches the
        // aggregation exchange
        .select(col("doc_id"), length(col("s")).as("len"))
      seg.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_sentences"),
          round(sum(col("len")).cast("double") / count(lit(1)), 6)
            .as("mean_chars"),
          max(col("len")).cast("long").as("max_chars"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t17 — vocabulary coverage / OOV rate: build the corpus top-500
    // vocabulary (by total occurrences, ties broken by term so both
    // engines cut the same set) and report each document's fraction
    // of tokens outside it — the cheap tokenizer-fit signal (a doc
    // full of OOV tokens is boilerplate, code, or the wrong
    // language). Shape at 100 TB: the vocabulary is a BOUNDED-K
    // global top-k (TakeOrderedAndProject over the term totals — no
    // full sort), broadcast to the per-doc join regardless of corpus
    // size; the (doc, term) stream is computed ONCE and staged for
    // both the totals and the coverage join; per-token text never
    // reaches an exchange twice.
    Q(
      "t17_vocab_coverage",
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM w GROUP BY doc_id, term),
        |tot AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c
        |        FROM tf GROUP BY term),
        |v AS (SELECT term FROM (
        |        SELECT term,
        |          row_number() OVER (ORDER BY c DESC, term ASC) AS r
        |        FROM tot) WHERE r <= 500)
        |SELECT tf.doc_id,
        |  CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END)
        |    AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END)
        |    AS DOUBLE) / sum(tf.tf), 6) AS oov_rate
        |FROM tf LEFT JOIN v ON tf.term = v.term
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin
    ) { (s, dir) =>
      val w = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(DedupOps.words(col("text"))).as("term"))
      val tf = Stage.stage(w.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast("long").as("tf")))
      val vocab = tf.groupBy(col("term"))
        .agg(sum(col("tf")).as("c"))
        .orderBy(col("c").desc, col("term").asc)
        .limit(500)
        .select(col("term"), lit(1).as("iv"))
      val oovTf = when(col("iv").isNull, col("tf")).otherwise(lit(0L))
      tf.join(broadcast(vocab), Seq("term"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).cast("long").as("n_tokens"),
          sum(oovTf).cast("long").as("n_oov"),
          round(sum(oovTf).cast("double") / sum(col("tf")), 6)
            .as("oov_rate"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t18 — Zipf slope per source: regress ln(frequency) on ln(rank)
    // over each source's top-100 terms — natural text sits near the
    // Zipf line (slope ≈ −1, r² near 1); templated or synthetic
    // corpora drift flat or bumpy, so the slope is a corpus-level
    // naturalness screen next to t01/t02's per-doc signals. The
    // per-source rank cut runs through GroupTopK (at most 100 rows
    // per (source, partition) reach the exchange, never the full
    // vocabulary), and the fit reuses q52's deterministic moment
    // contract: ln values rounded to 6 (the t07 ln-ulp lesson), sums
    // accumulated as EXACT decimals over the ≤100-row fit set, one
    // cast to double, identical IEEE combination in both engines.
    Q(
      "t18_zipf_slope",
      """WITH w AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term
        |  FROM documents),
        |tot AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
        |        FROM w GROUP BY source, term),
        |rk AS (SELECT source, term, c,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY c DESC, term ASC) AS r
        |       FROM tot),
        |pts AS (
        |  SELECT source,
        |    CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM rk WHERE r <= 100),
        |m AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(round(sum(x), 6) AS DOUBLE) AS sx,
        |    CAST(round(sum(y), 6) AS DOUBLE) AS sy,
        |    CAST(round(sum(CAST(x * y AS DECIMAL(38,12))), 6) AS DOUBLE)
        |      AS sxy,
        |    CAST(round(sum(CAST(x * x AS DECIMAL(38,12))), 6) AS DOUBLE)
        |      AS sxx,
        |    CAST(round(sum(CAST(y * y AS DECIMAL(38,12))), 6) AS DOUBLE)
        |      AS syy
        |  FROM pts GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_terms,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
        |    6) AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM m ORDER BY source""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val tot = Tables(s, dir, "documents")
        .select(col("source"),
          explode(DedupOps.words(col("text"))).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).cast("long").as("c"))
      val pts = graft.plans.GroupTopK.topKRanked(tot, Seq(col("source")),
          100, "r", col("c").desc, col("term").asc)
        .select(col("source"),
          round(log(col("r").cast("double")), 6)
            .cast(DecimalType(18, 6)).as("x"),
          round(log(col("c").cast("double")), 6)
            .cast(DecimalType(18, 6)).as("y"))
      def mom6(c: Column): Column = round(sum(c), 6).cast("double")
      val m = pts.groupBy(col("source"))
        .agg(count(lit(1)).cast("double").as("n"),
          mom6(col("x")).as("sx"), mom6(col("y")).as("sy"),
          mom6((col("x") * col("y")).cast(DecimalType(38, 12))).as("sxy"),
          mom6((col("x") * col("x")).cast(DecimalType(38, 12))).as("sxx"),
          mom6((col("y") * col("y")).cast(DecimalType(38, 12))).as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val denX = col("n") * col("sxx") - col("sx") * col("sx")
      val denY = col("n") * col("syy") - col("sy") * col("sy")
      m.select(col("source"), col("n").cast("bigint").as("n_terms"),
          round(num / denX, 6).as("slope"),
          round((col("sy") - num / denX * col("sx")) / col("n"), 6)
            .as("intercept"),
          round(num * num / (denX * denY), 6).as("r2"))
        .orderBy(col("source"))
    },

    // ---------------------------------------------------------------
    // t19 — code-vs-prose detection: the routing filter a pretraining
    // pipeline runs before language-specific cleaning (code wants
    // symbol-preserving tokenization; prose wants d09/t05). Signals
    // are count-based — code-symbol density ([{}()=;<>] chars) and
    // code-keyword density (def/return/import/void/lambda/printf) —
    // and the DECISION thresholds are integer cross-multiplications
    // (50·n_sym > n_chars ≙ density > 2%; 20·n_kw > n_words ≙ > 5%),
    // so the boolean can never float-drift between engines. The gate
    // plants a code doc per 7th base doc (braces, keywords, operators)
    // so both branches are exercised at every fixture scale. Shape at
    // 100 TB: one stateless regex-count projection pass; no joins, no
    // state; ratios reduce per-row.
    Q(
      "t19_code_detect",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000 AS doc_id,
        |    'def f' || CAST(doc_id AS VARCHAR)
        |      || '(x): return {x == ' || CAST(doc_id AS VARCHAR)
        |      || '}; import sys; void printf(x);' AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[{}()=;<>]')) AS BIGINT)
        |      AS n_sym,
        |    CAST(len(regexp_extract_all(text,
        |      '\b(def|return|import|void|lambda|printf)\b')) AS BIGINT)
        |      AS n_kw
        |  FROM corpus)
        |SELECT doc_id, n_sym, n_kw,
        |  round(CAST(n_sym AS DOUBLE) / n_chars, 6) AS sym_ratio,
        |  (50 * n_sym > n_chars OR 20 * n_kw > n_words) AS is_code
        |FROM sig ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select(Q.plantedId(col("doc_id"), 300000).as("doc_id"),
          concat(lit("def f"), col("doc_id").cast("string"),
            lit("(x): return {x == "), col("doc_id").cast("string"),
            lit("}; import sys; void printf(x);")).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(planted)
      val sig = corpus.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(DedupOps.words(col("text"))).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit("[{}()=;<>]"), lit(0)))
          .cast("long").as("n_sym"),
        size(regexp_extract_all(col("text"),
          lit("\\b(def|return|import|void|lambda|printf)\\b"), lit(0)))
          .cast("long").as("n_kw"))
      sig.select(col("doc_id"), col("n_sym"), col("n_kw"),
          round(col("n_sym").cast("double") / col("n_chars"), 6)
            .as("sym_ratio"),
          (lit(50) * col("n_sym") > col("n_chars") ||
            lit(20) * col("n_kw") > col("n_words")).as("is_code"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t20 — language-ID confusion matrix: t01's classifier evaluated
    // against the labeled corpus — for every (true lang, predicted)
    // cell, the doc count and the within-language share (the diagonal
    // is per-language recall; off-diagonal hot cells name the
    // confusable pairs worth a better profile). Same pipeline as t01
    // through the per-doc argmax (one shared helper, one staged
    // explode), then one reduce to the |langs|² cells. The corpus-eval
    // report a pipeline runs after retraining profiles — t01 tells you
    // WHAT the model said, this tells you WHERE it is wrong.
    Q(
      "t20_langid_confusion",
      """WITH tri AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, length(text) - 2),
        |      i -> substr(text, i, 3))) AS g
        |  FROM documents),
        |counts AS (SELECT lang, g, count(*) AS c FROM tri GROUP BY lang, g),
        |profile AS (
        |  SELECT lang AS p_lang, g, 21 - rank AS weight FROM (
        |    SELECT lang, g, c, row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, g ASC) AS rank FROM counts) r
        |  WHERE rank <= 20),
        |doc_tri AS (SELECT DISTINCT doc_id, lang, g FROM tri),
        |scores AS (
        |  SELECT d.doc_id, d.lang, p.p_lang, sum(p.weight) AS score
        |  FROM doc_tri d JOIN profile p ON d.g = p.g
        |  GROUP BY d.doc_id, d.lang, p.p_lang),
        |pred AS (
        |  SELECT doc_id, lang, p_lang AS predicted
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, p_lang ASC) AS rn FROM scores) t
        |  WHERE rn = 1),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
        |        FROM pred GROUP BY lang)
        |SELECT p.lang, p.predicted, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) / n_lang, 6) AS share
        |FROM pred p JOIN tot USING (lang)
        |GROUP BY p.lang, p.predicted, n_lang
        |ORDER BY lang, predicted""".stripMargin
    ) { (s, dir) =>
      val pred = langPredictions(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("predicted"))
      val tot = pred.groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_lang"))
      pred.join(broadcast(tot), Seq("lang"))
        .groupBy(col("lang"), col("predicted"), col("n_lang"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(col("lang"), col("predicted"), col("n"),
          round(col("n").cast("double") / col("n_lang"), 6).as("share"))
        .orderBy(col("lang"), col("predicted"))
    },

    // ---------------------------------------------------------------
    // t21 — trigram LM with Stupid Backoff (Brants et al., EMNLP 2007
    // — the web-scale LM scoring CCNet's KenLM filter is built on,
    // without Kneser-Ney's tuned discounts): train trigram/bigram/
    // unigram counts on the 'en' slice, score EVERY document's
    // positions i ≥ 3 with S = c₃/c₂ctx, else 0.4·c₂/c₁ctx, else
    // 0.16·c₁/N, else the 0.16/(N+1) OOV floor — in-domain text backs
    // off rarely, out-of-domain text cascades to unigram/OOV, and the
    // per-level counters expose exactly that. The LM IS three count
    // TABLES (t09's discipline — never a driver model); scoring is
    // five LEFT equi-joins of the position stream against them
    // (vocabulary-scale, not assumed broadcastable). Determinism:
    // each term is round(ln(ratio-of-exact-ints), 6) summed as
    // DECIMAL(28,6) — order-free — then ONE division; avg_logprob is
    // deliberately NOT re-rounded (t09's 7th-decimal half-boundary
    // lesson). The backoff chain is airtight without smoothing:
    // c₃ > 0 ⇒ its prefix bigram count > 0, c₂ > 0 ⇒ c₁(ctx) > 0.
    Q(
      "t21_lm_backoff",
      """WITH ws AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |wn AS (SELECT doc_id, lang, w, len(w) AS n FROM ws),
        |en AS (SELECT w, n FROM wn WHERE lang = 'en'),
        |uni AS (SELECT g, count(*) AS c FROM
        |  (SELECT unnest(w) AS g FROM en) GROUP BY g),
        |big AS (SELECT g, count(*) AS c FROM
        |  (SELECT unnest(list_transform(generate_series(1, n - 1),
        |     i -> w[i] || ' ' || w[i+1])) AS g FROM en WHERE n >= 2)
        |  GROUP BY g),
        |tri AS (SELECT g, count(*) AS c FROM
        |  (SELECT unnest(list_transform(generate_series(1, n - 2),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |   FROM en WHERE n >= 3) GROUP BY g),
        |nn AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM en),
        |pos AS (SELECT doc_id, unnest(generate_series(3, n)) AS i, w
        |        FROM wn WHERE n >= 3),
        |pw AS (SELECT doc_id, w[i-2] AS wa, w[i-1] AS wb, w[i] AS wc
        |       FROM pos),
        |sc AS (
        |  SELECT pw.doc_id,
        |    CASE WHEN t.c IS NOT NULL THEN 1 ELSE 0 END AS k3,
        |    CASE WHEN t.c IS NULL AND b2.c IS NOT NULL
        |      THEN 1 ELSE 0 END AS k2,
        |    CASE WHEN t.c IS NULL AND b2.c IS NULL AND u2.c IS NOT NULL
        |      THEN 1 ELSE 0 END AS k1,
        |    CASE WHEN t.c IS NULL AND b2.c IS NULL AND u2.c IS NULL
        |      THEN 1 ELSE 0 END AS k0,
        |    round(ln(CASE
        |      WHEN t.c IS NOT NULL THEN CAST(t.c AS DOUBLE) / b1.c
        |      WHEN b2.c IS NOT NULL THEN 0.4 * CAST(b2.c AS DOUBLE) / u1.c
        |      WHEN u2.c IS NOT NULL THEN 0.16 * CAST(u2.c AS DOUBLE) / nn.nt
        |      ELSE 0.16 / (nn.nt + 1) END), 6) AS lp
        |  FROM pw
        |  LEFT JOIN tri t ON t.g = pw.wa || ' ' || pw.wb || ' ' || pw.wc
        |  LEFT JOIN big b1 ON b1.g = pw.wa || ' ' || pw.wb
        |  LEFT JOIN big b2 ON b2.g = pw.wb || ' ' || pw.wc
        |  LEFT JOIN uni u1 ON u1.g = pw.wb
        |  LEFT JOIN uni u2 ON u2.g = pw.wc
        |  CROSS JOIN nn),
        |pd AS (SELECT doc_id, count(*) AS ns,
        |  CAST(sum(k3) AS BIGINT) AS n_tri, CAST(sum(k2) AS BIGINT) AS n_big,
        |  CAST(sum(k1) AS BIGINT) AS n_uni, CAST(sum(k0) AS BIGINT) AS n_oov,
        |  CAST(sum(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) AS slp
        |  FROM sc GROUP BY doc_id)
        |SELECT w.doc_id, w.lang, CAST(COALESCE(ns, 0) AS BIGINT) AS n_scored,
        |  COALESCE(n_tri, 0) AS n_tri, COALESCE(n_big, 0) AS n_big,
        |  COALESCE(n_uni, 0) AS n_uni, COALESCE(n_oov, 0) AS n_oov,
        |  slp / ns AS avg_logprob
        |FROM wn w LEFT JOIN pd ON w.doc_id = pd.doc_id
        |ORDER BY w.doc_id""".stripMargin
    ) { (s, dir) =>
      // staged: ONE tokenization pass feeds the three count tables,
      // the position stream, and the final accounting join
      val wn = Stage.stage(Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          DedupOps.words(col("text")).as("w"))
        .withColumn("n", size(col("w"))))
      val en = wn.filter(col("lang") === "en")
      def gramCounts(k: Int): org.apache.spark.sql.DataFrame = en
        .select(explode(when(col("n") >= k,
          expr(s"transform(sequence(1, n - ${k - 1}), i -> " +
            (0 until k).map(j => s"element_at(w, i + $j)")
              .mkString("concat_ws(' ', ", ", ", ")") + ")"))
          .otherwise(array().cast("array<string>"))).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
      val uni = gramCounts(1)
      val big = gramCounts(2)
      val tri = gramCounts(3)
      val nn = en.agg(sum(col("n")).cast("long").as("nt"))
      val pw = wn.filter(col("n") >= 3)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(3), col("n"))).as("i"))
        .select(col("doc_id"),
          element_at(col("w"), col("i") - 2).as("wa"),
          element_at(col("w"), col("i") - 1).as("wb"),
          element_at(col("w"), col("i")).as("wc"))
      val sc = pw
        .join(tri.select(col("g").as("g3"), col("c").as("c3")),
          concat_ws(" ", col("wa"), col("wb"), col("wc")) === col("g3"),
          "left_outer")
        .join(big.select(col("g").as("gb1"), col("c").as("cb1")),
          concat_ws(" ", col("wa"), col("wb")) === col("gb1"), "left_outer")
        .join(big.select(col("g").as("gb2"), col("c").as("cb2")),
          concat_ws(" ", col("wb"), col("wc")) === col("gb2"), "left_outer")
        .join(uni.select(col("g").as("gu1"), col("c").as("cu1")),
          col("wb") === col("gu1"), "left_outer")
        .join(uni.select(col("g").as("gu2"), col("c").as("cu2")),
          col("wc") === col("gu2"), "left_outer")
        .crossJoin(broadcast(nn))
        .select(col("doc_id"),
          when(col("c3").isNotNull, 1L).otherwise(0L).as("k3"),
          when(col("c3").isNull && col("cb2").isNotNull, 1L)
            .otherwise(0L).as("k2"),
          when(col("c3").isNull && col("cb2").isNull &&
            col("cu2").isNotNull, 1L).otherwise(0L).as("k1"),
          when(col("c3").isNull && col("cb2").isNull &&
            col("cu2").isNull, 1L).otherwise(0L).as("k0"),
          round(log(
            when(col("c3").isNotNull,
              col("c3").cast("double") / col("cb1"))
            .when(col("cb2").isNotNull,
              lit(0.4) * col("cb2").cast("double") / col("cu1"))
            .when(col("cu2").isNotNull,
              lit(0.16) * col("cu2").cast("double") / col("nt"))
            .otherwise(lit(0.16) / (col("nt") + 1))), 6).as("lp"))
      val pd = sc.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("ns"),
          sum(col("k3")).cast("long").as("n_tri"),
          sum(col("k2")).cast("long").as("n_big"),
          sum(col("k1")).cast("long").as("n_uni"),
          sum(col("k0")).cast("long").as("n_oov"),
          sum(col("lp").cast("decimal(28,6)")).cast("double").as("slp"))
      wn.select(col("doc_id"), col("lang"))
        .join(pd, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("lang"),
          coalesce(col("ns"), lit(0L)).cast("long").as("n_scored"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          coalesce(col("n_big"), lit(0L)).as("n_big"),
          coalesce(col("n_uni"), lit(0L)).as("n_uni"),
          coalesce(col("n_oov"), lit(0L)).as("n_oov"),
          (col("slp") / col("ns")).as("avg_logprob"))
        .orderBy(col("doc_id"))
    },

    // ---------------------------------------------------------------
    // t22 — per-source distribution drift: KL(source ‖ corpus) over a
    // 256-bucket hashed char-trigram profile — the monitoring report a
    // training-data pipeline runs per ingest batch to catch a crawl
    // source whose character statistics shifted (encoding regressions,
    // template floods, language drift) BEFORE it pollutes the mix.
    // Hashed buckets bound the vocabulary exactly as p31/DSIR does
    // (Xie et al. 2023 use the same trick); by the data-processing
    // inequality the bucketed KL lower-bounds the true trigram KL, so
    // a nonzero alarm is never hash noise. Zero-count buckets
    // contribute 0 (lim p→0 of p·ln p), and the corpus marginal
    // includes the source itself, so every ln argument is finite —
    // no smoothing constant to tune. Scale posture: the trigram
    // stream partial-aggregates map-side into ≤ |sources|·256 rows —
    // the ONLY exchange is that (source, bucket) agg; the source and
    // corpus marginals are broadcast-sized; the monitor costs one
    // corpus scan regardless of corpus size. Determinism: counts are
    // exact ints; each term is round(c·ln(ratio-of-exact-int
    // products), 6) summed as DECIMAL(28,6) (p31's advisor-hardened
    // discipline), then ONE division by the source total. The int64
    // products c_sb·C / c_s·C_b stay far below 2⁶³ at any input this
    // fold sees (≤ 10⁹·10¹² at a full 100 TB shard — the comment-level
    // guard is the same as t21's count tables: shard the monitor per
    // ingest batch, not per corpus-lifetime).
    Q(
      "t22_source_drift",
      """WITH tri AS (
        |  SELECT source,
        |    substr(md5(substr(text, CAST(i AS INT), 3)), 1, 2) AS b
        |  FROM (SELECT source, text,
        |          unnest(generate_series(1, length(text) - 2)) AS i
        |        FROM documents WHERE length(text) >= 3) t),
        |sc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c_sb
        |       FROM tri GROUP BY source, b),
        |st AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS c_s,
        |         CAST(count(*) AS BIGINT) AS n_buckets
        |       FROM sc GROUP BY source),
        |cb AS (SELECT b, CAST(sum(c_sb) AS BIGINT) AS c_b
        |       FROM sc GROUP BY b),
        |ct AS (SELECT CAST(sum(c_sb) AS BIGINT) AS c FROM sc),
        |terms AS (
        |  SELECT sc.source,
        |    CAST(round(sc.c_sb * ln(CAST(sc.c_sb * ct.c AS DOUBLE)
        |      / CAST(st.c_s * cb.c_b AS DOUBLE)), 6) AS DECIMAL(28,6))
        |      AS term
        |  FROM sc JOIN st USING (source) JOIN cb USING (b) CROSS JOIN ct)
        |SELECT st.source, st.c_s AS n_trigrams, st.n_buckets,
        |  round(CAST(a.tsum AS DOUBLE) / CAST(st.c_s AS DOUBLE), 6)
        |    AS kl_nats
        |FROM (SELECT source, sum(term) AS tsum FROM terms GROUP BY source) a
        |JOIN st USING (source)
        |ORDER BY st.source""".stripMargin
    ) { (s, dir) =>
      import graft.operators.Stage
      val sc = graft.operators.Par.fan(Tables(s, dir, "documents"))
        .filter(length(col("text")) >= 3)
        .select(col("source"),
          explode(TextOps.charNgrams(col("text"), 3)).as("g"))
        .select(col("source"), substring(md5(col("g")), 1, 2).as("b"))
        .groupBy(col("source"), col("b"))
        .agg(count(lit(1)).cast("long").as("c_sb"))
        .transform(Stage.stage) // feeds both marginals AND the terms
      val st = sc.groupBy(col("source"))
        .agg(sum(col("c_sb")).cast("long").as("c_s"),
          count(lit(1)).cast("long").as("n_buckets"))
      val cb = sc.groupBy(col("b"))
        .agg(sum(col("c_sb")).cast("long").as("c_b"))
      val ct = sc.agg(sum(col("c_sb")).cast("long").as("c"))
      val agg = sc.join(broadcast(st.select(col("source"), col("c_s"))),
          Seq("source"))
        .join(broadcast(cb), Seq("b"))
        .crossJoin(broadcast(ct))
        .select(col("source"),
          round(col("c_sb") * log((col("c_sb") * col("c")).cast("double")
            / (col("c_s") * col("c_b")).cast("double")), 6)
            .cast("decimal(28,6)").as("term"))
        .groupBy(col("source")).agg(sum(col("term")).as("tsum"))
      agg.join(broadcast(st), Seq("source"))
        .select(col("source"), col("c_s").as("n_trigrams"),
          col("n_buckets"),
          round(col("tsum").cast("double") / col("c_s").cast("double"), 6)
            .as("kl_nats"))
        .orderBy(col("source"))
    },

    // ---------------------------------------------------------------
    // t23 — distributed BPE trainer iterations (Sennrich et al., ACL
    // 2016): the first three merges of byte-pair encoding learned over
    // the 'en' corpus slice, entirely as relational algebra — the
    // tokenizer-training loop a data pipeline runs BEFORE any token
    // count in it means anything. Corpus state is a SYMBOL TABLE
    // (doc_id, word, pos, sym) — never a driver-side vocabulary; one
    // iteration = (1) adjacent-pair counts via lead() over each word
    // (partial-agg'd, key space ≤ vocab²), (2) the argmax pair as a
    // 1-row TakeOrderedAndProject broadcast, (3) greedy left-to-right
    // merge application: matches on consecutive SYMBOL ROWS form
    // islands; greedy takes the even OFFSETS from each island's start
    // (handles the aa|aa overlap case exactly), and a consumed row is
    // one whose left neighbour merged (opposite parity, same island).
    // ALL the apply-side flags — island start (lag), island-start rn
    // (running max), parities — are window functions over the ONE
    // (doc, word) ORDER BY pos spec, so each iteration costs exactly
    // ONE symbol-table exchange (the first cut partitioned islands by
    // (doc, word, matched, grp) — three extra full shuffles per
    // iteration; the running-max rewrite took the 10× soak from
    // 8.9×/69 s to linear/seconds). Parallel over words, no global
    // order anywhere; at 100 TB each iteration is that same bounded
    // exchange, and real trainers run exactly this shape with
    // thousands of iterations checkpointing the symbol table (the
    // comment-level loop; three unrolled here keep the oracle
    // finite). All-integer outputs — no float surface at all.
    // Cross-check built into the report: n_syms_after(i) must equal
    // n_syms_before(i+1), and pair_count ≥ n_merges with equality iff
    // no occurrences overlapped.
    Q(
      "t23_bpe_merges",
      s"""WITH ws AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents WHERE lang = 'en'),
        |wx AS (
        |  SELECT doc_id, CAST(wi AS BIGINT) AS wi, w[CAST(wi AS INT)] AS word
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS wi
        |        FROM ws) t),
        |s0 AS (
        |  SELECT doc_id, wi, CAST(p AS BIGINT) AS pos,
        |    substr(word, CAST(p AS INT), 1) AS sym
        |  FROM (SELECT doc_id, wi, word,
        |          unnest(generate_series(1, length(word))) AS p FROM wx) t),
        |${bpeIterSql(1, "s0")},
        |${bpeIterSql(2, "s1")},
        |${bpeIterSql(3, "s2")}
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
        |SELECT * FROM r3 ORDER BY iter""".stripMargin
    ) { (s, dir) =>
      val s0 = Tables(s, dir, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id"),
          posexplode(DedupOps.words(col("text"))).as(Seq("wi0", "word")))
        .select(col("doc_id"), (col("wi0") + 1).cast("long").as("wi"),
          col("word"),
          explode(sequence(lit(1), length(col("word")))).as("p"))
        .select(col("doc_id"), col("wi"), col("p").cast("long").as("pos"),
          expr("substring(word, p, 1)").as("sym"))
      val (s1, r1) = TextOps.bpeMergeIteration(s0, 1)
      val (s2, r2) = TextOps.bpeMergeIteration(s1, 2)
      val (_, r3) = TextOps.bpeMergeIteration(s2, 3)
      r1.unionByName(r2).unionByName(r3).orderBy(col("iter"))
    },

    // ---------------------------------------------------------------
    // t24 — tokenizer fertility with a LEARNED vocabulary: the encode
    // half of t23's trainer. Three merges are learned on a
    // deterministic 'en' subsample (doc_id % 3 = 0 — tokenizers train
    // on samples), then applied IN LEARNED ORDER to the full
    // multilingual corpus; the report is per-language fertility
    // (symbols per word — the tokens-per-word number a multilingual
    // data pipeline budgets by) and compression (chars per symbol).
    // On a real multilingual corpus this report shows the fertility
    // inequity production tokenizers measure (the training language
    // compresses best; under-served languages pay more symbols per
    // word). The driver fixture's langs are labels over a SHARED
    // vocabulary (er/in/or top pairs in every lang), so fertility
    // lands near-uniform (~4.12–4.14) — stated here so nobody reads
    // the flat column as a bug; the operator's gate is the exact
    // sequential trainer+encoder cross-check in the spec. Encode
    // reuses TextOps.bpeApply: each merge application is ONE symbol-
    // table exchange (broadcast pair, window-chain reuse); the final
    // per-doc symbol counts equi-join doc metadata and reduce to
    // |langs| rows. All counts exact ints; the two ratios are single
    // int/int double divisions rounded to 6 (the repo float contract).
    Q(
      "t24_bpe_fertility",
      s"""WITH ws AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents WHERE lang = 'en' AND doc_id % 3 = 0),
        |wx AS (
        |  SELECT doc_id, CAST(wi AS BIGINT) AS wi, w[CAST(wi AS INT)] AS word
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS wi
        |        FROM ws) t),
        |s0 AS (
        |  SELECT doc_id, wi, CAST(p AS BIGINT) AS pos,
        |    substr(word, CAST(p AS INT), 1) AS sym
        |  FROM (SELECT doc_id, wi, word,
        |          unnest(generate_series(1, length(word))) AS p FROM wx) t),
        |${bpeIterSql(1, "s0")},
        |${bpeIterSql(2, "s1")},
        |${bpeIterSql(3, "s2")},
        |fws AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |fwx AS (
        |  SELECT doc_id, CAST(wi AS BIGINT) AS wi, w[CAST(wi AS INT)] AS word
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS wi
        |        FROM fws) t),
        |fs0 AS (
        |  SELECT doc_id, wi, CAST(p AS BIGINT) AS pos,
        |    substr(word, CAST(p AS INT), 1) AS sym
        |  FROM (SELECT doc_id, wi, word,
        |          unnest(generate_series(1, length(word))) AS p FROM fwx) t),
        |${bpeApplySql("1", "fs0", "top1")},
        |${bpeApplySql("2", "es1", "top2")},
        |${bpeApplySql("3", "es2", "top3")},
        |c0 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nc
        |       FROM fs0 GROUP BY doc_id),
        |cs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ns
        |       FROM es3 GROUP BY doc_id),
        |rep AS (
        |  SELECT f.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(f.w)) AS BIGINT) AS n_words,
        |    CAST(sum(c0.nc) AS BIGINT) AS n_chars,
        |    CAST(sum(cs.ns) AS BIGINT) AS n_syms
        |  FROM fws f JOIN c0 USING (doc_id) JOIN cs USING (doc_id)
        |  GROUP BY f.lang)
        |SELECT lang, n_docs, n_words, n_chars, n_syms,
        |  round(CAST(n_syms AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        |    AS fertility,
        |  round(CAST(n_chars AS DOUBLE) / CAST(n_syms AS DOUBLE), 6)
        |    AS compression
        |FROM rep ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      def symTable(df: DataFrame): DataFrame = df
        .select(col("doc_id"),
          posexplode(DedupOps.words(col("text"))).as(Seq("wi0", "word")))
        .select(col("doc_id"), (col("wi0") + 1).cast("long").as("wi"),
          col("word"),
          explode(sequence(lit(1), length(col("word")))).as("p"))
        .select(col("doc_id"), col("wi"), col("p").cast("long").as("pos"),
          expr("substring(word, p, 1)").as("sym"))
      val docsAll = Tables(s, dir, "documents")
      // train on the 'en' subsample; stage each learned pair (1 row)
      // so the training lineage runs once however many times the pair
      // broadcasts (train-side apply + encode-side apply)
      var cur = symTable(
        docsAll.filter(col("lang") === "en" && col("doc_id") % 3 === 0))
      val tops = (1 to 3).map { _ =>
        val adj = TextOps.bpeAdjacency(cur)
        val top = TextOps.bpeTopPair(adj).transform(Stage.stage)
        cur = TextOps.bpeApply(adj, top)._1
        top
      }
      // encode the FULL corpus with the learned merges, in order —
      // unstaged adjacencies: one consumer each, so the three applies
      // pipeline through a single exchange + sort (window specs share
      // the (doc, word) partitioning)
      var enc = symTable(docsAll)
      tops.foreach { top =>
        enc = TextOps.bpeApply(
          TextOps.bpeAdjacency(enc, stage = false), top)._1
      }
      // chars-in-words per doc: a stateless projection (equals the
      // oracle's count over the exploded char table, without the
      // second corpus-wide explode)
      val c0 = docsAll.select(col("doc_id"),
        length(concat_ws("", DedupOps.words(col("text"))))
          .cast("long").as("nc"))
      val cs = enc.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("ns"))
      docsAll.select(col("doc_id"), col("lang"),
          size(DedupOps.words(col("text"))).cast("long").as("nw"))
        .join(c0, Seq("doc_id")).join(cs, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("nw")).cast("long").as("n_words"),
          sum(col("nc")).cast("long").as("n_chars"),
          sum(col("ns")).cast("long").as("n_syms"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_chars"), col("n_syms"),
          round(col("n_syms").cast("double")
            / col("n_words").cast("double"), 6).as("fertility"),
          round(col("n_chars").cast("double")
            / col("n_syms").cast("double"), 6).as("compression"))
        .orderBy(col("lang"))
    },

    // ---------------------------------------------------------------
    // t25 — Heaps'-law vocabulary growth (Heaps 1978; t18's Zipf is
    // the rank-frequency face, this is the type-token face): per
    // source, V(n) = distinct types among the first n tokens of the
    // corpus stream, fit as ln V = β·ln n + ln K — the curve that
    // sizes a tokenizer vocabulary and predicts how many NEW types
    // the next 10× of corpus brings. The naive form (count distinct
    // per prefix) is O(prefixes · corpus); here V(n) needs only each
    // type's FIRST-occurrence position: V(n) = #{types: first ≤ n}.
    // Position in the stream is the EXACT GLOBAL RANK over (source,
    // doc_id, pos) via EquiDepth (one range exchange + pid-local
    // window — no single-task sort); per-source position subtracts
    // the broadcast ≤|sources|-row offset table. First occurrences
    // bin by floor(log2 f) — computed EXACTLY as length(bin(f))-1,
    // never float log2 at a power-of-two boundary — so the sample
    // grid n_b = min(2^(b+1)-1, N) needs only a cumulative sum over
    // the ≤40-row-per-source bin table (source-partitioned window).
    // The fit reuses t18's deterministic moment contract: ln values
    // rounded to 6, exact DECIMAL moment sums, one cast to double.
    // Honest fixture note: the synthetic corpus is templated, so the
    // vocabulary saturates early and β lands well below the ~0.7 of
    // natural text — the spec pins V's monotonicity and the exact
    // cross-check against a sequential pure-Scala recount instead of
    // a naturalness claim.
    Q(
      "t25_heaps_law",
      """WITH ws AS (
        |  SELECT source, doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT source, doc_id, p, w[p] AS term
        |  FROM (SELECT source, doc_id, w,
        |          unnest(generate_series(1, len(w))) AS p FROM ws)),
        |pos AS (
        |  SELECT source, term,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id, p)
        |      AS ps
        |  FROM tok),
        |src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tok
        |        FROM pos GROUP BY source),
        |fo AS (SELECT source, term, min(ps) AS f
        |       FROM pos GROUP BY source, term),
        |bins AS (
        |  SELECT source, length(bin(CAST(f AS BIGINT))) - 1 AS b,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM fo GROUP BY source, b),
        |cum AS (
        |  SELECT source, b, cnt,
        |    sum(cnt) OVER (PARTITION BY source ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vt
        |  FROM bins),
        |pts AS (
        |  SELECT c.source, c.cnt,
        |    CAST(round(ln(CAST(least((CAST(1 AS BIGINT) << (b + 1)) - 1,
        |      s.n_tok) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(vt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y,
        |    s.n_tok
        |  FROM cum c JOIN src s ON s.source = c.source),
        |m AS (
        |  SELECT source, max(n_tok) AS n_tokens,
        |    CAST(sum(cnt) AS BIGINT) AS n_types,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(round(sum(x), 6) AS DOUBLE) AS sx,
        |    CAST(round(sum(y), 6) AS DOUBLE) AS sy,
        |    CAST(round(sum(CAST(x * y AS DECIMAL(38,12))), 6) AS DOUBLE)
        |      AS sxy,
        |    CAST(round(sum(CAST(x * x AS DECIMAL(38,12))), 6) AS DOUBLE)
        |      AS sxx,
        |    CAST(round(sum(CAST(y * y AS DECIMAL(38,12))), 6) AS DOUBLE)
        |      AS syy
        |  FROM pts GROUP BY source)
        |SELECT source, n_tokens, n_types, CAST(n AS BIGINT) AS n_points,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
        |    6) AS lnk,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM m ORDER BY source""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val tok = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          posexplode(DedupOps.words(col("text"))).as(Seq("p0", "term")))
        .select(col("source"), col("doc_id"),
          (col("p0") + 1).cast("long").as("p"), col("term"))
      val ranked = graft.operators.EquiDepth.withGlobalRank(tok,
        Seq(col("source"), col("doc_id"), col("p")), "r", "tot")
      // per-source stream offset: source is the LEADING order column,
      // so min(global rank) - 1 within a source IS the token count of
      // all earlier sources; <=|sources| rows, broadcast back
      val src = ranked.groupBy(col("source"))
        .agg((min(col("r")) - 1).as("off"),
          count(lit(1)).cast("long").as("n_tok"))
      val fo = ranked.join(broadcast(src), Seq("source"))
        .select(col("source"), col("term"),
          (col("r") - col("off")).as("ps"), col("n_tok"))
        .groupBy(col("source"), col("term"))
        .agg(min(col("ps")).as("f"), max(col("n_tok")).as("n_tok"))
      val bins = fo.groupBy(col("source"),
          (length(bin(col("f"))) - 1).as("b"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          max(col("n_tok")).as("n_tok"))
      val wc = Window.partitionBy(col("source")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pts = bins.withColumn("vt", sum(col("cnt")).over(wc))
        .select(col("source"), col("cnt"), col("n_tok"),
          round(log(least(
            expr("shiftleft(cast(1 as bigint), cast(b + 1 as int))") - 1,
            col("n_tok")).cast("double")), 6)
            .cast(DecimalType(18, 6)).as("x"),
          round(log(col("vt").cast("double")), 6)
            .cast(DecimalType(18, 6)).as("y"))
      def mom6(c: Column): Column = round(sum(c), 6).cast("double")
      val m = pts.groupBy(col("source"))
        .agg(max(col("n_tok")).as("n_tokens"),
          sum(col("cnt")).cast("long").as("n_types"),
          count(lit(1)).cast("double").as("n"),
          mom6(col("x")).as("sx"), mom6(col("y")).as("sy"),
          mom6((col("x") * col("y")).cast(DecimalType(38, 12))).as("sxy"),
          mom6((col("x") * col("x")).cast(DecimalType(38, 12))).as("sxx"),
          mom6((col("y") * col("y")).cast(DecimalType(38, 12))).as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val denX = col("n") * col("sxx") - col("sx") * col("sx")
      val denY = col("n") * col("syy") - col("sy") * col("sy")
      m.select(col("source"), col("n_tokens"), col("n_types"),
          col("n").cast("bigint").as("n_points"),
          round(num / denX, 6).as("beta"),
          round((col("sy") - num / denX * col("sx")) / col("n"), 6)
            .as("lnk"),
          round(num * num / (denX * denY), 6).as("r2"))
        .orderBy(col("source"))
    },

    // ---------------------------------------------------------------
    // t26 — term burstiness (Church & Gale 1995's dispersion): for the
    // top-100 corpus terms, the variance-to-mean ratio of per-document
    // counts WITH zeros — a Poisson-spread function word sits near
    // VMR ≈ 1, a topical term clumps (VMR ≫ 1). The signal stopword
    // lists approximate and a pipeline can measure instead. Exactness:
    // with s1 = Σc, s2 = Σc², N docs, VMR = (N·s2 − s1²)/(N·s1) — an
    // exact RATIONAL carried as DECIMAL(18,0) products (≤37 digits,
    // Spark-exact per the decimal lint) and emitted as numerator/
    // denominator plus one IEEE division. Shape at 100 TB: one
    // (doc, term) exchange builds counts (STAGED — totals and the s2
    // pass both read it), the top-100 cut is TakeOrderedAndProject
    // (never a global sort), and s2 runs behind a broadcast semi-join
    // of the 100-term set; N is a broadcast scalar.
    Q(
      "t26_burstiness",
      """WITH dtc AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '),
        |            x -> x <> '')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |tot AS (
        |  SELECT term, CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    -- (19,0): n·s2 is then (18,0)x(19,0) = 38 digits, the
        |    -- widest Spark computes EXACTLY (the decimal lint's bound)
        |    CAST(sum(CAST(c AS DECIMAL(18,0))
        |      * CAST(c AS DECIMAL(18,0))) AS DECIMAL(19,0)) AS s2
        |  FROM dtc GROUP BY term),
        |top AS (SELECT * FROM tot ORDER BY s1 DESC, term ASC LIMIT 100)
        |SELECT term, s1 AS n_occurrences, n_docs,
        |  CAST(CAST(nd.n AS DECIMAL(18,0)) * s2
        |    - CAST(s1 AS DECIMAL(18,0)) * CAST(s1 AS DECIMAL(18,0))
        |    AS BIGINT) AS vmr_num,
        |  CAST(CAST(nd.n AS DECIMAL(18,0)) * CAST(s1 AS DECIMAL(18,0))
        |    AS BIGINT) AS vmr_den,
        |  CAST(CAST(nd.n AS DECIMAL(18,0)) * s2
        |      - CAST(s1 AS DECIMAL(18,0)) * CAST(s1 AS DECIMAL(18,0))
        |      AS DOUBLE)
        |    / CAST(CAST(nd.n AS DECIMAL(18,0)) * CAST(s1 AS DECIMAL(18,0))
        |      AS DOUBLE) AS vmr
        |FROM top CROSS JOIN nd
        |ORDER BY n_occurrences DESC, term ASC""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val docs = Tables(s, dir, "documents")
      val dtc = docs
        .select(col("doc_id"), explode(DedupOps.words(col("text")))
          .as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast("long").as("c"))
        .transform(Stage.stage) // read by the totals AND the s2 pass
      val nd = docs.agg(count(lit(1)).cast("long").as("n"))
      val d18 = DecimalType(18, 0)
      val top = dtc.groupBy(col("term"))
        .agg(sum(col("c")).cast("long").as("s1"),
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("c").cast(d18) * col("c").cast(d18))
            .cast(DecimalType(19, 0)).as("s2"))
        .orderBy(col("s1").desc, col("term").asc)
        .limit(100)
      val num = (col("n").cast(d18) * col("s2")) -
        (col("s1").cast(d18) * col("s1").cast(d18))
      val den = col("n").cast(d18) * col("s1").cast(d18)
      top.crossJoin(broadcast(nd))
        .select(col("term"), col("s1").as("n_occurrences"), col("n_docs"),
          num.cast("long").as("vmr_num"),
          den.cast("long").as("vmr_den"),
          (num.cast("double") / den.cast("double")).as("vmr"))
        .orderBy(col("n_occurrences").desc, col("term").asc)
    },

    // ---------------------------------------------------------------
    // t27 — PMI collocation extraction (Church & Hanks, CL 1990): the
    // top-20 adjacent word pairs by pointwise mutual information,
    // PMI = ln(p(x,y) / (p(x)p(y))) with p(x,y) = c_xy/N_bi and
    // p(x) = c_x/N_uni, min pair count 5 (PMI is unstable on rare
    // pairs — the standard cutoff). The phrase-mining primitive a
    // tokenizer/vocabulary pipeline runs to decide what deserves a
    // single token. Shape: one tokenization pass staged (t09's move),
    // pair counts partial-agg'd then FILTERED to c≥5 before the two
    // unigram equi-joins (vocabulary-scale, never broadcast — the t21
    // discipline), totals as two broadcast scalars, final cut via
    // TakeOrderedAndProject. PMI is round(ln, 6) computed on doubles
    // with identical operand order in both engines, and the ORDER BY
    // ranks the ROUNDED value with (w1, w2) tiebreak — a total order.
    Q(
      "t27_pmi_collocations",
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1])) AS bg
        |  FROM ws WHERE len(w) >= 2),
        |pc AS (SELECT split_part(bg, ' ', 1) AS w1,
        |    split_part(bg, ' ', 2) AS w2,
        |    CAST(count(*) AS BIGINT) AS c_pair
        |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
        |un AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM
        |    (SELECT unnest(w) AS t FROM ws) z GROUP BY t),
        |nbt AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bg),
        |nut AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM un)
        |SELECT w1, w2, c_pair, u1.c AS c_w1, u2.c AS c_w2,
        |  round(ln((CAST(c_pair AS DOUBLE) * nu * nu)
        |    / (CAST(nb AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
        |FROM pc JOIN un u1 ON u1.t = w1 JOIN un u2 ON u2.t = w2
        |CROSS JOIN nbt CROSS JOIN nut
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val ws = Tables(s, dir, "documents")
        .select(col("doc_id"), DedupOps.words(col("text")).as("w"))
      // staged: the bigram stream feeds the pair counts AND the total
      val bg = Stage.stage(ws.select(
        explode(when(size(col("w")) >= 2,
            expr("transform(sequence(1, size(w) - 1)," +
              " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
          .otherwise(array().cast("array<string>"))).as("bg")))
      val un = Stage.stage(ws.select(explode(col("w")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).cast("long").as("c")))
      val pc = bg
        .select(substring_index(col("bg"), " ", 1).as("w1"),
          substring_index(col("bg"), " ", -1).as("w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).cast("long").as("c_pair"))
        .filter(col("c_pair") >= 5)
      val nbt = bg.agg(count(lit(1)).cast("long").as("nb"))
      val nut = un.agg(sum(col("c")).cast("long").as("nu"))
      pc.join(un.select(col("t"), col("c").as("c_w1")),
          col("t") === col("w1")).drop("t")
        .join(un.select(col("t"), col("c").as("c_w2")),
          col("t") === col("w2")).drop("t")
        .crossJoin(broadcast(nbt)).crossJoin(broadcast(nut))
        .select(col("w1"), col("w2"), col("c_pair"), col("c_w1"),
          col("c_w2"),
          round(log((col("c_pair").cast("double") * col("nu")
              * col("nu"))
            / (col("nb").cast("double") * col("c_w1") * col("c_w2"))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // ---------------------------------------------------------------
    // t28 — Jensen–Shannon drift: each source vs the REST of the
    // corpus over t22's 256-bucket hashed char-trigram profile. Where
    // t22's KL(source ‖ corpus) is asymmetric and unbounded, JSD is
    // the symmetric, √-metrizable, ln2-bounded divergence drift
    // dashboards actually threshold — and it needs NO smoothing by
    // construction: the mixture M = (P+Q)/2 is positive wherever
    // either side is, so every ln argument is finite even on buckets
    // one side has never seen (exactly the buckets a KL monitor must
    // smooth away). Terms in exact-integer form: with c_sb/c_s the
    // source ratio and c_qb/c_q the rest ratio, both ln arguments
    // share the denominator D = c_sb·c_q + c_qb·c_s (2p/(p+q) =
    // 2·c_sb·c_q/D, 2q/(p+q) = 2·c_qb·c_s/D); each count-weighted
    // term is round(·,6)→DECIMAL summed order-free (t22/p31's
    // discipline), one division per side, halved. The Q side must sum
    // over buckets the SOURCE never saw, so terms run over the
    // sources×buckets SPINE (≤ |sources|·256 rows, broadcast) left-
    // joined to the observed counts — the corpus contributes the same
    // single (source, bucket) partial aggregation as t22. Int64
    // bounds: c_sb·c_q ≤ c² — shard the monitor per ingest batch at
    // 100 TB (t21/t22's guard). Degenerate input: a SINGLE-source
    // corpus has no "rest" (c = c_s), where the term denominator and
    // the jsd division are 0/0 — Spark and DuckDB disagree on
    // NaN-vs-NULL there, so both renderings gate the tp term and
    // jsd_nats behind c > c_s and yield NULL identically (the q90
    // degenerate-input rule).
    Q(
      "t28_jsd_drift",
      """WITH tri AS (
        |  SELECT source,
        |    substr(md5(substr(text, CAST(i AS INT), 3)), 1, 2) AS b
        |  FROM (SELECT source, text,
        |          unnest(generate_series(1, length(text) - 2)) AS i
        |        FROM documents WHERE length(text) >= 3) t),
        |sc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c_sb
        |       FROM tri GROUP BY source, b),
        |st AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS c_s,
        |         CAST(count(*) AS BIGINT) AS n_buckets
        |       FROM sc GROUP BY source),
        |cb AS (SELECT b, CAST(sum(c_sb) AS BIGINT) AS c_b
        |       FROM sc GROUP BY b),
        |ct AS (SELECT CAST(sum(c_sb) AS BIGINT) AS c FROM sc),
        |sp AS (
        |  SELECT st.source, st.c_s, cb.b, cb.c_b,
        |    COALESCE(sc.c_sb, 0) AS c_sb
        |  FROM st CROSS JOIN cb
        |  LEFT JOIN sc ON sc.source = st.source AND sc.b = cb.b),
        |terms AS (
        |  SELECT sp.source,
        |    CASE WHEN sp.c_sb > 0 AND ct.c > sp.c_s THEN
        |      CAST(round(sp.c_sb * ln(
        |        CAST(2 * sp.c_sb * (ct.c - sp.c_s) AS DOUBLE)
        |        / CAST(sp.c_sb * (ct.c - sp.c_s)
        |            + (sp.c_b - sp.c_sb) * sp.c_s AS DOUBLE)), 6)
        |        AS DECIMAL(28,6))
        |    ELSE CAST(0 AS DECIMAL(28,6)) END AS tp,
        |    CASE WHEN sp.c_b - sp.c_sb > 0 THEN
        |      CAST(round((sp.c_b - sp.c_sb) * ln(
        |        CAST(2 * (sp.c_b - sp.c_sb) * sp.c_s AS DOUBLE)
        |        / CAST(sp.c_sb * (ct.c - sp.c_s)
        |            + (sp.c_b - sp.c_sb) * sp.c_s AS DOUBLE)), 6)
        |        AS DECIMAL(28,6))
        |    ELSE CAST(0 AS DECIMAL(28,6)) END AS tq
        |  FROM sp CROSS JOIN ct),
        |a AS (SELECT source, sum(tp) AS tps, sum(tq) AS tqs
        |      FROM terms GROUP BY source)
        |SELECT st.source, st.c_s AS n_src_trigrams,
        |  ct.c - st.c_s AS n_rest_trigrams, st.n_buckets,
        |  CASE WHEN ct.c > st.c_s THEN
        |    round((CAST(a.tps AS DOUBLE) / CAST(st.c_s AS DOUBLE)
        |      + CAST(a.tqs AS DOUBLE) / CAST(ct.c - st.c_s AS DOUBLE))
        |      / 2, 6) END AS jsd_nats
        |FROM a JOIN st USING (source) CROSS JOIN ct
        |ORDER BY st.source""".stripMargin
    ) { (s, dir) =>
      import graft.operators.Stage
      val sc = graft.operators.Par.fan(Tables(s, dir, "documents"))
        .filter(length(col("text")) >= 3)
        .select(col("source"),
          explode(TextOps.charNgrams(col("text"), 3)).as("g"))
        .select(col("source"), substring(md5(col("g")), 1, 2).as("b"))
        .groupBy(col("source"), col("b"))
        .agg(count(lit(1)).cast("long").as("c_sb"))
        .transform(Stage.stage) // feeds both marginals AND the spine
      val st = sc.groupBy(col("source"))
        .agg(sum(col("c_sb")).cast("long").as("c_s"),
          count(lit(1)).cast("long").as("n_buckets"))
      val cb = sc.groupBy(col("b"))
        .agg(sum(col("c_sb")).cast("long").as("c_b"))
      val ct = sc.agg(sum(col("c_sb")).cast("long").as("c"))
      val sp = broadcast(st.select(col("source"), col("c_s")))
        .crossJoin(broadcast(cb))
        .join(sc, Seq("source", "b"), "left_outer")
        .select(col("source"), col("c_s"), col("b"), col("c_b"),
          coalesce(col("c_sb"), lit(0L)).as("c_sb"))
      val den = (col("c_sb") * (col("c") - col("c_s"))
        + (col("c_b") - col("c_sb")) * col("c_s")).cast("double")
      val a = sp.crossJoin(broadcast(ct))
        .select(col("source"),
          when(col("c_sb") > 0 && col("c") > col("c_s"),
            round(col("c_sb") * log(
              (lit(2) * col("c_sb") * (col("c") - col("c_s")))
                .cast("double") / den), 6).cast("decimal(28,6)"))
            .otherwise(lit(0).cast("decimal(28,6)")).as("tp"),
          when(col("c_b") - col("c_sb") > 0,
            round((col("c_b") - col("c_sb")) * log(
              (lit(2) * (col("c_b") - col("c_sb")) * col("c_s"))
                .cast("double") / den), 6).cast("decimal(28,6)"))
            .otherwise(lit(0).cast("decimal(28,6)")).as("tq"))
        .groupBy(col("source"))
        .agg(sum(col("tp")).as("tps"), sum(col("tq")).as("tqs"))
      a.join(broadcast(st), Seq("source")).crossJoin(broadcast(ct))
        .select(col("source"), col("c_s").as("n_src_trigrams"),
          (col("c") - col("c_s")).as("n_rest_trigrams"),
          col("n_buckets"),
          when(col("c") > col("c_s"),
            round((col("tps").cast("double")
                / col("c_s").cast("double")
              + col("tqs").cast("double")
                / (col("c") - col("c_s")).cast("double")) / 2, 6))
            .as("jsd_nats"))
        .orderBy(col("source"))
    }
  )

  /** t01's trigram-profile classifier through the per-doc argmax —
    * shared by t01 (per-doc report) and t20 (confusion matrix).
    * Returns (doc_id, lang, predicted, score). One explode + one
    * aggregation: per-doc trigram counts serve both the training
    * counts (sum) and the distinct doc-trigram sets (they are already
    * distinct) — checkpointed so profile building and classification
    * don't re-explode the corpus. */
  private def langPredictions(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // fan the unsplittable single-file scan across cores BEFORE the
    // trigram explode + per-trigram hashing (guide §2.5; Par.fan is the
    // identity once the scan parallelizes itself at real scale)
    val tri = graft.operators.Par.fan(docs).select(col("doc_id"), col("lang"),
      explode(TextOps.charNgrams(col("text"), 3)).as("g"))
    val docCounts = tri.groupBy(col("doc_id"), col("lang"), col("g"))
      .agg(count(lit(1)).as("dc"))
      .transform(Stage.stage)
    val counts = docCounts.groupBy(col("lang"), col("g"))
      .agg(sum(col("dc")).as("c"))
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("g").asc)
    val profile = counts.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 20)
      .select(col("lang").as("p_lang"), col("g"),
        (lit(21) - col("rank")).as("weight"))
    val docTri = docCounts.select(col("doc_id"), col("lang"), col("g"))
    val scores = docTri.join(broadcast(profile), "g")
      .groupBy(col("doc_id"), col("lang"), col("p_lang"))
      .agg(sum(col("weight")).as("score"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("p_lang").asc)
    scores.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("p_lang").as("predicted"),
        col("score"))
  }

  /** DuckDB rendering of one t23 BPE merge iteration over symbol table
    * `prev` (doc_id, wi, pos, sym): pair counts via lead(), the argmax
    * pair (ties count DESC → pair ASC), greedy application via island
    * arithmetic over the single (doc, word) window — island start by
    * lag, island-start rn by running max, merge at even offsets,
    * consumed at odd offsets whose left neighbour matched. Emits s$i
    * (the merged symbol table) and r$i (the report row). */
  private def bpeIterSql(i: Int, prev: String): String =
    s"""adj$i AS (
       |  SELECT doc_id, wi, pos, sym,
       |    lead(sym) OVER (PARTITION BY doc_id, wi ORDER BY pos) AS nxt,
       |    row_number() OVER (PARTITION BY doc_id, wi ORDER BY pos) AS rn
       |  FROM $prev),
       |top$i AS (
       |  SELECT sym AS ta, nxt AS tb, CAST(count(*) AS BIGINT) AS tc
       |  FROM adj$i WHERE nxt IS NOT NULL
       |  GROUP BY sym, nxt ORDER BY tc DESC, ta ASC, tb ASC LIMIT 1),
       |m$i AS (
       |  SELECT a.*, t.ta, t.tb, t.tc,
       |    (a.sym = t.ta AND COALESCE(a.nxt = t.tb, FALSE)) AS matched
       |  FROM adj$i a CROSS JOIN top$i t),
       |g$i AS (
       |  SELECT *, COALESCE(
       |      lag(matched) OVER (PARTITION BY doc_id, wi ORDER BY pos),
       |      FALSE) AS pm
       |  FROM m$i),
       |h$i AS (
       |  SELECT *, max(CASE WHEN matched AND NOT pm THEN rn END) OVER (
       |      PARTITION BY doc_id, wi ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS srn
       |  FROM g$i),
       |k$i AS (
       |  SELECT *, (matched AND (rn - srn) % 2 = 0) AS do_merge,
       |    (pm AND (rn - 1 - srn) % 2 = 0) AS consumed
       |  FROM h$i),
       |s$i AS (
       |  SELECT doc_id, wi, pos,
       |    CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
       |  FROM k$i WHERE NOT consumed),
       |r$i AS (
       |  SELECT $i AS iter, t.ta AS sym_a, t.tb AS sym_b,
       |    t.tc AS pair_count,
       |    (SELECT CAST(count(*) AS BIGINT) FROM adj$i) AS n_syms_before,
       |    (SELECT CAST(count(*) AS BIGINT) FROM k$i WHERE do_merge)
       |      AS n_merges,
       |    (SELECT CAST(count(*) AS BIGINT) FROM adj$i)
       |      - (SELECT CAST(count(*) AS BIGINT) FROM k$i WHERE do_merge)
       |      AS n_syms_after
       |  FROM top$i t)""".stripMargin

  /** DuckDB rendering of TextOps.bpeApply for t24: applies the 1-row
    * pair CTE `topCte` (ta, tb) to symbol table `prev`, emitting the
    * merged table es$tag — same greedy island arithmetic as
    * bpeIterSql, without learning a pair. */
  private def bpeApplySql(tag: String, prev: String,
      topCte: String): String =
    s"""eadj$tag AS (
       |  SELECT doc_id, wi, pos, sym,
       |    lead(sym) OVER (PARTITION BY doc_id, wi ORDER BY pos) AS nxt,
       |    row_number() OVER (PARTITION BY doc_id, wi ORDER BY pos) AS rn
       |  FROM $prev),
       |em$tag AS (
       |  SELECT a.*, t.ta, t.tb,
       |    (a.sym = t.ta AND COALESCE(a.nxt = t.tb, FALSE)) AS matched
       |  FROM eadj$tag a CROSS JOIN $topCte t),
       |eg$tag AS (
       |  SELECT *, COALESCE(
       |      lag(matched) OVER (PARTITION BY doc_id, wi ORDER BY pos),
       |      FALSE) AS pm
       |  FROM em$tag),
       |eh$tag AS (
       |  SELECT *, max(CASE WHEN matched AND NOT pm THEN rn END) OVER (
       |      PARTITION BY doc_id, wi ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS srn
       |  FROM eg$tag),
       |ek$tag AS (
       |  SELECT *, (matched AND (rn - srn) % 2 = 0) AS do_merge,
       |    (pm AND (rn - 1 - srn) % 2 = 0) AS consumed
       |  FROM eh$tag),
       |es$tag AS (
       |  SELECT doc_id, wi, pos,
       |    CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
       |  FROM ek$tag WHERE NOT consumed)""".stripMargin
}
