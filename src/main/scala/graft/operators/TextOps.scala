package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (character n-gram profiles), quality scoring, token counting, and
  * document fingerprinting. All pure Catalyst expressions — portable,
  * deterministic, no UDFs.
  *
  * Scale posture (100 TB): profile training is one explode + two-level
  * aggregation (partial map-side combine); classification broadcasts the
  * tiny per-language profile table and scores each document in a single
  * pass. Ratios divide exact integer counts, so scores are deterministic
  * doubles.
  */
object TextOps {

  /** Character n-grams of the text, 1-indexed. Short-circuits below n
    * chars — `sequence(1, 0)` counts DOWN to [1, 0] (the pitfall
    * DedupOps.shingles documents), which would mint phantom grams for
    * short documents and diverge from the oracle. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = DedupOps.words(text)

  /** Unicode NFC canonical composition — native codegen'd expression
    * (graft.functions.NfcNormalize); run before hashing/dedup so
    * composed and decomposed forms of the same text fingerprint
    * identically. */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.functions.NfcNormalize(expression(text)))
  }

  /** Quality features + composite score. The score is a fixed linear
    * blend of deterministic ratios (stopword ratio, unique-token ratio,
    * mean token length, alpha ratio), rounded to 6 decimals. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("double")
    val stop = size(filter(t, w => w.isin("a", "the"))).cast("double")
    val uniq = size(array_distinct(t)).cast("double")
    val meanLen = (length(col(textCol)).cast("double") - (size(t) - 1)) / nTok
    docs.select((col(idCol) +: passthrough.map(col)) ++ Seq(
      size(t).cast("long").as("n_tokens"),
      round(stop / nTok, 6).as("stopword_ratio"),
      round(uniq / nTok, 6).as("unique_ratio"),
      round(meanLen, 6).as("mean_token_len"),
      round(
        lit(0.25) * (lit(1.0) - stop / nTok) +
        lit(0.5) * (uniq / nTok) +
        lit(0.25) * least(meanLen / lit(8.0), lit(1.0)), 6).as("quality")): _*)
  }
}
