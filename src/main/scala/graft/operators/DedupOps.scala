package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Every primitive here is deterministic and engine-portable (the DuckDB
  * oracle recomputes identical values): the shared hash primitive is
  * md5 hex strings (identical in Spark and DuckDB), minhash minima are
  * lexicographic string minima, and float math is done in DOUBLE in
  * fixed element order.
  *
  * Scale posture (100 TB):
  *  - exact dedup is a hash-groupBy (partial agg, one shuffle on the hash);
  *  - MinHash/LSH: per-doc signatures are computed in a single explode →
  *    groupBy(doc) pass; candidate generation joins on *band keys* (an
  *    equi-join — O(candidates), never O(n²)); exact Jaccard runs only on
  *    candidates;
  *  - SimHash: one pass, 32 aggregates; banding on signature bytes makes
  *    the pair-join an equi-join;
  *  - embedding near-dup goes through LSH buckets (see VectorOps) before
  *    exact cosine.
  */
object DedupOps {

  /** Word tokens (text is single-space word soup; split and drop empties
    * so a trailing space can't mint a phantom token). */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Word k-gram shingles, 1-indexed positions, space-joined. Guarded:
    * Spark's sequence(1, 0) counts DOWN to [1, 0], so short inputs must
    * short-circuit to an empty array, not rely on greatest(). */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(
        sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: 8 hash functions derived from TWO md5 calls per
    * shingle (md5('a:'+sh) and md5('b:'+sh)), sliced into 8-hex-digit
    * (32-bit) sub-hashes; minima are lexicographic string minima —
    * portable across engines, and 4× cheaper than one md5 per hash
    * function (hashing dominates the signature pass at scale). */
  def minhashSignature(shingleSet: Column): Seq[Column] = {
    val hs0 = transform(shingleSet, sh => md5(concat(lit("a:"), sh)))
    val hs1 = transform(shingleSet, sh => md5(concat(lit("b:"), sh)))
    (0 until 8).map { i =>
      val (hs, off) = if (i < 4) (hs0, i) else (hs1, i - 4)
      array_min(transform(hs, h => substring(h, off * 8 + 1, 8))).as(s"mh$i")
    }
  }

  /** LSH band key: md5 over the band's signature slice + band index.
    * Docs sharing any band key become candidate pairs. */
  def bandKey(band: Int, sig: Seq[Column]): Column =
    md5(concat_ws("|", lit(band.toString) +: sig: _*))

  /** Exact dedup: canonical (minimum) id per md5(text); every duplicate
    * group is one row out. Pure hash-groupBy — map-side partial agg then
    * one shuffle on the 128-bit hash; no sort, no window. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** d07's seen set at 100 TB. The stream-static anti join re-plans the
    * static side each micro-batch; while the history is broadcastable
    * that is the right call, but a 100 TB pipeline's seen-hash history
    * is itself huge — re-broadcasting it per batch stops scaling first.
    * The scale form persists the history BUCKETED BY HASH: an anti join
    * against the bucketed table plans as sort-merge whose static side
    * reads bucket files in place — NO broadcast of the history, NO
    * shuffle of the history; only the incoming micro-batch exchanges
    * (O(batch), not O(history)). New hashes append into the same bucket
    * layout, so the property is stable across ingest cycles.
    * Plan shape pinned by SeenSetBucketingSpec. */
  def writeSeenSetBucketed(seen: DataFrame, table: String,
      buckets: Int = 64): Unit = {
    // the stale-location cleanup below derives the managed path as
    // <warehouse>/<table>; a qualified name ("db.tbl") or anything
    // path-like would make the recursive delete aim at the wrong
    // directory — refuse rather than guess (advisor, round 7)
    require(table.matches("[A-Za-z0-9_]+"),
      s"writeSeenSetBucketed needs an unqualified table name, got '$table'")
    val spark = seen.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // with the in-memory catalog a previous JVM's managed-table
    // LOCATION survives its (gone) catalog entry and saveAsTable
    // refuses to reuse it — remove the stale directory first
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    seen.write.bucketBy(buckets, "text_hash").sortBy("text_hash")
      .mode("overwrite").saveAsTable(table)
  }

  /** Anti-join `incoming` (must carry `text_hash`) against a seen-set
    * table written by [[writeSeenSetBucketed]]. The merge hint keeps the
    * planner off broadcast even when stale stats under-size the static
    * side — the bucketed sort-merge is the plan that survives history
    * growth. */
  def antiJoinSeenBucketed(spark: org.apache.spark.sql.SparkSession,
      incoming: DataFrame, table: String): DataFrame =
    incoming.join(spark.table(table).hint("merge"), Seq("text_hash"), "left_anti")

  /** Content-defined chunk boundaries over a word array (FastCDC's
    * rationale — Xia et al., USENIX ATC 2016 — re-expressed
    * declaratively): a boundary falls AFTER word i (4 ≤ i ≤ n−1) iff
    * the first hex digit of md5 over the 4-word window ending at i is
    * '0' (P = 1/16 ⇒ mean chunk ≈ 16 words; the window width is an
    * implicit 3-word minimum chunk). Boundaries depend only on local
    * CONTENT, never absolute position, so an edit near the head
    * re-synchronizes chunking within one window — the property that
    * makes chunk-level dedup robust to shifted/prefixed text where
    * fixed-width chunking misaligns forever (pinned by CdcStitchSpec).
    * Pure array expression — no explode, no shuffle, no state; the
    * caller materializes starts/ends as columns BEFORE slicing chunks
    * (lambda-CSE pitfall, see ARCHITECTURE.md). */
  def cdcBoundaries(w: Column, n: Column): Column =
    when(n >= 5,
      filter(sequence(lit(4), n - 1),
        i => substring(md5(concat_ws(" ", slice(w, i - 3, lit(4)))), 1, 1)
          === "0"))
      .otherwise(array().cast("array<int>"))

  /** 64-bit SimHash over word unigrams. A word's 64 bits come from TWO
    * md5 calls (md5('0:'+w), md5('1:'+w)): bit b is the low bit of hex
    * digit (b mod 32)+1 of the respective digest — so hashing cost is 2
    * md5s per word, not 64. The doc's bit b is the sign of the +1/-1 vote
    * sum over all word occurrences. Returns the signature as a '0'/'1'
    * string (portable; no 64-bit int needed). One explode + one groupBy
    * with 64 conditional-sum aggregates (single shuffle, partial agg). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    // Aggregate to (doc, word, count) first: hashing and the 64-way vote
    // then run once per DISTINCT word per doc, not once per occurrence —
    // on natural-language corpora that's a 3-10× row reduction before
    // the expensive pass (and the two-level agg is all map-side-partial).
    val wordCounts = docs
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h0", md5(concat(lit("0:"), col("w"))))
      .withColumn("h1", md5(concat(lit("1:"), col("w"))))
    val votes = (0 until 64).map { b =>
      val h = if (b < 32) col("h0") else col("h1")
      sum(when(substring(h, (b % 32) + 1, 1).isin(oddHex: _*), col("cnt"))
        .otherwise(-col("cnt"))).as(s"v$b")
    }
    wordCounts.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        concat((0 until 64).map(b =>
          when(col(s"v$b") > 0, "1").otherwise("0")): _*).as("simhash"))
  }
}
