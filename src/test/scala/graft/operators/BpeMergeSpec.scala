package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-word pins for TextOps.bpeMergeIteration. The t23 fixture's
  * learned merges are all a ≠ b pairs, so the overlap-parity path — a
  * run of equal symbols, where greedy BPE merges every OTHER adjacency
  * — never executes against real data. These cases drive it directly
  * and compare against the sequential mutable-scan trainer.
  */
class BpeMergeSpec extends SparkSpec {

  /** (doc, word-index, word) → the operator's symbol-table input. */
  private def symbolTable(words: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    words.flatMap { case (d, wi, w) =>
      w.zipWithIndex.map { case (c, i) =>
        (d, wi, (i + 1).toLong, c.toString)
      }
    }.toDF("doc_id", "wi", "pos", "sym")
  }

  private def greedyMerge(syms: Vector[String], a: String, b: String)
      : (Vector[String], Int) = {
    val out = Vector.newBuilder[String]
    var i = 0; var merges = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); merges += 1; i += 2
      } else { out += syms(i); i += 1 }
    }
    (out.result(), merges)
  }

  /** Runs one iteration and returns (per-word merged symbol seqs,
    * (sym_a, sym_b, pair_count, n_before, n_merges, n_after)). */
  private def run(words: Seq[(Long, Long, String)])
      : (Map[(Long, Long), Seq[String]],
         (String, String, Long, Long, Long, Long)) = {
    val (next, report) =
      TextOps.bpeMergeIteration(symbolTable(words), 1)
    val merged = next.orderBy(col("doc_id"), col("wi"), col("pos"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val r = report.head()
    (merged, (r.getString(1), r.getString(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)))
  }

  private def check(words: Seq[(Long, Long, String)],
      expectPair: (String, String)): Unit = {
    val (merged, (a, b, c, nb, nm, na)) = run(words)
    assert((a, b) == expectPair, s"argmax pair ($a,$b) != $expectPair")
    val seqs = words.map { case (d, wi, w) =>
      (d, wi) -> greedyMerge(w.map(_.toString).toVector, a, b)
    }
    val expMerged = seqs.map { case (k, (v, _)) => k -> (v: Seq[String]) }
      .toMap
    assert(merged == expMerged,
      s"merged table diverges:\n got $merged\n exp $expMerged")
    val expMerges = seqs.map(_._2._2.toLong).sum
    val expBefore = words.map(_._3.length.toLong).sum
    assert((nb, nm, na) == ((expBefore, expMerges, expBefore - expMerges)),
      s"ledger ($nb,$nm,$na) != (${expBefore},$expMerges," +
        s"${expBefore - expMerges})")
    assert(c >= nm, s"pair_count $c < n_merges $nm")
  }

  test("even equal-symbol run merges every other adjacency (aaaa)") {
    // (a,a) appears 3 times but only 2 non-overlapping merges fit
    check(Seq((1L, 1L, "aaaa")), ("a", "a"))
  }

  test("odd equal-symbol run leaves the tail symbol (aaaaa)") {
    check(Seq((1L, 1L, "aaaaa")), ("a", "a"))
  }

  test("disjoint matches all merge (abab + extra ab)") {
    // (a,b)=3 beats (b,a)=1: both abab occurrences AND the lone ab merge
    check(Seq((1L, 1L, "abab"), (1L, 2L, "ab")), ("a", "b"))
  }

  test("count ties break to the lexicographically smallest pair") {
    // (x,y) and (y,x) both count 2 across words; (x,y) must win
    check(Seq((1L, 1L, "xyx"), (2L, 1L, "yxy")), ("x", "y"))
  }

  test("pairs never span word or document boundaries") {
    // four words ending b / starting a: if adjacency leaked across
    // words, (b,a) would dominate; within words only (a,b) exists
    check(Seq((1L, 1L, "ab"), (1L, 2L, "ab"),
      (2L, 1L, "ab"), (2L, 2L, "ab")), ("a", "b"))
  }

  test("merged symbols chain across iterations (cccc -> cc cc -> cccc)") {
    val t0 = symbolTable(Seq((1L, 1L, "cccc")))
    val (t1, _) = TextOps.bpeMergeIteration(t0, 1)
    val (t2, r2) = TextOps.bpeMergeIteration(t1, 2)
    val syms1 = t1.orderBy(col("pos")).collect().map(_.getString(3)).toSeq
    assert(syms1 == Seq("cc", "cc"), s"iteration 1 produced $syms1")
    val row = r2.head()
    assert((row.getString(1), row.getString(2)) == (("cc", "cc")))
    val syms2 = t2.orderBy(col("pos")).collect().map(_.getString(3)).toSeq
    assert(syms2 == Seq("cccc"), s"iteration 2 produced $syms2")
  }
}
