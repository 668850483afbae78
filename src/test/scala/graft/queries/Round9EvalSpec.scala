package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryRegistry, SparkSpec, Tables}

/** Round-9 audit additions, re-derived by independent plain-Scala
  * implementations (the Round8EvalSpec discipline) plus planted-signal
  * detection (the EvalDetectionSpec discipline): q84's χ²/Cramér's V
  * must flag a constructed source→lang dependency and stay quiet on
  * independence; q85's Spearman must hit ±1 exactly on planted
  * monotone data. */
class Round9EvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
  }

  test("q84: plain-Scala contingency recount reproduces every cell, " +
    "chi2 and V") {
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val o = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rT = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cT = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = docs.length.toLong
    // the round-10 gated surface: term as an exact split floor ratio
    // at 1e-6 scale, chi2 its exact BIGINT sum, V² as an exact e9
    // floor ratio — replicated here in plain Long math
    def termE6(d2: Long, den: Long): Long =
      (d2 / den) * 1000000L + ((d2 % den) * 1000L / den) * 1000L +
        (((d2 % den) * 1000L % den) * 1000L) / den
    val cells = for (s <- rT.keys.toSeq.sorted; l <- cT.keys.toSeq.sorted)
      yield {
        val (r, c) = (rT(s), cT(l))
        val ob = o.getOrElse((s, l), 0L)
        val diff = ob * n - r * c
        val te6 = termE6(diff * diff, n * r * c)
        // semantic anchor: the pinned-scale term sits within 1e-6 of
        // the real-valued chi-square term
        assert(math.abs(te6 / 1e6 -
          diff.toDouble * diff / (n.toDouble * r * c)) < 1e-6 + 1e-9,
          s"split floor ratio off at ($s,$l)")
        val expE9 = r * c * 1000000000L / n
        (s, l, ob, expE9, te6)
      }
    val chi2E6 = cells.map(_._5).sum
    val m1 = math.min(rT.size, cT.size).toLong - 1L
    val v2E9 = chi2E6 * 1000L / (n * m1)
    val band =
      if (chi2E6 < n * m1 * 10000L) "negligible"
      else if (chi2E6 < n * m1 * 90000L) "weak"
      else "strong"
    val got = QueryRegistry.byName("q84_source_lang_independence")
      .run(spark, dir).collect()
    assert(got.length == cells.length)
    got.zip(cells).foreach { case (g, e) =>
      assert((g.getString(0), g.getString(1), g.getLong(2),
        g.getLong(3), g.getLong(4),
        g.getLong(5), g.getLong(6), g.getString(7)) ==
        (e._1, e._2, e._3, e._4, e._5, chi2E6, v2E9, band),
        s"cell mismatch: got $g expected $e (chi2_e6=$chi2E6 " +
          s"v2_e9=$v2E9 band=$band)")
    }
  }

  test("q84: planted source-determined language is 'strong' (V = 1); " +
    "planted balanced independence is 'negligible' (V = 0)") {
    val dep = tmpDir("r9-dep")
    // 4 sources, each writing ONLY its own language
    writeDocs(dep, (0L until 200L).map(i =>
      (i, s"w$i text", s"lang${i % 4}", s"src${i % 4}")))
    val depRows = QueryRegistry
      .byName("q84_source_lang_independence").run(spark, dep).collect()
    assert(depRows.forall(_.getString(7) == "strong"),
      s"dependency not flagged: ${depRows.head}")
    assert(depRows.head.getLong(6) == 1000000000L,
      s"deterministic mapping must score V²_e9 = 1e9, got " +
        s"${depRows.head.getLong(6)}")
    val ind = tmpDir("r9-ind")
    // perfectly balanced grid: every (source, lang) cell equal
    writeDocs(ind, (0L until 200L).map(i =>
      (i, s"w$i text", s"lang${i % 4}", s"src${(i / 4) % 5}")))
    val indRows = QueryRegistry
      .byName("q84_source_lang_independence").run(spark, ind).collect()
    assert(indRows.forall(_.getString(7) == "negligible"),
      s"balanced grid flagged: ${indRows.head}")
    assert(indRows.head.getLong(5) == 0L,
      "exact balance has chi2 0")
  }

  test("q85: plain-Scala tie-averaged Spearman reproduces the moments " +
    "and rho; the fixture's quality-length anti-correlation is real") {
    val rows = Tables(spark, dir, "documents")
      .select(col("text"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def qe6(text: String): Long = {
      val ts = text.split(" ").filter(_.nonEmpty)
      val n = ts.length.toLong
      val s = ts.count(w => w == "a" || w == "the").toLong
      val u = ts.distinct.length.toLong
      val mNum = text.length.toLong - n + 1
      ((8 * (n - s) + 16 * u + math.min(mNum, 8 * n)) * 2000000L +
        32 * n) / (64 * n)
    }
    val xs = rows.map(r => qe6(r._1))
    val ys = rows.map(_._1.length.toLong)
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      val first = sorted.zipWithIndex.reverse.toMap // first idx per v
      val last = sorted.zipWithIndex.toMap
      vs.distinct.map(v => v -> (first(v) + 1L + last(v) + 1L)).toMap
    }
    val (rx, ry) = (ranks2(xs.toSeq), ranks2(ys.toSeq))
    val pts = xs.zip(ys).map { case (a, b) => (rx(a), ry(b)) }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val rho = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    val g = QueryRegistry.byName("q85_quality_length_spearman")
      .run(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
      g.getLong(4), g.getLong(5), g.getDouble(6)) ==
      (n, sx, sy, sxx, syy, sxy, rho), s"spearman diverges: $g vs " +
      s"($n,$sx,$sy,$sxx,$syy,$sxy,$rho)")
    assert(sx == n * (n + 1) && sy == n * (n + 1),
      "tie-averaged 2-ranks must sum to n(n+1)")
    // the audit's actual finding on this corpus
    assert(rho < -0.9, s"expected strong anti-correlation, got $rho")
  }

  test("q85: planted monotone quality-in-length scores exactly -1") {
    val mono = tmpDir("r9-mono")
    // longer docs repeat one token more -> unique ratio falls strictly
    // with length (qNum = 11i + 49 over 32(i+1), monotone), no ties in
    // either variable; the fixed-width suffix keeps char counts
    // digit-jump free
    writeDocs(mono, (1L to 60L).map { i =>
      val text = ("tok " * i.toInt).trim + f" unique$i%03d"
      (i, text, "en", "src0")
    })
    val r = QueryRegistry.byName("q85_quality_length_spearman")
      .run(spark, mono).collect().head
    // numerator = -denominator in exact arithmetic; the rendered
    // double is within an ulp of -1 because sqrt(a)*sqrt(a) != a in
    // IEEE (same in both engines — the gate hashes the same double)
    assert(math.abs(r.getDouble(6) + 1.0) < 1e-12,
      s"planted monotone must be -1 within an ulp, got " +
        s"${r.getDouble(6)}")
    // the exact-integer identity, free of the sqrt: num^2 == den^2
    val (n, sx, sy, sxx, syy, sxy) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val num = n * sxy - sx * sy
    assert(num < 0 &&
      num * num == (n * sxx - sx * sx) * (n * syy - sy * sy),
      "exact moments must witness perfect anti-correlation")
  }
}
