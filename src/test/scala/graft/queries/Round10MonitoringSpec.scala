package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryRegistry, SparkSpec, Tables}

/** Semantic pins for the round-10 second-batch additions (q94 Mann–Whitney, q95
  * sequential CUSUM, q96 Gini concentration, q97 ACF, d25
  * capture–recapture). Discipline as in Round8/Round9 specs: the
  * oracle MIRRORS each query's formula, so a wrong-direction bug
  * reproduces identically in DuckDB and still hash-matches — these
  * tests re-derive each result through an INDEPENDENT implementation
  * (sequential rank walk, the literal clamped recursion, BigInt
  * rational arithmetic) and planted-truth fixtures (a known mean
  * shift, a known period, a known equal mixture).
  */
class Round10MonitoringSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exact floor((num/den)·1e9) as a raw Long — the two-stage e9
    * split the queries render (round 11: BIGINT on the gated surface,
    * no decimal); independent BigInt derivation here. */
  private def e9L(num: BigInt, den: BigInt): Long =
    (num * BigInt(1000000000) / den).toLong

  // -----------------------------------------------------------------
  // q94 Mann–Whitney U

  test("q94: a sequential sort-and-walk rank computation reproduces " +
    "n1/n2/R1/U1/ties, and z matches the closed form") {
    val rows = Tables(spark, dir, "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "en"))
    // sequential mid-rank walk over the sorted values (2x integers)
    val sorted = rows.sortBy(_._1)
    var i = 0
    var r1x2 = 0L
    var tieSum = 0L
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val t = j - i // tie-run length; 2·midrank = 2i + t + 1 (0-based)
      val rank2x = 2L * i + t + 1
      r1x2 += rank2x * sorted.slice(i, j).count(_._2)
      tieSum += t.toLong * t * t - t
      i = j
    }
    val n1 = rows.count(_._2).toLong
    val n2 = rows.length - n1
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val n = n1 + n2
    val varU = (n1.toDouble * n2.toDouble / 12.0) *
      ((n.toDouble + 1.0) - tieSum.toDouble / (n.toDouble * (n.toDouble - 1.0)))
    val zExp = BigDecimal(((u1x2 - n1 * n2).toDouble / 2.0) / math.sqrt(varU))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = QueryRegistry.byName("q94_mann_whitney").run(spark, dir)
      .collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2)
    assert(got.getLong(2) == r1x2, "rank sum (2x) diverged")
    assert(got.getLong(3) == u1x2, "U statistic (2x) diverged")
    assert(got.getLong(4) == n1 * n2, "null mean (2x) diverged")
    assert(got.getLong(5) == tieSum, "tie correction diverged")
    assert(math.abs(got.getDouble(6) - zExp) < 1e-9,
      s"z diverged: got ${got.getDouble(6)} expected $zExp")
  }

  test("q94 direction: a planted stochastically-larger group yields " +
    "U above its null mean and z > 0") {
    import spark.implicits._
    val d = tmpDir("mwu")
    // en docs all longer than the rest; one tie pair across groups
    val docs = (1 to 10).map(i => (i.toLong, "a", "en", 100L + i)) ++
      (11 to 20).map(i => (i.toLong, "a", "de", i.toLong)) :+
      (21L, "a", "de", 101L) // ties with the shortest en doc
    docs.toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = QueryRegistry.byName("q94_mann_whitney").run(spark, d)
      .collect().head
    assert(r.getLong(3) > r.getLong(4),
      "U1 must exceed n1·n2/2 when group 1 dominates")
    assert(r.getDouble(6) > 3.0, s"z should be large-positive: ${r.getDouble(6)}")
    assert(r.getLong(5) == 6L, "one tie pair of 2 => t^3 - t = 6")
  }

  // -----------------------------------------------------------------
  // q98 Kruskal–Wallis

  test("q98: the sequential rank walk reproduces per-group rank sums " +
    "and H matches the closed form") {
    val rows = Tables(spark, dir, "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sorted = rows.sortBy(_._1)
    var i = 0
    var tieSum = 0L
    val rg = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val t = j - i
      val rank2x = 2L * i + t + 1
      sorted.slice(i, j).foreach { case (_, g) => rg(g) += rank2x }
      tieSum += t.toLong * t * t - t
      i = j
    }
    val n = sorted.length.toLong
    val ng = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // the same exact e6 fixed-point term sum the query gates, via
    // BigInt floor division (no double enters until the final algebra)
    val rrE6 = ng.keys.toSeq.sorted.map { g =>
      val r2 = BigInt(rg(g)) * BigInt(rg(g))
      val d = BigInt(ng(g))
      (r2 / d) * 1000000 + ((r2 % d) * 1000000) / d
    }.sum
    val hRaw = (3.0 * (rrE6.toDouble / 1000000.0)) /
      (n.toDouble * (n.toDouble + 1.0)) - 3.0 * (n.toDouble + 1.0)
    val tieAdj = 1.0 - tieSum.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble)
    val hExp = hRaw / tieAdj
    val got = QueryRegistry.byName("q98_kruskal_wallis").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getDouble(6)))
    got.foreach { case (lang, gN, gR, ts, hs) =>
      assert(gN == ng(lang) && gR == rg(lang),
        s"$lang rank sum diverged: ($gN, $gR) vs (${ng(lang)}, ${rg(lang)})")
      assert(ts == tieSum)
      assert(math.abs(hs - hExp) < 1e-9, s"H diverged: $hs vs $hExp")
    }
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }

  test("q98 planted: fully separated groups maximize H; an all-tied " +
    "corpus NULLs it (tie_adj = 0 degenerate)") {
    import spark.implicits._
    val d = tmpDir("kw")
    // three languages on disjoint length levels -> H = k - 1 = ... for
    // fully separated groups H approaches n-based max; assert strongly
    // positive and ties only within groups
    ((1 to 10).map(i => (i.toLong, "a", "en", 100L + i)) ++
      (11 to 20).map(i => (i.toLong, "a", "de", 200L + i)) ++
      (21 to 30).map(i => (i.toLong, "a", "fr", 300L + i)))
      .toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val h = QueryRegistry.byName("q98_kruskal_wallis").run(spark, d)
      .collect().head.getDouble(6)
    // df = k-1 = 2; fully separated ranks give H near its maximum
    // (n-1)·... for 3 equal groups of 10: H = 25.8+ — assert > 20
    assert(h > 20.0, s"separated groups should give large H: $h")
    val d2 = tmpDir("kw2")
    (1 to 12).map(i => (i.toLong, "a", s"l${i % 3}", 7L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val r2 = QueryRegistry.byName("q98_kruskal_wallis").run(spark, d2)
      .collect().head
    assert(r2.isNullAt(6), "all-tied corpus must NULL the statistic")
  }

  // -----------------------------------------------------------------
  // q95 sequential CUSUM

  test("q95: the literal clamped recursion over collected daily " +
    "counts reproduces every cusum_up/cusum_dn row") {
    val daily = Tables(spark, dir, "events")
      .groupBy(expr("unix_millis(ts) DIV 86400000").as("d"))
      .agg(count(lit(1)).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val s = daily.map(_._2).sum
    val nd = daily.length.toLong
    var up = 0L
    var dn = 0L
    val expected = daily.map { case (d, x) =>
      val inc = nd * x - s
      up = math.max(0L, up + inc)
      dn = math.max(0L, dn - inc)
      (d, x, up, dn, up > 5 * s, dn > 5 * s)
    }
    val got = QueryRegistry.byName("q95_cusum_drift").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got == expected.toSeq, s"recursion diverged: got " +
      s"${got.take(3)} expected ${expected.take(3).toSeq}")
  }

  test("q95 planted shift: alarm fires after a 10x volume jump and " +
    "only after it") {
    import spark.implicits._
    val d = tmpDir("cusum")
    // 20 quiet days (10 events/day) then 10 loud days (100/day):
    // mean = 40, so the upward chart needs ceil(5*1200/60) = 100 i.e.
    // two loud days of +60 deviation each... assert alarm day > 20
    val rows = (0 until 20).flatMap(day => (0 until 10).map(i =>
      (day * 100L + i, day.toLong, i.toLong))) ++
      (20 until 30).flatMap(day => (0 until 100).map(i =>
        (day * 1000L + i, day.toLong, i.toLong)))
    rows.toDF("event_id", "day", "i")
      .select(col("event_id"),
        timestamp_micros(col("day") * 86400000000L + col("i") * 1000000L)
          .as("ts"),
        col("i").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = QueryRegistry.byName("q95_cusum_drift").run(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    val firstAlarm = out.find(_._4).map(_._1)
    assert(firstAlarm.exists(_ >= 20L),
      s"upward alarm must fire in the loud segment: ${out.toSeq}")
    assert(out.filter(_._1 < 20L).forall(!_._4),
      "no upward alarm during the quiet segment")
    // the reference is the retrospective GLOBAL mean, so the quiet
    // half sits BELOW it: the downward chart must accumulate across
    // the quiet days and strictly decay across the loud ones
    val dn = out.sortBy(_._1).map(_._3)
    assert(dn.take(20).sliding(2).forall(w => w(1) > w(0)),
      "downward chart should climb through the quiet segment")
    assert(dn.drop(20).sliding(2).forall(w => w(1) < w(0)),
      "downward chart should decay through the loud segment")
    // and the upward chart is pinned at 0 until the shift
    assert(out.sortBy(_._1).map(_._2).take(20).forall(_ == 0L),
      "upward chart must clamp at 0 below the mean")
  }

  // -----------------------------------------------------------------
  // q96 Gini

  test("q96: BigInt rational Gini over collected per-source masses " +
    "matches, including the e9 rendering bit-for-bit") {
    val xs = Tables(spark, dir, "documents")
      .groupBy(col("source")).agg(sum(col("n_chars")).cast("long").as("x"))
      .collect().map(r => (r.getLong(1), r.getString(0)))
    val sorted = xs.sortBy(identity).map(_._1)
    val n = BigInt(sorted.length)
    val tot = sorted.map(BigInt(_)).sum
    val wsum = sorted.zipWithIndex.map { case (x, i) =>
      BigInt(i + 1) * x }.sum
    val gNum = 2 * wsum - (n + 1) * tot
    val gDen = n * tot
    val got = QueryRegistry.byName("q96_gini_concentration")
      .run(spark, dir).collect().head
    assert(got.getLong(0) == n.toLong && got.getLong(1) == tot.toLong)
    assert(got.getLong(2) == gNum.toLong && got.getLong(3) == gDen.toLong)
    assert(got.getLong(4) == e9L(gNum, gDen),
      "gini e9 rendering diverged from the BigInt floor ratio")
    assert(got.getLong(5) ==
      e9L(BigInt(sorted.max), tot), "top1_share diverged")
  }

  test("q96 planted: an exactly equal mixture has gini 0; a " +
    "one-source corpus has top1_share 1") {
    import spark.implicits._
    val d = tmpDir("gini")
    (1 to 30).map(i => (i.toLong, "x" * 40, "en", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = QueryRegistry.byName("q96_gini_concentration")
      .run(spark, d).collect().head
    assert(r.getLong(2) == 0L, "equal masses must yield g_num = 0")
    assert(r.getLong(4) == 0L, "zero numerator must render gini_e9 = 0")
  }

  // -----------------------------------------------------------------
  // q97 ACF

  test("q97: BigInt re-derivation of every lag row (pairs, moments, " +
    "e9 quotient with carried sign)") {
    val daily = Tables(spark, dir, "events")
      .groupBy(expr("unix_millis(ts) DIV 86400000").as("d"))
      .agg(count(lit(1)).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val s = daily.map(_._2).sum
    val nd = daily.length.toLong
    val y = daily.map { case (d, x) => (d, BigInt(nd * x - s)) }.toMap
    val den = y.values.map(v => v * v).sum
    val expected = (1 to 7).map { k =>
      val pairs = y.keys.toSeq.filter(d => y.contains(d - k))
      val num = pairs.map(d => y(d) * y(d - k)).sum
      val acf = num.signum.toLong * e9L(num.abs, den)
      (k.toLong, pairs.size.toLong, num.toLong, den.toLong, acf)
    }
    val got = QueryRegistry.byName("q97_acf").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected,
      s"ACF diverged: got ${got.take(2)} expected ${expected.take(2)}")
  }

  test("q97 planted period: an alternating high/low series has " +
    "acf(1) strongly negative and acf(2) strongly positive") {
    import spark.implicits._
    val d = tmpDir("acf")
    val rows = (0 until 20).flatMap { day =>
      val k = if (day % 2 == 0) 30 else 10
      (0 until k).map(i => (day * 1000L + i, day.toLong, i.toLong))
    }
    rows.toDF("event_id", "day", "i")
      .select(col("event_id"),
        timestamp_micros(col("day") * 86400000000L + col("i") * 1000000L)
          .as("ts"),
        col("i").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val acf = QueryRegistry.byName("q97_acf").run(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(4))
      .toMap
    assert(acf(1L) <= -900000000L, s"lag-1 should be ~ -1e9: $acf")
    assert(acf(2L) >= 900000000L, s"lag-2 should be ~ +1e9: $acf")
  }

  // -----------------------------------------------------------------
  // ws12 streaming CUSUM

  test("ws12: landed day counts are the ON-TIME subset (late replay " +
    "dropped) and the chart equals the literal recursion over them") {
    val onTime = Tables(spark, dir, "events")
      .filter(col("event_id") % 3 =!= 0)
      .groupBy(expr("unix_millis(ts) DIV 86400000").as("d"))
      .agg(count(lit(1)).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val all = Tables(spark, dir, "events").count()
    val s = onTime.map(_._2).sum
    assert(s < all, "fixture must carry a late (%3 == 0) subset")
    val nd = onTime.length.toLong
    var up = 0L
    var dn = 0L
    val expected = onTime.map { case (d, x) =>
      val inc = nd * x - s
      up = math.max(0L, up + inc)
      dn = math.max(0L, dn - inc)
      (d * 86400000L, x, up, dn)
    }
    val got = QueryRegistry.byName("ws12_stream_cusum").run(spark, dir)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected.toSeq,
      s"stream chart diverged: got ${got.take(3)} expected " +
        s"${expected.take(3).toSeq}")
  }

  // -----------------------------------------------------------------
  // d25 capture–recapture

  test("d25: catcher counts equal the audited d02/d03 pair sets, and " +
    "the Chapman algebra matches a BigInt re-derivation") {
    val pa = QueryRegistry.byName("d02_minhash_lsh").run(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pb = QueryRegistry.byName("d03_simhash").run(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (n1, n2, m) = (BigInt(pa.size), BigInt(pb.size),
      BigInt((pa & pb).size))
    val union = BigInt((pa | pb).size)
    val nHat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val got = QueryRegistry.byName("d25_capture_recapture")
      .run(spark, dir).collect().head
    assert(got.getLong(0) == n1.toLong && got.getLong(1) == n2.toLong,
      "catcher counts must equal the d02/d03 result sets")
    assert(got.getLong(2) == m.toLong && got.getLong(3) == union.toLong)
    assert(got.getLong(4) == nHat.toLong, "Chapman floor diverged")
    assert(got.getLong(5) == (nHat - union).max(BigInt(0)).toLong)
    assert(got.getLong(6) == e9L(union, nHat))
    // sanity on the fixture: both catchers catch, they overlap, and
    // the estimator is at least the observed union
    assert(n1 > 0 && n2 > 0 && m > 0, s"degenerate fixture: $n1 $n2 $m")
    assert(nHat >= union, "Chapman below the observed union")
  }
}
