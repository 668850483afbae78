package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryRegistry, SparkSpec, Tables}
import graft.operators.SketchOps

/** Round-11 additions: the q92b/q92c from-store answer legs that
  * complete the q92 sketch-store contract (VERDICT r10 task #5 — a
  * quantile and a heavy-hitter question answered from persisted bytes
  * alone). Discipline as in Round10AdditionsSpec: planted-truth
  * fixtures plus independent plain-Scala recounts of the exact gated
  * surfaces and direct byte-level checks of the store answers. */
class Round11AdditionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def writeEvents(d: String,
      rows: Seq[(Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts",
        timestamp_micros(lit(1704067200000000L) + col("event_id")))
      .withColumn("props", lit("""{"k":1}"""))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/events.parquet")
  }

  // -----------------------------------------------------------------
  // q92b quantiles from the store

  test("q92b: exact per-type quantile values match a plain-Scala " +
    "sorted recount at the integer ceiling ranks; all flags true") {
    val byType = Tables(spark, dir, "events")
      .select(col("event_type"), col("value"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(identity).map(_._1).toIndexedSeq)
      .toMap
    val ratios = Seq((0.25, 1L, 4L), (0.5, 1L, 2L), (0.9, 9L, 10L))
    val expected = (for {
      (t, vs) <- byType.toSeq
      (q, qn, qd) <- ratios
    } yield {
      val n = vs.length.toLong
      val rk = math.max(1L, (qn * n + qd - 1) / qd)
      ((t, q), (n, vs((rk - 1).toInt)))
    }).toMap
    val got = QueryRegistry.byName("q92b_store_quantiles")
      .run(spark, dir).collect()
    assert(got.length == expected.size,
      s"row count ${got.length} != ${expected.size}")
    got.foreach { r =>
      val key = (r.getString(0), r.getDouble(1))
      val (n, v) = expected(key)
      assert(r.getLong(2) == n && r.getDouble(3) == v,
        s"$key: got (${r.getLong(2)}, ${r.getDouble(3)}) want ($n, $v)")
      assert(r.getBoolean(4), s"$key: within_rank_eps false — the " +
        "store's KLL estimate fell outside the doubled rank-eps bracket")
    }
  }

  test("q92b planted: a known uniform ladder per type yields the " +
    "literal ceiling-rank order statistics, answered with flags true") {
    val d = tmpDir("r11-q92b")
    // click: values 1..100; view: values 1..40 (distinct sizes so the
    // per-type ceiling ranks differ)
    writeEvents(d,
      (1L to 100L).map(i => (i, i, "click", i.toDouble)) ++
        (1L to 40L).map(i => (1000L + i, i, "view", i.toDouble)))
    val got = QueryRegistry.byName("q92b_store_quantiles")
      .run(spark, d).collect()
      .map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // click n=100: ranks 25/50/90 -> values 25, 50, 90
    assert(got(("click", 0.25)) == ((100L, 25.0, true)))
    assert(got(("click", 0.5)) == ((100L, 50.0, true)))
    assert(got(("click", 0.9)) == ((100L, 90.0, true)))
    // view n=40: ceil(10)/ceil(20)/ceil(36) -> values 10, 20, 36
    assert(got(("view", 0.25)) == ((40L, 10.0, true)))
    assert(got(("view", 0.5)) == ((40L, 20.0, true)))
    assert(got(("view", 0.9)) == ((40L, 36.0, true)))
  }

  test("q92b store purity: kllQuantilesFromStore answers from bytes " +
    "written by a DIFFERENT session pass, exactly (small-n exact mode)") {
    val d = tmpDir("r11-q92b-store")
    writeEvents(d, (1L to 100L).map(i => (i, i, "click", i.toDouble)))
    val store = tmpDir("r11-q92b-tbl") + "/sketch_store"
    SketchOps.writeSketchStore(Tables(spark, d, "events"),
      col("event_type"), col("user_id"), col("value"), col("user_id"),
      store)
    // 100 updates < the k=200 buffer: the sketch has never compacted,
    // so the INCLUSIVE quantile is the exact order statistic
    val ans = SketchOps.kllQuantilesFromStore(spark, store,
      Seq(0.25, 0.5, 0.9)).map(t => (t._2, t._3)).toMap
    assert(ans(0.25) == 25.0 && ans(0.5) == 50.0 && ans(0.9) == 90.0,
      s"exact-mode store answers diverged: $ans")
  }

  // -----------------------------------------------------------------
  // q92c heavy hitters from the store

  test("q92c: exact per-type top-5 matches a plain-Scala recount " +
    "(count desc, user_id tie-break); all flags true") {
    val counts = Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq
      .map { case ((t, u), n) => (t, u, n) }
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (-x._3, x._2)).take(5)
        .sortBy(_._2))
      .toMap
    val got = QueryRegistry.byName("q92c_store_heavy_users")
      .run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    val gotByType = got.groupBy(_._1)
    assert(gotByType.keySet == expected.keySet)
    expected.foreach { case (t, exp) =>
      assert(gotByType(t).map(x => (x._1, x._2, x._3)).toSeq == exp,
        s"$t: top-5 diverged: ${gotByType(t).toSeq} vs $exp")
    }
    got.foreach { r =>
      assert(r._4 && r._5, s"flags false on $r — the stored freq " +
        "sketch violated a structurally-true Misra-Gries guarantee")
    }
  }

  test("q92c planted: a dominant user is answered from the store with " +
    "an exact-mode estimate equal to its true count") {
    val d = tmpDir("r11-q92c")
    // user 7 fires 50 clicks; 60 other users once each (well under
    // 0.75*1024 distinct keys -> the freq sketch never purges)
    writeEvents(d,
      (1L to 50L).map(i => (i, 7L, "click", 1.0)) ++
        (1L to 60L).map(i => (100L + i, 1000L + i, "click", 1.0)))
    val store = tmpDir("r11-q92c-tbl") + "/sketch_store"
    SketchOps.writeSketchStore(Tables(spark, d, "events"),
      col("event_type"), col("user_id"), col("value"), col("user_id"),
      store)
    val (rows, errs) = SketchOps.freqEstimatesFromStore(spark, store)
    assert(errs == Seq(("click", 0L)),
      s"exact mode expected (no purges), got maxError $errs")
    val u7 = rows.find(r => r._1 == "click" && r._2 == 7L).get
    assert(u7._3 == 50L && u7._4 == 50L && u7._5 == 50L,
      s"exact-mode estimate must equal the true count: $u7")
    // and the registry query reports user 7 first with flags true
    val got = QueryRegistry.byName("q92c_store_heavy_users")
      .run(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getBoolean(4)))
    assert(got.length == 5)
    assert(got.exists(_ == ((7L, 50L, true, true))),
      s"dominant user missing from the gated top-5: ${got.toSeq}")
  }
}
