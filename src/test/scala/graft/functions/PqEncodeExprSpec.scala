package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VectorOps

/** [[PqEncodeCodes]] must reproduce the column formulation it replaced
  * — m array_max trees over k literal-scored structs — bit-for-bit on
  * every input that formulation could evaluate. On the degenerate
  * corners the legacy form could NOT evaluate (zero-norm slices make
  * its ANSI `Divide` throw DIVIDE_BY_ZERO), the native expression is
  * deliberately total: NaN cosines order greatest-and-equal (the same
  * SQLOrderingUtil semantics array_max applied), so a degenerate
  * subspace deterministically takes its lowest code id instead of
  * killing a 100 TB encode job. It must also keep the encode projection
  * inside whole-stage codegen at the geometry that broke the column
  * form (m=16, k=16 blew janino's 64 KB method limit). */
class PqEncodeExprSpec extends SparkSpec {

  /** The pre-round-6 column formulation, kept here as the parity
    * reference. */
  private def legacyCodes(cbs: IndexedSeq[Seq[(Long, Seq[Double])]],
      subDims: Int): Seq[org.apache.spark.sql.Column] =
    cbs.indices.map { m =>
      val sub = expr(s"slice(v, ${m * subDims + 1}, $subDims)")
      val vnorm = VectorOps.norm(sub)
      val scored = array(cbs(m).map { case (pid, pv) =>
        val cnorm = math.sqrt(pv.foldLeft(0.0)((acc, x) => acc + x * x))
        struct(
          round(VectorOps.dot(sub, typedLit(pv)) / (vnorm * lit(cnorm)), 6)
            .as("pcos"),
          lit(-pid).as("neg_pivot"))
      }: _*)
      (-array_max(scored).getField("neg_pivot")).as(s"legacy$m")
    }

  /** Plain-Scala reference mirroring slice-truncation, index-order
    * folds, HALF_UP rounding and the tie/NaN ordering — independent of
    * both Column formulations. */
  private def referenceCodes(v: Seq[Double],
      cbs: IndexedSeq[Seq[(Long, Seq[Double])]], subDims: Int): Seq[Long] =
    cbs.indices.map { m =>
      val sub = v.slice(m * subDims, m * subDims + subDims)
      val vn = math.sqrt(sub.foldLeft(0.0)((a, x) => a + x * x))
      val scored = cbs(m).map { case (pid, pv) =>
        val cn = math.sqrt(pv.foldLeft(0.0)((a, x) => a + x * x))
        val d = sub.zip(pv).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val raw = d / (vn * cn)
        val cos = if (raw.isNaN || raw.isInfinity) raw
          else java.math.BigDecimal.valueOf(raw)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (cos, pid)
      }
      scored.reduceLeft { (best, cur) =>
        val cmp = if (cur._1 == best._1) 0
          else java.lang.Double.compare(cur._1, best._1)
        if (cmp > 0 || (cmp == 0 && cur._2 < best._2)) cur else best
      }._2
    }

  private def randomCodebooks(m: Int, k: Int, subDims: Int, seed: Long)
      : IndexedSeq[Seq[(Long, Seq[Double])]] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).map(_ => (0 until k).map(c =>
      c.toLong -> Seq.fill(subDims)(rnd.nextDouble() * 2 - 1)).toSeq)
  }

  test("native codes match the legacy column formulation bit-for-bit") {
    import spark.implicits._
    val m = 4; val subDims = 4; val k = 8
    val cbs = randomCodebooks(m, k, subDims, seed = 7)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 500).map(i =>
      (i.toLong, Seq.fill(m * subDims)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("vec_id", "v")
    val out = VectorOps.pqEncode(df, cbs, subDims)
      .select(Seq(col("vec_id")) ++ cbs.indices.map(i => col(s"code$i")) ++
        legacyCodes(cbs, subDims): _*)
    val bad = out.filter(cbs.indices
      .map(i => col(s"code$i") =!= col(s"legacy$i")).reduce(_ || _))
    assert(bad.count() == 0,
      s"native/legacy disagree:\n${bad.limit(5).collect().mkString("\n")}")
    // and against the independent Scala reference
    val got = VectorOps.pqEncode(df, cbs, subDims)
      .select(col("vec_id") +: cbs.indices.map(i => col(s"code$i")): _*)
      .collect().map(r => r.getLong(0) ->
        cbs.indices.map(i => r.getLong(i + 1))).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == referenceCodes(v, cbs, subDims), s"vec $id")
    }
  }

  test("degenerate corners are total: NaN subspaces take the lowest code") {
    import spark.implicits._
    val m = 4; val subDims = 4
    val cbs = randomCodebooks(m, k = 8, subDims, seed = 7)
    // the legacy form THROWS on these (ANSI divide-by-zero on the
    // zero-norm slice); the native expression must instead produce the
    // reference's deterministic assignment
    val rows = Seq(
      (9001L, Seq.fill(m * subDims)(0.0)),        // all-zero vector
      (9002L, Seq.fill(subDims)(1.0) ++ Seq.fill(subDims)(0.0) ++
        Seq.fill(2 * subDims)(0.5)),              // one zero subvector
      (9003L, Seq.fill(subDims + 2)(0.7)),        // short: truncated tail
      (9004L, Seq.empty[Double]))                 // empty vector
    val got = VectorOps.pqEncode(rows.toDF("vec_id", "v"), cbs, subDims)
      .select(col("vec_id") +: cbs.indices.map(i => col(s"code$i")): _*)
      .collect().map(r => r.getLong(0) ->
        cbs.indices.map(i => r.getLong(i + 1))).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == referenceCodes(v, cbs, subDims), s"vec $id: ${got(id)}")
    }
    // the all-NaN subspaces really did tie to the lowest code id
    assert(got(9001L) == Seq(0L, 0L, 0L, 0L))
    assert(got(9002L)(1) == 0L)
  }

  test("m=16 k=16 encode stays inside whole-stage codegen") {
    // spark.range input so the projection cannot constant-fold into a
    // LocalTableScan — the generated stage must actually compile
    val df = spark.range(50).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => sin(col("id") * 64 + i.cast("double") + 1.0)).as("v"))
    val cbs = randomCodebooks(16, 16, 4, seed = 3)
    val enc = VectorOps.pqEncode(df, cbs, 4)
    val plan = enc.queryExecution.executedPlan.toString
    // the encode Project must carry the WholeStageCodegen star — the
    // legacy form dropped the stage to interpreted eval here
    assert(plan.contains("pq_encode_codes"), plan)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    // and it must actually execute (janino failure would WARN + fall
    // back silently; the count proves the generated path runs)
    assert(enc.select(countDistinct(col("code0"))).head.getLong(0) >= 1)
  }
}
