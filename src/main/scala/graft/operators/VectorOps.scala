package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over embedding columns (array<float>), built on
  * Catalyst higher-order functions (zip_with / aggregate) so everything
  * stays codegen-friendly — no UDFs, no driver-side math.
  *
  * Determinism: elements are cast to DOUBLE before any arithmetic and
  * folded in index order (aggregate() is an ordered left fold; the DuckDB
  * oracle unnests with ordinality and sums in the same order), so Spark
  * and DuckDB produce bit-identical doubles.
  *
  * Scale posture (100 TB): brute-force cosine top-k broadcasts the small
  * query set and scans the corpus once (per-partition heaps via
  * row_number window over a bounded candidate set); the scale path is
  * sign-random-projection LSH bucketing — an equi-join on bucket keys
  * that turns O(n·q) into O(candidates).
  */
object VectorOps {

  import org.apache.spark.sql.graft.ColumnBridge.{column => ofExpr, expression => ofCol}

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product in index order; inputs must be array<double>. Native
    * codegen'd expression (graft.functions.DotProductDouble) — the
    * higher-order-function form `fsum(zip_with(a, b, _ * _))` folds
    * interpreted; this emits the identical-order loop inside
    * whole-stage codegen (bit-identical doubles, ~an order of magnitude
    * on the ANN hot path). */
  def dot(a: Column, b: Column): Column =
    ofExpr(graft.functions.DotProductDouble(ofCol(a), ofCol(b)))

  def norm(a: Column): Column =
    sqrt(ofExpr(graft.functions.SumSquaresDouble(ofCol(a))))

  /** int8 scalar quantization (8× smaller than the double corpus): codes
    * as a binary column, decoded inside the scan. Native codegen'd
    * expressions (graft.functions.Sq8Encode/Sq8Dequant). */
  def sq8Encode(v: Column, mins: Column, steps: Column): Column =
    ofExpr(graft.functions.Sq8Encode(ofCol(v), ofCol(mins), ofCol(steps)))

  def sq8Dequant(codes: Column, mins: Column, steps: Column): Column =
    ofExpr(graft.functions.Sq8Dequant(ofCol(codes), ofCol(mins), ofCol(steps)))

  /** Cosine similarity, rounded to 6 decimals — the rounding is part of
    * the contract (both engines round the same double, so threshold
    * comparisons on the rounded value agree bit-for-bit). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Cosine against norms precomputed BEFORE a join: inside an n×q
    * candidate join, `cosine` would refold each side's norm once per
    * PAIR; carrying `norm(v)` as a column on each side computes it once
    * per ROW (n + q folds instead of n·q). Same doubles — the norm fold
    * is the identical index-order loop wherever it runs. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  /** Sign-random-projection LSH bucket: `bits` pseudo-random hyperplanes,
    * where hyperplane b's weight for dimension i is ±1 from the low bit
    * of the first hex digit of md5(b:i) — reproducible in any engine with
    * md5. Bucket = the '0'/'1' sign string of the projections.
    *
    * Weights ride as literal arrays and the projection is one
    * zip_with+aggregate fold per bit (same dim-order fold as an expanded
    * sum — identical doubles) — a (bits × dims)-term expression tree
    * previously made codegen pathological. */
  def srpBucket(v: Column, dims: Int, bits: Int): Column =
    concat(srpBits(v, dims, bits): _*)

  /** The individual sign columns behind [[srpBucket]] — exposed so
    * callers can regroup bits into STRIPED bands (bit i → band i mod
    * nBands). mm05's recall spec showed contiguous bands lose true
    * pairs; stripes decorrelate band membership from bit position. */
  def srpBits(v: Column, dims: Int, bits: Int): Seq[Column] = {
    val oddHex = Set("1", "3", "5", "7", "9", "b", "d", "f")
    def weight(b: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$b:$i".getBytes("UTF-8"))
      if (oddHex.contains(f"${h(0) & 0xff}%02x".substring(0, 1))) 1.0 else -1.0
    }
    (0 until bits).map { b =>
      val w = typedLit((0 until dims).map(i => weight(b, i)))
      when(dot(v, w) > 0, "1").otherwise("0")
    }
  }

  /** IVF coarse quantizer trained by spherical k-means (Lloyd): init =
    * the `k` lowest vec_ids' vectors, `iters` assignment/recenter rounds.
    * Centroid components are `round(avg, 6)` — cross-row float sums are
    * the one place engines could diverge in the last ulp, and the
    * rounding pins the quantizer so any engine reproduces it exactly
    * (the DuckDB oracle unrolls the same rounds).
    *
    * The model (k × dims doubles) lives on the driver — the standard
    * iterative-trainer shape (spark.ml KMeans does the same). Each round
    * is ONE scan: cell assignment is a shuffle-free projection (the
    * centroids ride as literals), and recentering is `dims` columnar
    * partial-aggregated avg()s — no explode, no window, no join.
    * Input: (vec_id, v: array<double>); output: (pivot_id, centroid).
    *
    * Contract: a Lloyd round that assigns a centroid zero vectors DROPS
    * that centroid (the model may shrink below k) — deterministic, and
    * deliberately NOT re-seeded: the s04 oracle reproduces the identical
    * recenter in SQL (GROUP BY pivot_id drops the empty cell the same
    * way), so both engines converge on the same model. Callers that
    * need exactly k cells must re-seed themselves. */
  def kmeansCentroids(base: org.apache.spark.sql.DataFrame, k: Int,
      iters: Int, dims: Int): Seq[(Long, Seq[Double])] = {
    var c: Seq[(Long, Seq[Double])] = base.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long"), col("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq.sortBy(_._1)
    for (_ <- 0 until iters) {
      val avgs = (0 until dims).map(i =>
        round(avg(col("v").getItem(i)), 6).as(s"c$i"))
      c = assignCells(base, c, 1)
        .groupBy(col("pivot_id"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> (1 to dims).map(r.getDouble).toSeq)
        .toSeq.sortBy(_._1)
    }
    c
  }

  /** Route each vector to its `nprobe` nearest centroids by cosine
    * (ties: lowest pivot_id) — one codegen'd projection per row, no
    * join/shuffle/window: the k candidate (cosine, pivot) structs sort
    * in-row and the top nprobe explode out. Negating the pivot id makes
    * the single array_sort order exactly (pcos DESC, pivot_id ASC)
    * after reversal. Output: input columns + pivot_id. */
  def assignCells(vecs: org.apache.spark.sql.DataFrame,
      centroids: Seq[(Long, Seq[Double])], nprobe: Int,
      normCol: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    // higher-order-function folds run interpreted — keep them minimal:
    // the row norm folds ONCE per row (or rides in via `normCol` when
    // the caller already carries it — same index-order fold, identical
    // double), each centroid costs one dot fold (its own norm is a
    // driver-side constant)
    val vnorm = normCol.map(col).getOrElse(norm(col("v")))
    val scored = array(centroids.map { case (pid, pv) =>
      val cnorm = math.sqrt(pv.foldLeft(0.0)((acc, x) => acc + x * x))
      struct(
        round(dot(col("v"), typedLit(pv)) / (col("__vnorm") * lit(cnorm)), 6)
          .as("pcos"),
        lit(-pid).as("neg_pivot"))
    }: _*)
    val top = slice(reverse(array_sort(scored)), 1, nprobe)
    vecs.withColumn("__vnorm", vnorm)
      .withColumn("__cell", explode(top))
      .withColumn("pivot_id", -col("__cell.neg_pivot"))
      .select(vecs.columns.map(col) :+ col("pivot_id"): _*)
  }

  /** Per-subspace product-quantization codebooks, ALL subspaces trained
    * in ONE scan per Lloyd round: encoding every subspace is a single
    * collapsed projection (m chained [[assignCells]] on slices), and
    * recentering explodes to (m, code, subvector) rows so one
    * partial-agg'd shuffle recenters every codebook at once — 1 + iters
    * jobs total instead of m × (1 + 2·iters) (the per-subspace-trainer
    * shape that made s07/s08 job-overhead-bound at 16 subspaces).
    * Per-subspace math is identical to [[kmeansCentroids]]: init = the
    * k lowest vec_ids' slices, assignment ties to the lowest code,
    * round(avg, 6) recenter, empty cells drop (per subspace). */
  def pqTrain(base: org.apache.spark.sql.DataFrame, m: Int, subDims: Int,
      k: Int, iters: Int): IndexedSeq[Seq[(Long, Seq[Double])]] = {
    var cbs: IndexedSeq[Seq[(Long, Seq[Double])]] = {
      val rows = base.filter(col("vec_id") < k)
        .select(col("vec_id").cast("long"), col("v"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq.sortBy(_._1)
      (0 until m).map(mm => rows.map { case (id, v) =>
        id -> v.slice(mm * subDims, mm * subDims + subDims) })
    }
    for (_ <- 0 until iters) {
      val enc = pqEncode(base, cbs, subDims)
      val stacked = enc.select(col("vec_id"), explode(array((0 until m).map(i =>
          struct(lit(i).as("m"), col(s"code$i").cast("long").as("code"),
            expr(s"slice(v, ${i * subDims + 1}, $subDims)").as("sv"))): _*))
          .as("s"))
        .select(col("s.m").as("m"), col("s.code").as("code"),
          col("s.sv").as("sv"))
      val avgs = (0 until subDims).map(d =>
        round(avg(col("sv").getItem(d)), 6).as(s"c$d"))
      val rows = stacked.groupBy(col("m"), col("code"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
      cbs = (0 until m).map(mm => rows.filter(_.getInt(0) == mm)
        .map(r => r.getLong(1) -> (2 until 2 + subDims).map(r.getDouble).toSeq)
        .toSeq.sortBy(_._1))
    }
    cbs
  }

  /** Append `code0..code{m-1}` to a frame carrying (vec_id, v): nearest
    * codeword per subspace, ONE select, no shuffle. Per-subspace math
    * is [[assignCells]]' exactly — the same round(dot/(|v||c|), 6)
    * scores with the (pcos DESC, pivot ASC) tie-break — computed by the
    * native [[graft.functions.PqEncodeCodes]] expression: the codebooks
    * ride as one reference object, so the generated projection is
    * constant-size in m·k. (The previous column formulation — m
    * array_max trees over k literal-scored structs — hit janino's 64 KB
    * method limit at m=16, k=16 and dropped the whole encode stage out
    * of whole-stage codegen; production PQ is m=16, k=256.)
    * Other columns ride through untouched. */
  def pqEncode(df: org.apache.spark.sql.DataFrame,
      cbs: IndexedSeq[Seq[(Long, Seq[Double])]], subDims: Int)
      : org.apache.spark.sql.DataFrame = {
    val codes = ofExpr(graft.functions.PqEncodeCodes(
      ofCol(col("v")), cbs, subDims))
    // two Projects on purpose: __pqcodes is expensive and referenced m
    // times, so CollapseProject keeps the split and the expression
    // evaluates once per row (both stay in one codegen stage)
    df.withColumn("__pqcodes", codes)
      .select(df.columns.map(col) ++
        cbs.indices.map(i => col("__pqcodes").getItem(i).as(s"code$i")): _*)
  }

  /** Threshold dispatch between the two assignment paths. The literal
    * path embeds all k centroids in ONE projection — unbeatable below
    * ~64 cells (no join, no shuffle) but both the per-row k-literal
    * expression and its codegen tree fall over in SemDeDup's production
    * regime (k ≈ 10⁴–10⁵ cells). Above `literalMaxK` the centroids
    * become a broadcast table instead ([[assignCellsJoin]]). */
  def assignCellsAuto(vecs: org.apache.spark.sql.DataFrame,
      centroids: Seq[(Long, Seq[Double])], nprobe: Int,
      normCol: Option[String] = None, literalMaxK: Int = 64)
      : org.apache.spark.sql.DataFrame =
    if (centroids.size <= literalMaxK) {
      assignCells(vecs, centroids, nprobe, normCol)
    } else {
      val spark = vecs.sparkSession
      import spark.implicits._
      val dims = centroids.head._2.length
      val centDf = centroids.toDF("pivot_id", "cv")
      // SRP pre-route keeps per-row candidate counts bounded at large k:
      // 4 striped bands of log2(k)/2 bits each (≥4) — a near centroid
      // agrees with the row on ≥1 band with high probability, and the
      // expected candidates per row fall from k to ~4k / 2^bandBits.
      val bandBits = math.max(4,
        (math.log(centroids.size.toDouble) / math.log(2.0) / 2.0).toInt)
      assignCellsJoin(vecs, centDf, nprobe, dims,
        bands = 4, bandBits = bandBits, normCol = normCol)
    }

  /** Broadcast-join cell assignment — the large-k scale path.
    *
    * `centroids` is a TABLE (pivot_id: long, cv: array<double>), not a
    * driver literal: k no longer bounds any expression tree, only the
    * size of one broadcast (k × dims doubles — ~5 MB at k=10⁴, d=64).
    * With `bands > 0`, both sides carry striped SRP band keys and
    * candidates come from a band equi-join (expected k/2^bandBits
    * candidates per band per row instead of k); rows whose bands match
    * no centroid — possible for outliers — are salvaged by an exact
    * broadcast pass over JUST those rows, so coverage is total. With
    * `bands = 0` the join is the exact broadcast nested-loop over all k
    * (same O(n·k) work as exact assignment, but distributed through a
    * join instead of a k-wide codegen projection).
    *
    * Tie-break parity with [[assignCells]]: (pcos DESC, pivot_id ASC) on
    * the same `round(dot/(|v||c|), 6)` doubles — with `bands = 0` the
    * two paths produce identical assignments.
    *
    * 100 TB posture: one broadcast of the centroid table, no shuffle of
    * the corpus except the candidate dedup + per-row top-nprobe
    * (both keyed on row id, bounded by candidate count, and the window
    * is rewritten to GroupTopK when the rule is registered). */
  def assignCellsJoin(vecs: org.apache.spark.sql.DataFrame,
      centroids: org.apache.spark.sql.DataFrame, nprobe: Int, dims: Int,
      bands: Int = 0, bandBits: Int = 0, normCol: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    val keep = vecs.columns
    val rows = vecs
      .withColumn("__vnorm", normCol.map(col).getOrElse(norm(col("v"))))
      .withColumn("__rid", monotonically_increasing_id())
    val cent = centroids
      .select(col("pivot_id").cast("long").as("pivot_id"), col("cv"))
      .withColumn("__cnorm", norm(col("cv")))

    def stripedBands(c: Column): Column = {
      val bits = srpBits(c, dims, bands * bandBits)
      array((0 until bands).map { b =>
        val mine = (0 until bands * bandBits).filter(_ % bands == b).map(bits)
        concat(lit(s"$b:") +: mine: _*)
      }: _*)
    }

    val cand =
      if (bands <= 0) rows.crossJoin(broadcast(cent))
      else {
        val vb = rows.withColumn("__vband", explode(stripedBands(col("v"))))
        val cb = cent.withColumn("__cband", explode(stripedBands(col("cv"))))
        val banded = vb.join(broadcast(cb), col("__vband") === col("__cband"))
          .drop("__vband", "__cband")
          .dropDuplicates("__rid", "pivot_id")
        // salvage rows no band matched: exact pass over just the misses
        val missed = rows.join(
          banded.select("__rid").distinct(), Seq("__rid"), "left_anti")
        banded.unionByName(missed.crossJoin(broadcast(cent)))
      }

    val scored = cand.withColumn("__pcos",
      round(dot(col("v"), col("cv")) / (col("__vnorm") * col("__cnorm")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__rid").orderBy(col("__pcos").desc, col("pivot_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(keep.map(col) :+ col("pivot_id"): _*)
  }
}
