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
  def srpBucket(v: Column, dims: Int, bits: Int): Column = {
    val oddHex = Set("1", "3", "5", "7", "9", "b", "d", "f")
    def weight(b: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$b:$i".getBytes("UTF-8"))
      if (oddHex.contains(f"${h(0) & 0xff}%02x".substring(0, 1))) 1.0 else -1.0
    }
    val bitCols = (0 until bits).map { b =>
      val w = typedLit((0 until dims).map(i => weight(b, i)))
      when(dot(v, w) > 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
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
}
