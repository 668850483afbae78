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

  /** Ordered left-fold sum of an array<double>. */
  private def fsum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product in index order; inputs must be array<double>. */
  def dot(a: Column, b: Column): Column = fsum(zip_with(a, b, _ * _))

  def norm(a: Column): Column = sqrt(fsum(transform(a, x => x * x)))

  /** Cosine similarity, rounded to 6 decimals — the rounding is part of
    * the contract (both engines round the same double, so threshold
    * comparisons on the rounded value agree bit-for-bit). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

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
      when(fsum(zip_with(v, w, _ * _)) > 0, "1").otherwise("0")
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
    * Each round's centroids (k × dims doubles) are collected to the
    * driver — the standard iterative-trainer shape (spark.ml KMeans does
    * the same): the model is tiny, and materializing it truncates the
    * lineage so round i+1's assignment is one scan + one broadcast, not
    * a recursive recompute. Input: (vec_id, v); output: (pivot_id, pv). */
  def kmeansCentroids(spark: org.apache.spark.sql.SparkSession,
      base: org.apache.spark.sql.DataFrame, k: Int, iters: Int)
      : org.apache.spark.sql.DataFrame = {
    var c = base.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("pivot_id"), col("v").as("pv"))
    for (_ <- 0 until iters) {
      val next = assignCells(base, c, 1)
        .select(col("pivot_id"), posexplode(col("v")).as(Seq("dim", "val")))
        .groupBy(col("pivot_id"), col("dim"))
        .agg(round(avg(col("val")), 6).as("av"))
        .groupBy(col("pivot_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("av"))))
          .getField("av").as("pv"))
      c = materialize(spark, next)
    }
    c
  }

  /** Route each vector to its `nprobe` nearest centroids by cosine
    * (ties: lowest pivot_id). The centroid table is k rows — always
    * broadcast. Output: input columns + pivot_id (nprobe rows/vector). */
  def assignCells(vecs: org.apache.spark.sql.DataFrame,
      centroids: org.apache.spark.sql.DataFrame, nprobe: Int)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("pcos").desc, col("pivot_id").asc)
    vecs.join(broadcast(centroids))
      .withColumn("pcos", cosine(col("v"), col("pv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(vecs.columns.map(col) :+ col("pivot_id"): _*)
  }

  /** Collect a tiny model table and rebuild it as a LocalRelation. */
  private def materialize(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    spark.createDataFrame(rows, df.schema)
  }
}
