package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VectorOps

/** Quality gate for the trained IVF quantizer (s04 machinery): on data
  * with real cluster structure — the regime IVF exists for — training
  * must place centroids so that probing 2 of 8 cells recovers ≥ 80% of
  * the exact top-3 neighbors. (The driver's `embeddings` fixture is
  * uniform-random, where no partition-pruning ANN can score well; the
  * oracle gate there checks exactness of the pipeline, this spec checks
  * that training actually adapts to structure.) */
class SimilaritySpec extends SparkSpec {

  test("trained IVF recall@3 >= 0.8 on clustered embeddings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dims = 16
    val centers = Array.fill(10)(Array.fill(dims)(rnd.nextGaussian())).map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
    }
    val vecs = (0 until 300).map { id =>
      val c = centers(id % 10)
      (id.toLong, c.map(x => x + rnd.nextGaussian() * 0.05).toSeq)
    }
    val base = vecs.toDF("vec_id", "v")

    val centroids = VectorOps.kmeansCentroids(base, k = 8, iters = 3, dims = dims)
    val assigned = VectorOps.assignCells(base, centroids, nprobe = 1)
    val queries = VectorOps.assignCells(base, centroids, nprobe = 2)
      .filter(col("vec_id") < 30)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("pivot_id").as("q_pivot"))

    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    def top3(scored: DataFrame): DataFrame = scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("q_id", "neighbor_id")

    val ivf = top3(queries.join(assigned.as("c"),
        col("c.pivot_id") === col("q_pivot") && col("c.vec_id") =!= col("q_id"))
      .select(col("q_id"), col("c.vec_id").as("neighbor_id"),
        VectorOps.cosine(col("qv"), col("c.v")).as("cos")))

    val qb = base.filter(col("vec_id") < 30)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = top3(qb.join(base, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosine(col("qv"), col("v")).as("cos")))

    val hits = ivf.intersect(exact).count()
    assert(hits >= (0.8 * 90).toLong, s"recall@3 = ${hits / 90.0}")
  }
}
