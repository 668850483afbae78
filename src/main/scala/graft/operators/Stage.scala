package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization point for an expensive intermediate that feeds
  * multiple consumers (e.g. a dedup signature table read by both sides
  * of a self-join). The mode is a session conf so the same query code
  * serves both postures:
  *
  *  - `spark.graft.checkpoint = local` (default): `localCheckpoint`
  *    (eager) — blocks on executor storage, no lineage. Fastest, right
  *    for single-node/local[n]; an executor loss kills the query.
  *  - `reliable`: `checkpoint` (eager) to the Spark checkpoint dir
  *    (`spark.graft.checkpoint.dir` is set as the SparkContext
  *    checkpoint dir if none is configured) — survives executor loss,
  *    the 100×-cluster-safe form.
  *  - `none`: pass-through — each consumer recomputes the lineage
  *    (lets Catalyst see through the subtree; occasionally the right
  *    trade when the intermediate is cheap and filters could push past
  *    it).
  */
object Stage {

  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get("spark.graft.checkpoint", "local") match {
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty) {
          // getOption first: a default ARGUMENT evaluates eagerly and
          // would orphan a temp dir even when the conf is set
          val dir = spark.conf.getOption("spark.graft.checkpoint.dir")
            .getOrElse(graft.TempRoots.create("graft-reliable-ckpt"))
          spark.sparkContext.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case "none" => df
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
