package graft.operators

import org.apache.spark.sql.SparkSession

/** Option surface for recursive-CTE depth/row caps (q32's BOM-walk
  * family). Spark guards `WITH RECURSIVE` with two session confs —
  * `spark.sql.cteRecursionLevelLimit` (default 100 levels) and
  * `spark.sql.cteRecursionRowLimit` (default 1M rows per anchor; -1 =
  * unlimited) — and a production hierarchy walk that is deeper than
  * 100 or wider than 1M simply fails until they are raised. This maps
  * the graft option names onto the engine knobs the same way
  * PulsarLikeConf maps source options onto source behavior:
  *
  *   - `spark.graft.recursion.maxDepth` → cteRecursionLevelLimit
  *   - `spark.graft.recursion.maxRows`  → cteRecursionRowLimit
  *
  * The mapping is applied (not save/restored): the limits are read by
  * UnionLoopExec at EXECUTION time, after the query-building function
  * has long returned, so a scoped restore around construction would
  * silently undo the caller's raise before it ever took effect. They
  * are session-scoped knobs, exactly like setting the Spark conf
  * directly — this surface exists so a graft user configures
  * recursion in graft vocabulary and RecursionLimitSpec pins that a
  * >100-level walk actually completes under it. */
object Recursion {

  val MaxDepthKey = "spark.graft.recursion.maxDepth"
  val MaxRowsKey = "spark.graft.recursion.maxRows"

  /** Apply any configured graft recursion caps onto the engine confs;
    * absent options leave Spark's defaults untouched. Values must be
    * positive integers or -1 (unlimited) — anything else fails here,
    * at configuration time, not mid-walk. */
  def applyLimits(spark: SparkSession): Unit = {
    def put(graftKey: String, sparkKey: String): Unit =
      spark.conf.getOption(graftKey).foreach { v =>
        val n = try v.trim.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$graftKey must be a positive integer or -1, got '$v'")
        }
        require(n > 0 || n == -1L,
          s"$graftKey must be a positive integer or -1, got '$v'")
        spark.conf.set(sparkKey, v.trim)
      }
    put(MaxDepthKey, "spark.sql.cteRecursionLevelLimit")
    put(MaxRowsKey, "spark.sql.cteRecursionRowLimit")
  }
}
