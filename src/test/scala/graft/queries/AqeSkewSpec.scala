package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** 100 TB posture evidence for the RUNTIME skew path: q50 pins the
  * manual salted-join form; this spec proves the automatic one — AQE's
  * OptimizeSkewedJoin splitting a skewed sort-merge partition into
  * parallel sub-reads — actually engages on this build, with thresholds
  * scaled down to fixture size. On a real cluster this is the first
  * line of defense when a hot key appears in production data that no
  * one pre-salted; the spec documents exactly which knobs make it fire
  * so the deployment recipe is tested, not folklore. */
class AqeSkewSpec extends SparkSpec {

  test("AQE marks and splits the skewed side of a sort-merge join") {
    val s = spark
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-sized thresholds: a 'skewed' partition is anything
      // over ~64KB and 2x the median, split to ~16KB advisory chunks
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // force the sort-merge path: broadcast would dodge the skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // coalescing can merge away the small partitions and mask the
      // skew factor; keep the raw shuffle layout
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    // Option(...) : a conf whose DEFAULT is literally null (adaptive
    // autoBroadcastJoinThreshold) must restore via unset, not set(null)
    val saved = confs.keys.map(k =>
      k -> util.Try(Option(s.conf.get(k))).toOption.flatten).toMap
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // 400k-row left side, ~95% on key 0, with an INCOMPRESSIBLE
      // payload that survives column pruning into the join (a pruned
      // constant-key partition lz4-compresses below any threshold and
      // AQE sees no skew); right side 100 keys
      val left = s.range(0, 400000)
        .select(when(col("id") % 20 =!= 0, lit(0L))
            .otherwise(col("id") % 100).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val right = s.range(0, 100)
        .select(col("id").as("k"), concat(lit("w"), col("id")).as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), count_distinct(col("w")).as("d"),
          max(col("payload")).as("p"))
      val row = joined.collect().head
      assert(row.getLong(0) == 400000L, "join lost rows under AQE")
      // inspect the plan TREE for isSkewJoin on the shuffled-join node
      // (not a plan-string substring, which is brittle to formatting
      // changes across Spark versions). ShuffledJoin covers both
      // SortMergeJoinExec and ShuffledHashJoinExec — AQE may pick
      // either shuffle-side strategy and both carry the skew mark.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.ShuffledJoin
      def collectJoins(p: SparkPlan): Seq[ShuffledJoin] = {
        val self = p match {
          case a: AdaptiveSparkPlanExec => collectJoins(a.executedPlan)
          case q: QueryStageExec => collectJoins(q.plan)
          case s: ShuffledJoin => Seq(s)
          case _ => Seq.empty
        }
        self ++ p.children.flatMap(collectJoins) ++
          p.subqueries.flatMap(collectJoins)
      }
      val joins = collectJoins(joined.queryExecution.executedPlan)
      assert(joins.nonEmpty, "expected a shuffled join in the plan:\n" +
        joined.queryExecution.executedPlan.toString
          .linesIterator.take(25).mkString("\n"))
      assert(joins.exists(_.isSkewJoin),
        s"AQE did not mark the skewed join — no ShuffledJoin with " +
          s"isSkewJoin=true among ${joins.size} node(s):\n" +
          joined.queryExecution.executedPlan.toString
            .linesIterator.take(25).mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
