package graft.tools

import org.apache.spark.sql.SparkSession

import graft.QueryRegistry

/** Dev tool: print the formatted physical plan of the named queries
  * (default: the expensive ones) at sf0.001 for plan auditing.
  * Run: sbt "Test/runMain graft.tools.PlanDump [names…]" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d04_ngram_jaccard", "p04_dup_clusters", "p05_decontaminate",
        "p01_sequence_packing", "d02_minhash_lsh")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(QueryRegistry.byName(n).run(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
