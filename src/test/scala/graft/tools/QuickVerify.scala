package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Selective local verify (not part of the driver contract): run only the
  * named queries against a sf dir, dump parquet + oracle_sql.json in the
  * same layout graft.Verify uses, for tools/check_oracle.py.
  *
  * Usage: Test/runMain graft.QuickVerify <sfDir> <outDir> <name>...
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val q = QueryRegistry.byName(name)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[quick-verify] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => QueryRegistry.byName(n).oracle.map(n -> _))
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
