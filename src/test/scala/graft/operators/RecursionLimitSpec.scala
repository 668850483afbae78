package graft.operators

import graft.SparkSpec

/** The q32 recursion caps, exercised past Spark's defaults: a
  * 150-level linear chain fails under the stock 100-level cap and
  * completes once `spark.graft.recursion.maxDepth` raises it — the
  * conf surface a production BOM walk deeper than 100 actually needs
  * (round-6 "What's missing" #2). */
class RecursionLimitSpec extends SparkSpec {

  private val walk150 =
    """WITH RECURSIVE r(n) AS (
      |  SELECT 150 AS n
      |  UNION ALL
      |  SELECT n - 1 FROM r WHERE n > 1)
      |SELECT CAST(count(*) AS BIGINT) AS c, CAST(min(n) AS BIGINT) AS mn
      |FROM r""".stripMargin

  private def cleanup(): Unit = {
    Seq(Recursion.MaxDepthKey, Recursion.MaxRowsKey,
      "spark.sql.cteRecursionLevelLimit",
      "spark.sql.cteRecursionRowLimit").foreach(spark.conf.unset)
  }

  test("a 150-level walk FAILS under Spark's default 100-level cap") {
    cleanup()
    Recursion.applyLimits(spark) // no graft confs set: defaults stand
    val e = intercept[Exception] { spark.sql(walk150).collect() }
    assert(e.getMessage.toLowerCase.contains("recursion"),
      s"expected the recursion-limit error, got: ${e.getMessage}")
  }

  test("spark.graft.recursion.maxDepth=200 completes the same walk") {
    cleanup()
    try {
      spark.conf.set(Recursion.MaxDepthKey, "200")
      Recursion.applyLimits(spark)
      val row = spark.sql(walk150).collect().head
      assert(row.getLong(0) == 150L && row.getLong(1) == 1L)
    } finally cleanup()
  }

  test("maxRows caps the walk's row budget and -1 lifts it") {
    cleanup()
    try {
      spark.conf.set(Recursion.MaxDepthKey, "200")
      spark.conf.set(Recursion.MaxRowsKey, "10")
      Recursion.applyLimits(spark)
      val e = intercept[Exception] { spark.sql(walk150).collect() }
      assert(e.getMessage.toLowerCase.contains("recursion"),
        s"expected the row-limit error, got: ${e.getMessage}")
      spark.conf.set(Recursion.MaxRowsKey, "-1")
      Recursion.applyLimits(spark)
      assert(spark.sql(walk150).collect().head.getLong(0) == 150L)
    } finally cleanup()
  }

  test("malformed values fail at configuration time, not mid-walk") {
    cleanup()
    try {
      spark.conf.set(Recursion.MaxDepthKey, "many")
      intercept[IllegalArgumentException] { Recursion.applyLimits(spark) }
      spark.conf.set(Recursion.MaxDepthKey, "0")
      intercept[IllegalArgumentException] { Recursion.applyLimits(spark) }
    } finally cleanup()
  }
}
