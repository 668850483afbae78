package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The extensions class must surface the native folds as SQL functions
  * in any session configured with spark.sql.extensions. */
class GraftExtensionsSpec extends SparkSpec {

  test("dot_double / sum_squares_double register via SparkSessionExtensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT dot_double(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |       sum_squares_double(array(3.0d, 4.0d)) AS s""".stripMargin)
        .collect()(0)
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 25.0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
