package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** NfcNormalize: canonical composition, identity on normalized input,
  * null propagation, and codegen/interpreted agreement. */
class StringExpressionsSpec extends SparkSpec {

  // decomposed e + U+0301 / A + U+030A vs their composed singletons
  private val decomposed = "Café Ångström"
  private val composed = "Café Ångström"

  test("composes decomposed sequences to NFC (codegen path)") {
    import spark.implicits._
    val out = Seq(decomposed, composed, "plain ascii", null)
      .toDF("s")
      .select(TextOps.nfc(col("s")).as("n"), length(col("s")).as("l"))
      .collect()
    assert(out(0).getString(0) == composed)
    assert(out(1).getString(0) == composed)
    assert(out(2).getString(0) == "plain ascii")
    assert(out(3).isNullAt(0))
    // the decomposed form is 3 code points longer pre-normalization
    assert(out(0).getInt(1) == out(1).getInt(1) + 3)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = NfcNormalize(Literal(UTF8String.fromString(decomposed)))
    assert(e.eval(null).asInstanceOf[UTF8String].toString == composed)
    assert(NfcNormalize(Literal(null, e.dataType)).eval(null) == null)
  }

  test("rejects non-string input at analysis") {
    import spark.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(TextOps.nfc(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("nfc_normalize registers as a SQL function via GraftExtensions") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql(s"SELECT nfc_normalize('$decomposed') AS n")
        .collect()(0).getString(0)
      assert(got == composed)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }
}
