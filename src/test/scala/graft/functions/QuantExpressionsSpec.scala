package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VectorOps

/** Sq8Encode/Sq8Dequant: round-trip bounds, clamp edges, constant-dim
  * handling, null propagation, and codegen/interpreted agreement. */
class QuantExpressionsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(0.0, -1.0, 0.5, 3.0)),
      (2L, Seq(1.0, 1.0, -0.5, -3.0)),
      (3L, Seq(0.25, 0.0, 0.0, 0.0))
    ).toDF("id", "v")
  }

  // per-dim mins/steps over the fixture: dim1 [0,1], dim2 [-1,1],
  // dim3 [-0.5,0.5], dim4 [-3,3]; dim ranges chosen to hit clamp ends
  private val mins = Seq(0.0, -1.0, -0.5, -3.0)
  private val steps = mins.zip(Seq(1.0, 1.0, 0.5, 3.0)).map {
    case (mn, mx) => (mx - mn) / 256.0
  }

  test("encode clamps to [0,255] and dequant lands within half a step") {
    val out = df.select(col("id"), col("v"),
        VectorOps.sq8Dequant(
          VectorOps.sq8Encode(col("v"), typedlit(mins), typedlit(steps)),
          typedlit(mins), typedlit(steps)).as("vq"))
      .orderBy(col("id")).collect()
    out.foreach { r =>
      val v = r.getSeq[Double](1)
      val vq = r.getSeq[Double](2)
      assert(vq.length == v.length)
      v.indices.foreach { d =>
        // reconstruction error is at most half a quantization step
        assert(math.abs(v(d) - vq(d)) <= steps(d) / 2.0 + 1e-12,
          s"id=${r.getLong(0)} d=$d v=${v(d)} vq=${vq(d)}")
      }
    }
  }

  test("the max value encodes to 255, the min to 0 (clamp edges)") {
    import spark.implicits._
    val codes = Seq((Seq(1.0, -1.0), 0)).toDF("v", "x")
      .select(VectorOps.sq8Encode(col("v"),
        typedlit(Seq(0.0, -1.0)),
        typedlit(Seq(1.0 / 256.0, 2.0 / 256.0))).as("c"))
      .collect()(0).getAs[Array[Byte]](0)
    assert((codes(0) & 0xFF) == 255) // v = max → floor((1-0)/st) = 256 → clamp
    assert((codes(1) & 0xFF) == 0)   // v = min → 0
  }

  test("a constant dimension (step 0) round-trips to its min exactly") {
    import spark.implicits._
    val vq = Seq(Seq(7.25)).toDF("v")
      .select(VectorOps.sq8Dequant(
        VectorOps.sq8Encode(col("v"), typedlit(Seq(7.25)), typedlit(Seq(0.0))),
        typedlit(Seq(7.25)), typedlit(Seq(0.0))).as("vq"))
      .collect()(0).getSeq[Double](0)
    assert(vq == Seq(7.25))
  }

  test("null vector propagates null; interpreted eval matches codegen") {
    import spark.implicits._
    val rows = Seq(Some(Seq(0.5, 0.5)), None).toDF("v")
      .select(VectorOps.sq8Encode(col("v"),
        typedlit(Seq(0.0, 0.0)), typedlit(Seq(1.0 / 256.0, 1.0 / 256.0))).as("c"))
      .collect()
    assert(rows(0).getAs[Array[Byte]](0).length == 2)
    assert(rows(1).isNullAt(0))

    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arr = Literal(new GenericArrayData(Array(0.5, 0.5)),
      ArrayType(DoubleType))
    val params = Literal(new GenericArrayData(Array(0.0, 0.0)),
      ArrayType(DoubleType))
    val st = Literal(new GenericArrayData(Array(1.0 / 256.0, 1.0 / 256.0)),
      ArrayType(DoubleType))
    val enc = Sq8Encode(arr, params, st).eval(null).asInstanceOf[Array[Byte]]
    assert(enc.toSeq == rows(0).getAs[Array[Byte]](0).toSeq)
  }

  test("a null ELEMENT nulls the whole result instead of minting a garbage code") {
    import spark.implicits._
    // codegen path: parquet-style containsNull=true arrays with a null slot
    val rows = Seq(
      (1L, Seq[java.lang.Double](0.5, 0.5)),
      (2L, Seq[java.lang.Double](0.5, null)))
      .toDF("id", "v")
      .select(col("id"), VectorOps.sq8Encode(col("v"),
        typedlit(Seq(0.0, 0.0)), typedlit(Seq(1.0 / 256.0, 1.0 / 256.0))).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getAs[Array[Byte]](1).length == 2)
    assert(rows(1).isNullAt(1), "null element must null the result, not encode 0.0")

    // interpreted path agrees (GenericArrayData with a null slot NPE'd pre-fix)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val withNull = Literal(new GenericArrayData(Array[Any](0.5, null)),
      ArrayType(DoubleType, containsNull = true))
    val params = Literal(new GenericArrayData(Array[Any](0.0, 0.0)),
      ArrayType(DoubleType, containsNull = true))
    assert(Sq8Encode(withNull, params, params).eval(null) == null)
    // dequant: a null param element nulls the reconstruction too
    val codes = Literal(Array[Byte](1, 2),
      org.apache.spark.sql.types.BinaryType)
    assert(Sq8Dequant(codes, withNull, params).eval(null) == null)
  }

  test("a vector/params dimensionality mismatch throws, never truncates") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(Seq(0.5, 0.5, 0.5)).toDF("v")
        .select(VectorOps.sq8Encode(col("v"),
          typedlit(Seq(0.0, 0.0)), typedlit(Seq(1.0 / 256.0, 1.0 / 256.0))))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(err).contains("sq8_encode"), rootMsg(err))
  }

  test("sq8_encode / sq8_dequant register as SQL functions via GraftExtensions") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql(
        """SELECT sq8_dequant(
          |  sq8_encode(array(0.5d), array(0.0d), array(0.00390625d)),
          |  array(0.0d), array(0.00390625d))[0] AS x""".stripMargin)
        .collect()(0).getDouble(0)
      assert(math.abs(got - 0.5) <= 0.00390625 / 2.0 + 1e-12)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }
}
