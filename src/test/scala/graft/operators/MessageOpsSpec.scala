package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for the inference dispatch edges m09's oracle doesn't
  * reach: types with no sampled payloads must be ABSENT from the
  * inferred map, and their rows must fall through raw (null parses) —
  * the reference dispatcher's fallback (PulsarMessageConsumer
  * .java:505-529). */
class MessageOpsSpec extends SparkSpec {

  test("inferPayloadSchemas: absent types are not inferred; dispatch falls through raw") {
    import spark.implicits._
    val msgs = Seq(
      ("""{"a": 1, "b": "x"}""", "application/json"),
      ("""{"a": 2, "b": "y"}""", "application/json; charset=utf-8"),
      ("blob-bytes", "application/octet-stream"),
      ("no-content-type", null)
    ).toDF("value_str", "content_type")
    val schemas = MessageOps.inferPayloadSchemas(spark, msgs, samplePerType = 10)
    assert(schemas.keySet == Set("application/json"), schemas)
    assert(schemas("application/json").fieldNames.toSet == Set("a", "b"))

    val out = MessageOps.contentTypeDispatchInferred(msgs, schemas)
    val json = out.filter(col("base_type") === "application/json")
    assert(json.count() == 2)
    assert(json.filter(col("parsed_json").isNotNull).count() == 2)
    assert(json.select(sum(col("parsed_json.a"))).head().getLong(0) == 3L)
    // unknown / missing content types: every parse column stays null
    val raw = out.filter(col("base_type") =!= "application/json" ||
      col("base_type").isNull)
    assert(raw.count() == 2)
    assert(raw.filter(col("parsed_json").isNotNull).count() == 0)
  }

  test("inferPayloadSchemas: per-type schemas are independent (json vs csv)") {
    import spark.implicits._
    val msgs = Seq(
      ("""{"n": 5}""", "application/json"),
      ("7,x,1.5", "text/csv")
    ).toDF("value_str", "content_type")
    val schemas = MessageOps.inferPayloadSchemas(spark, msgs, samplePerType = 10)
    assert(schemas.keySet == Set("application/json", "text/csv"))
    assert(schemas("text/csv").fields.length == 3)
    val out = MessageOps.contentTypeDispatchInferred(msgs, schemas)
    assert(out.filter(col("parsed_csv._c0") === 7).count() == 1)
    assert(out.filter(col("parsed_json.n") === 5).count() == 1)
  }
}
