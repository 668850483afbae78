package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe (not part of the driver contract): what strings does
  * schema_of_variant return for each JSON shape, and how do
  * variant_get / try_variant_get coerce? Pins the vocabulary the v04
  * type-dispatch CASE maps from. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val payloads = Seq(
      """{"v":7}""", """{"v":123456}""", """{"v":123456789012}""",
      """{"v":"42"}""", """{"v":"s3"}""", """{"v":[1,8]}""",
      """{"v":null}""", """{"v":1.5}""", """{}""")
    payloads.toDF("p")
      .select(col("p"),
        expr("schema_of_variant(variant_get(parse_json(p), '$.v'))").as("sch"),
        expr("try_variant_get(parse_json(p), '$.v', 'bigint')").as("coerced"),
        expr("is_variant_null(variant_get(parse_json(p), '$.v'))").as("vnull"))
      .show(20, truncate = false)
    spark.stop()
  }
}
