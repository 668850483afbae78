package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** §2B streaming rows over the message-stream shape: stream-stream join
  * with watermarks, dropDuplicatesWithinWatermark (at-least-once →
  * effectively-once), and late-data drop in windowed aggregation. */
object StreamingRelationalSpec {
  case class Click(user: String, clickTime: Timestamp, page: String)
  case class Buy(buyUser: String, buyTime: Timestamp, amount: Double)
  case class Ev(id: Long, t: Timestamp)
}

class StreamingRelationalSpec extends SparkSpec {
  import StreamingRelationalSpec._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("stream-stream inner join within a time bound") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = clicks.toDS().withWatermark("clickTime", "10 seconds")
      .join(
        buys.toDS().withWatermark("buyTime", "10 seconds"),
        expr("""user = buyUser AND buyTime BETWEEN clickTime AND clickTime + INTERVAL 1 MINUTE"""))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(Click("u1", ts(100), "home"), Click("u2", ts(100), "item"))
      buys.addData(Buy("u1", ts(130), 9.99))     // within the minute
      buys.addData(Buy("u2", ts(500), 5.0))      // outside the bound
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length == 1 && rows(0).getAs[String]("user") == "u1")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses redelivered messages") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    val dedup = in.toDS().withWatermark("t", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("ddw")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, ts(100)), Ev(2, ts(101)), Ev(1, ts(102)))
      q.processAllAvailable()
      in.addData(Ev(1, ts(103)), Ev(3, ts(104)))  // redelivery of 1 again
      q.processAllAvailable()
      val ids = spark.table("ddw").select("id").collect().map(_.getLong(0))
      assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), ids.mkString(","))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from windowed aggregation") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = in.toDS().withWatermark("t", "5 seconds")
      .groupBy(window(col("t"), "10 seconds"))
      .count()
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, ts(100)), Ev(2, ts(105)))
      q.processAllAvailable()
      // advance the watermark far past the first window…
      in.addData(Ev(3, ts(200)))
      q.processAllAvailable()
      // …then a straggler for the closed window: must be dropped
      in.addData(Ev(4, ts(101)))
      q.processAllAvailable()
      in.addData(Ev(5, ts(300)))   // close the 200s window too
      q.processAllAvailable()
      val byWindow = spark.table("late")
        .select(col("window.start").cast("long").as("ws"), col("count"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byWindow(100L) == 2L, s"closed window mutated: $byWindow")
    } finally q.stop()
  }
}
