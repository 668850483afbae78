package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.sources.TopicStore
import graft.streaming.{AckingSink, ChunkReassembly}

/** Property-based invariants (SURVEY.md §5 item 4):
  *  - topic-store round trip is the identity on random messages
  *    (null keys, arbitrary properties, all content types);
  *  - chunk reassembly over random splits reproduces the original
  *    payload exactly;
  *  - at-least-once accounting: redelivered ∪ dead = nacked, and the
  *    DLQ threshold is exact. */
class PropertySpec extends SparkSpec {

  /** scalacheck runner (no scalatest bridge in the offline cache). */
  private def check(p: Prop, minSuccessful: Int = 20): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  private val keyGen = Gen.option(Gen.alphaNumStr.map(_.take(8)))
  private val propsGen = Gen.mapOf(Gen.zip(
    Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty),
    Gen.alphaNumStr.map(_.take(12)))).map(_.take(8))
  private val ctGen = Gen.oneOf("application/json",
    "application/json; charset=utf-8", "application/xml", "text/csv",
    "text/plain", "application/octet-stream")
  private case class M(key: Option[String], body: String,
      props: Map[String, String], ct: String)
  private val msgGen = for {
    k <- keyGen; b <- Gen.asciiPrintableStr.map(_.take(64))
    p <- propsGen; ct <- ctGen
  } yield M(k, b, p, ct)

  test("topic store round trip is identity (keys, properties, payloads)") {
    import spark.implicits._
    check(Prop.forAllNoShrink(Gen.listOfN(25, msgGen)) { msgs =>
      val root = tmpDir("prop-store")
      val df = msgs.zipWithIndex.map { case (m, i) =>
        (m.key.orNull, m.body, m.props,
          new Timestamp(1700000000000L + i * 1000L), m.ct, s"mid-$i")
      }.toDF("key", "value_str", "properties", "publish_time",
        "content_type", "message_id")
      TopicStore.publish(spark, df, root, "t", 3)
      val back = spark.read.format("pulsarlike")
        .option("path", root).option("serviceUrl", "pulsar://local")
        .option("topicNames", "t").option("batchingMaxMessages", "1000")
        .load()
        .select("message_id", "key", "value_str", "properties", "content_type")
        .collect()
        .map(r => r.getAs[String]("message_id") ->
          (Option(r.getAs[String]("key")), r.getAs[String]("value_str"),
            r.getAs[Map[String, String]]("properties"),
            r.getAs[String]("content_type")))
        .toMap
      msgs.zipWithIndex.forall { case (m, i) =>
        back(s"mid-$i") == ((m.key, m.body, m.props, m.ct))
      }
    })
  }

  // random payloads split at random points, shuffled arrival order
  private val docGen = for {
    payload <- Gen.asciiPrintableStr.map(_.take(120)).suchThat(_.length >= 8)
    nCuts <- Gen.choose(1, 5)
    cuts <- Gen.listOfN(nCuts, Gen.choose(1, payload.length - 1))
  } yield (payload, (cuts.distinct.sorted :+ payload.length)
    .foldLeft((0, List.empty[String])) { case ((s, acc), e) =>
      (e, acc :+ payload.substring(s, e))
    }._2.filter(_.nonEmpty))

  private def reassemblyIdentityProp(wallClock: Boolean, runs: Int): Unit = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    check(Prop.forAllNoShrink(Gen.listOfN(8, docGen), Gen.long) { (docs, seed) =>
      val chunks = scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed)).shuffle(
        docs.zipWithIndex.flatMap { case ((_, frags), d) =>
          frags.zipWithIndex.map { case (f, i) =>
            ChunkReassembly.Chunk(s"doc$d", i, frags.size, f,
              new Timestamp(1700000000000L + i))
          }
        })
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[ChunkReassembly.Chunk]
      val name = s"prop_asm_${wallClock}_" + math.abs(seed).toString
      val ds =
        if (wallClock)
          ChunkReassembly.reassembleWallClock(spark, input.toDS(),
            expiryMs = 3600000L)
        else ChunkReassembly.reassemble(spark, input.toDS())
      val writer = ds.writeStream.format("memory").queryName(name)
        .outputMode("append")
      // processing-time timers keep the engine triggering, so
      // processAllAvailable never settles on the wall-clock backend —
      // poll for the expected count instead
      val q = (if (wallClock)
          writer.trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
        else writer).start()
      try {
        // deliver in two waves to exercise cross-batch state
        val (w1, w2) = chunks.splitAt(chunks.size / 2)
        if (w1.nonEmpty) { input.addData(w1); if (!wallClock) q.processAllAvailable() }
        if (w2.nonEmpty) { input.addData(w2); if (!wallClock) q.processAllAvailable() }
        val deadline = System.currentTimeMillis() + 30000L
        while (spark.table(name).count() < docs.size &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        val out = spark.table(name).collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        docs.zipWithIndex.forall { case ((payload, _), d) =>
          out.get(s"doc$d").contains(payload)
        }
      } finally q.stop()
    }, minSuccessful = runs)
  }

  test("chunk reassembly over random splits is identity") {
    reassemblyIdentityProp(wallClock = false, runs = 10)
  }

  test("chunk reassembly over random splits is identity (wall-clock/RocksDB backend)") {
    // fileChecksum off: its async upload pool deadlocks under concurrent
    // RocksDB snapshot zips (Spark 4.1.2, local fs)
    val overrides = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try reassemblyIdentityProp(wallClock = true, runs = 3)
    finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("GroupTopK == window-rank for arbitrary k and group shapes") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    check(Prop.forAllNoShrink(
      Gen.choose(1, 8),
      Gen.listOfN(300, Gen.zip(Gen.choose(0, 20), Gen.choose(0, 1000)))) { (k, data) =>
      val df = data.zipWithIndex.map { case ((g, v), i) =>
        (g.toLong, i.toLong, v.toLong)
      }.toDF("g", "id", "v").repartition(5)
      val viaOp = graft.plans.GroupTopK.topK(df, Seq(col("g")), k,
          col("v").desc, col("id").asc)
        .select("g", "id").collect().map(_.toString).sorted.toSeq
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      val viaW = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("g", "id").collect().map(_.toString).sorted.toSeq
      viaOp == viaW
    }, minSuccessful = 10)
  }

  test("at-least-once accounting: redelivered + dead == nacked; threshold exact") {
    import spark.implicits._
    check(Prop.forAllNoShrink(
      Gen.listOfN(30, Gen.choose(0, 8)), Gen.choose(1, 6)) { (counts, max) =>
      val root = tmpDir("prop-nack")
      val failed = counts.zipWithIndex.map { case (rc, i) =>
        (s"m-$i", s"k$i", s"v$i", rc)
      }.toDF("message_id", "key", "value_str", "redelivery_count")
        .withColumn("properties", map().cast("map<string,string>"))
        .withColumn("publish_time", lit(new Timestamp(1700000000000L)))
        .withColumn("content_type", lit("text/plain"))
      val (live, dead) = AckingSink.nack(spark, failed, root, "t",
        maxRedeliverCount = max)
      val expectedDead = counts.count(_ + 1 >= max)
      live + dead == counts.size && dead == expectedDead
    }, minSuccessful = 10)
  }

  test("seekByTime == linear-scan reference on random monotonic publish times") {
    import spark.implicits._
    // random inter-arrival gaps (0 allowed — equal timestamps) and
    // random probe times, including exact hits and the extremes
    val gapsGen = Gen.listOfN(40, Gen.choose(0L, 5000L))
    check(Prop.forAllNoShrink(gapsGen, Gen.choose(0, 41)) { (gaps, probe) =>
      val root = tmpDir("prop-seek")
      val times = gaps.scanLeft(1700000000000L)(_ + _) // n+1 ascending ms
      val df = times.zipWithIndex.map { case (t, i) =>
        (s"k", s"v$i", new Timestamp(t))
      }.toDF("key", "value_str", "publish_time")
        .withColumn("properties", map().cast("map<string,string>"))
        .withColumn("content_type", lit("text/plain"))
      TopicStore.publish(spark, df, root, "t", 1)
      val dir = TopicStore.topicDir(root, "t")
      // probe at an exact message time, or just before/after one
      val tMs = if (probe > 40) times.last + 1 else times(probe)
      (-1L to 1L).forall { off =>
        val tUs = (tMs + off) * 1000L
        val expected = times.count(_ * 1000L < tUs).toLong
        TopicStore.seekByTimeIn(dir, 0, tUs) == expected
      }
    }, minSuccessful = 10)
  }
}
