package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Option-parsing/validation parity with the reference's error behaviors
  * (SURVEY.md §5 item 1). */
class PulsarLikeConfSpec extends AnyFunSuite {

  private val valid = Map(
    "serviceUrl" -> "pulsar://localhost:6650",
    "topicNames" -> "events",
    "batchingMaxMessages" -> "1000")

  test("serviceUrl is mandatory (PulsarConnectionConfig.java:36-43)") {
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid - "serviceUrl")
    }
    assert(e.getMessage.contains("serviceUrl"))
  }

  test("topics or pattern required (PulsarMessageConsumer.java:259-261)") {
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid - "topicNames")
    }
    assert(e.getMessage.contains("topicNames"))
    assert(e.getMessage.contains("topicsPattern"))
  }

  test("TLS inferred from URL scheme (ConnectionConfiguration.java:25-34)") {
    assert(PulsarLikeConf.fromOptions(
      valid + ("serviceUrl" -> "pulsar+ssl://h:6651")).useTLS)
    assert(!PulsarLikeConf.fromOptions(
      valid + ("serviceUrl" -> "pulsar://h:6650")).useTLS)
    // non-pulsar scheme: explicit flag decides
    assert(PulsarLikeConf.fromOptions(
      valid + ("serviceUrl" -> "file:///x", "useTLS" -> "true")).useTLS)
    assert(!PulsarLikeConf.fromOptions(
      valid + ("serviceUrl" -> "file:///x")).useTLS)
  }

  test("enum validation lists valid values (PulsarMessageConsumer.java:368-397)") {
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid + ("subscriptionType" -> "Banana"))
    }
    assert(e.getMessage.contains("Banana"))
    Seq("Exclusive", "Shared", "Failover", "Key_Shared").foreach(v =>
      assert(e.getMessage.contains(v)))
    // valid values parse case-insensitively
    assert(PulsarLikeConf.fromOptions(valid + ("subscriptionType" -> "key_shared"))
      .subscriptionType == SubscriptionType.KeyShared)
  }

  test("batch policy needs >=1 bound when batch receive on (PulsarMessageConsumer.java:307-309)") {
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid - "batchingMaxMessages")
    }
    // reference-parity error text
    assert(e.getMessage ==
      "At least one of maxNumMessages, maxNumBytes, timeout must be specified.")
    // disabled batch receive needs no bounds
    val c = PulsarLikeConf.fromOptions(
      valid - "batchingMaxMessages" + ("batchReceiveEnabled" -> "false"))
    assert(!c.batchReceiveEnabled)
  }

  test("batchingTimeout alone satisfies the batch policy and maps to the trigger (A11)") {
    val c = PulsarLikeConf.fromOptions(
      valid - "batchingMaxMessages" + ("batchingTimeout" -> "5000"))
    assert(c.batchingTimeoutMs.contains(5000L))
    assert(c.suggestedTrigger.contains(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(5000L)))
    // without a timeout there is no suggested trigger
    assert(PulsarLikeConf.fromOptions(valid).suggestedTrigger.isEmpty)
    // non-positive values are rejected LOUDLY (silently dropping an
    // explicit 0 would run the batch unbounded, then blame the user
    // for not specifying a bound)
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(
        valid - "batchingMaxMessages" + ("batchingTimeout" -> "0"))
    }
    assert(e.getMessage.contains("must be positive"))
  }

  test("local-store extensions parse (readRetries / numPartitions / chunkExpiryWallClock)") {
    // chunkExpiryWallClock is a chunking knob: like the other three it
    // requires batch receive OFF (it would be silently inert otherwise)
    val c = PulsarLikeConf.fromOptions(valid ++ Map(
      "readRetries" -> "true", "numPartitions" -> "8",
      "batchReceiveEnabled" -> "false",
      "chunkExpiryWallClock" -> "true"))
    assert(c.readRetries)
    assert(c.numPartitions.contains(8))
    assert(c.chunking.expiryWallClock)
    val d = PulsarLikeConf.fromOptions(valid)
    assert(!d.readRetries && d.numPartitions.isEmpty &&
      !d.chunking.expiryWallClock)
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid ++ Map("chunkExpiryWallClock" -> "true"))
    }
    assert(e.getMessage.contains("batchReceiveEnabled"))
  }

  test("startingTime parses epoch millis and ISO-8601; rejects the rest with the named error") {
    assert(PulsarLikeConf.fromOptions(valid ++
      Map("startingTime" -> "1700000000000")).startingTimeUs
      .contains(1700000000000000L))
    assert(PulsarLikeConf.fromOptions(valid ++
      Map("startingTime" -> "2023-11-14T22:13:20Z")).startingTimeUs
      .contains(1700000000000000L))
    assert(PulsarLikeConf.fromOptions(valid).startingTimeUs.isEmpty)
    for (bad <- Seq("yesterday", "99999999999999999999", "2023-13-99")) {
      val e = intercept[IllegalArgumentException] {
        PulsarLikeConf.fromOptions(valid ++ Map("startingTime" -> bad))
      }
      assert(e.getMessage.contains("startingTime"), e.getMessage)
    }
  }

  test("chunking knobs are rejected while batch receive is on (PulsarMessageConsumer.java:325)") {
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid + ("maxPendingChunkedMessage" -> "100"))
    }
    assert(e.getMessage.contains("maxPendingChunkedMessage"))
    assert(e.getMessage.contains("batchReceiveEnabled"))
    // with batch receive off they parse
    val c = PulsarLikeConf.fromOptions(valid - "batchingMaxMessages" ++ Map(
      "batchReceiveEnabled" -> "false", "maxPendingChunkedMessage" -> "100"))
    assert(c.chunking.maxPendingChunkedMessage.contains(100L))
  }

  test("full client/TLS/chunking option surface parses and validates (A22)") {
    val c = PulsarLikeConf.fromOptions(valid ++ Map(
      "batchReceiveEnabled" -> "false",
      "consumerName" -> "c1", "priorityLevel" -> "3",
      "maxTotalReceiverQueueSizeAcrossPartitions" -> "50000",
      "autoUpdatePartitions" -> "true",
      "autoUpdatePartitionsIntervalSeconds" -> "60",
      "replicateSubscriptionState" -> "true", "enableTransaction" -> "true",
      "operationTimeout" -> "30000", "connectionTimeout" -> "10000",
      "numIoThreads" -> "4", "numListenerThreads" -> "2",
      "keepAliveIntervalSeconds" -> "30", "memoryLimit" -> "67108864",
      "maxPendingChunkedMessage" -> "100",
      "expiryTimeOfIncompleteChunkedMessageMillis" -> "60000",
      "autoAckOldestChunkedMessageOnQueueFull" -> "true",
      "tlsAllowInsecureConnection" -> "false",
      "tlsHostnameVerificationEnable" -> "true",
      "tlsTrustCertsFilePath" -> "/certs/ca.pem",
      "tlsProtocols" -> "TLSv1.3, TLSv1.2", "tlsCiphers" -> "a,b"))
    assert(c.client.priorityLevel.contains(3L))
    assert(c.client.numIoThreads.contains(4L))
    assert(c.client.tlsProtocols == Seq("TLSv1.3", "TLSv1.2"))
    assert(c.chunking.maxPendingChunkedMessage.contains(100L))
    assert(c.chunking.autoAckOldestChunkedMessageOnQueueFull)
    // malformed numerics throw with the parameter name
    val e = intercept[IllegalArgumentException] {
      PulsarLikeConf.fromOptions(valid + ("operationTimeout" -> "fast"))
    }
    assert(e.getMessage.contains("operationTimeout"))
  }

  test("defaults match the reference (uischema.json)") {
    val c = PulsarLikeConf.fromOptions(valid)
    assert(c.initialPosition == InitialPosition.Latest)       // uischema.json:727
    assert(c.processingMode == ProcessingMode.Sync)           // uischema.json:742
    assert(c.batchReceiveEnabled)                             // uischema.json:804
    assert(c.dlqMaxRedeliverCount == 5)                       // uischema.json:792
    assert(c.subscriptionType == SubscriptionType.Exclusive)
  }
}
