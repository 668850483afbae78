package graft.model

/** Validated configuration for the `pulsarlike` source — the case-class
  * mirror of the reference's config POJO graph, with the same validation
  * rules and error behaviors:
  *
  *  - `serviceUrl` is the single mandatory connection parameter
  *    (reference: pojo/PulsarConnectionConfig.java:36-43);
  *  - TLS is inferred from the URL scheme — `pulsar+ssl://`/`https` force
  *    it on, `pulsar://` forces it off, otherwise the explicit `useTLS`
  *    flag decides (pojo/ConnectionConfiguration.java:25-34);
  *  - either `topicNames` (comma-separated) or `topicsPattern` must be
  *    set (PulsarMessageConsumer.java:259-261);
  *  - enum-valued parameters throw listing the valid values
  *    (PulsarMessageConsumer.java:368-397);
  *  - when batch receive is enabled, at least one of batchingMaxMessages /
  *    batchingMaxBytes / batchingTimeout must be set
  *    (PulsarMessageConsumer.java:307-309).
  *
  * TLS/auth knobs validate but are functional no-ops against the local
  * file-backed store (no broker — SURVEY.md §7 non-goals).
  */
final case class PulsarLikeConf(
    serviceUrl: String,
    useTLS: Boolean,
    topicNames: Seq[String],
    topicsPattern: Option[String],
    subscriptionTopicsMode: SubscriptionTopicsMode,
    subscriptionName: String,
    subscriptionType: SubscriptionType,
    initialPosition: InitialPosition,
    processingMode: ProcessingMode,
    batchReceiveEnabled: Boolean,
    batchingMaxMessages: Option[Long],
    batchingMaxBytes: Option[Long],
    batchingTimeoutMs: Option[Long],
    receiverQueueSize: Option[Long],
    dlqMaxRedeliverCount: Int,
    dlqTopic: Option[String],
    nackRedeliveryDelayMs: Option[Long],
    ackTimeoutMs: Option[Long],
    readCompacted: Boolean,
    readRetries: Boolean,
    startingTimeUs: Option[Long],
    endingTimeUs: Option[Long],
    startingOffsets: Map[Int, Long],
    startFromSubCursor: Boolean = false,
    numPartitions: Option[Int],
    chunking: ChunkingConf,
    client: ClientConf) {

  /** A11's third leg: `batchingTimeout` ≙ the poll deadline of the
    * reference's BatchReceivePolicy (PulsarMessageConsumer.java:306-324).
    * In micro-batch execution batch-formation latency is the trigger
    * interval, so the validated timeout maps onto
    * Trigger.ProcessingTime — pass this to `writeStream.trigger(...)`
    * to complete the end-to-end mapping (rows/bytes bounds are enforced
    * in-source via admission control). */
  def suggestedTrigger: Option[org.apache.spark.sql.streaming.Trigger] =
    batchingTimeoutMs.map(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(_))
}

/** A19 chunked-message knobs (PulsarMessageConsumer.java:325-336).
  * `expiryWallClock` selects the reference's processing-time expiry
  * semantics for incomplete chunked messages (RocksDB-backed
  * transformWithState); the default is event-time, which is
  * deterministic under checkpoint replay. */
final case class ChunkingConf(
    maxPendingChunkedMessage: Option[Long],
    expiryTimeOfIncompleteChunkedMessageMillis: Option[Long],
    autoAckOldestChunkedMessageOnQueueFull: Boolean,
    expiryWallClock: Boolean = false)

/** A22 client/TLS knobs — validated pass-throughs: the reference sends
  * these to the broker client (PulsarConnectionSetup.java:78-156); with
  * no broker they are parse-checked and carried, affecting nothing
  * locally (SURVEY.md §4 "option-validated no-ops"). */
final case class ClientConf(
    consumerName: Option[String],
    priorityLevel: Option[Long],
    maxTotalReceiverQueueSizeAcrossPartitions: Option[Long],
    autoUpdatePartitions: Boolean,
    autoUpdatePartitionsIntervalSeconds: Option[Long],
    replicateSubscriptionState: Boolean,
    enableTransaction: Boolean,
    operationTimeoutMs: Option[Long],
    connectionTimeoutMs: Option[Long],
    numIoThreads: Option[Long],
    numListenerThreads: Option[Long],
    keepAliveIntervalSeconds: Option[Long],
    memoryLimitBytes: Option[Long],
    tlsAllowInsecureConnection: Boolean,
    tlsHostnameVerificationEnable: Boolean,
    tlsTrustCertsFilePath: Option[String],
    tlsProtocols: Seq[String],
    tlsCiphers: Seq[String])

sealed abstract class SubscriptionType(val name: String)
object SubscriptionType {
  case object Exclusive extends SubscriptionType("Exclusive")
  case object Shared extends SubscriptionType("Shared")
  case object Failover extends SubscriptionType("Failover")
  case object KeyShared extends SubscriptionType("Key_Shared")
  val all: Seq[SubscriptionType] = Seq(Exclusive, Shared, Failover, KeyShared)
}

sealed abstract class InitialPosition(val name: String)
object InitialPosition {
  case object Latest extends InitialPosition("Latest")
  case object Earliest extends InitialPosition("Earliest")
  val all: Seq[InitialPosition] = Seq(Latest, Earliest)
}

sealed abstract class ProcessingMode(val name: String)
object ProcessingMode {
  case object Sync extends ProcessingMode("Sync")
  case object Async extends ProcessingMode("Async")
  val all: Seq[ProcessingMode] = Seq(Sync, Async)
}

sealed abstract class SubscriptionTopicsMode(val name: String)
object SubscriptionTopicsMode {
  case object AllTopics extends SubscriptionTopicsMode("AllTopics")
  case object PersistentOnly extends SubscriptionTopicsMode("PersistentOnly")
  case object NonPersistentOnly extends SubscriptionTopicsMode("NonPersistentOnly")
  val all: Seq[SubscriptionTopicsMode] = Seq(AllTopics, PersistentOnly, NonPersistentOnly)
}

object PulsarLikeConf {

  /** Build + validate from a DSv2 options map. Throws
    * IllegalArgumentException with reference-parity messages. */
  def fromOptions(opts: Map[String, String]): PulsarLikeConf = {
    def get(k: String): Option[String] =
      opts.get(k).map(_.trim).filter(_.nonEmpty)

    val serviceUrl = get("serviceUrl").getOrElse(fail(
      "Mandatory parameter 'serviceUrl' is not set."))

    // scheme => TLS inference (ConnectionConfiguration.java:25-34)
    val useTLS =
      if (serviceUrl.startsWith("pulsar+ssl://") || serviceUrl.startsWith("https")) true
      else if (serviceUrl.startsWith("pulsar://")) false
      else get("useTLS").exists(_.toBoolean)

    val topics = get("topicNames")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val pattern = get("topicsPattern")
    if (topics.isEmpty && pattern.isEmpty)
      fail("Either 'topicNames' or 'topicsPattern' must be provided.")

    def enum_[T](key: String, all: Seq[T], nameOf: T => String, default: T): T =
      get(key) match {
        case None => default
        case Some(v) => all.find(t => nameOf(t).equalsIgnoreCase(v)).getOrElse(fail(
          s"Invalid value '$v' for parameter '$key'. Valid values are: " +
            all.map(nameOf).mkString(", ") + "."))
      }

    def long_(key: String): Option[Long] = get(key).map { v =>
      try v.toLong
      catch { case _: NumberFormatException =>
        fail(s"Invalid numeric value '$v' for parameter '$key'.") }
    }

    // epoch millis or ISO-8601 instant → epoch micros (startingTime /
    // endingTime share the format and the wrap guard)
    def timeUs(key: String): Option[Long] = get(key).map { v =>
      val ms =
        try {
          if (v.forall(c => c >= '0' && c <= '9')) v.toLong
          else java.time.Instant.parse(v).toEpochMilli
        } catch { case _: Exception => fail(
          s"Invalid value '$v' for parameter '$key'. " +
            "Use epoch milliseconds or an ISO-8601 instant.") }
      // ms→µs must not wrap (epoch-NANOS by unit confusion would
      // silently seek to a garbage position otherwise)
      if (ms > Long.MaxValue / 1000L || ms < Long.MinValue / 1000L) fail(
        s"Invalid value '$v' for parameter '$key'. " +
          "Epoch value out of millisecond range.")
      ms * 1000L
    }

    val batchEnabled = get("batchReceiveEnabled").forall(_.toBoolean) // default true
    // non-positive bounds fail LOUDLY like every other validated param:
    // silently dropping an explicit 0 would run the batch unbounded and
    // could then claim "at least one must be specified" at the user who
    // did specify one
    def positive(key: String): Option[Long] = long_(key).map { v =>
      if (v <= 0) fail(s"Parameter '$key' must be positive, got $v.")
      v
    }
    val maxMsgs = positive("batchingMaxMessages")
    val maxBytes = positive("batchingMaxBytes")
    val timeout = positive("batchingTimeout")
    // reference-parity error text (PulsarMessageConsumer.java:306-309)
    if (batchEnabled && maxMsgs.isEmpty && maxBytes.isEmpty && timeout.isEmpty)
      fail("At least one of maxNumMessages, maxNumBytes, timeout must be specified.")

    // chunking knobs only take effect when batch receive is off: the
    // reference SILENTLY IGNORES them otherwise (the else-branch at
    // PulsarMessageConsumer.java:325-336 never reads them). We harden
    // beyond parity and reject the contradictory config outright — a
    // user who set chunking knobs expects chunking, and silently
    // dropping them (batchReceiveEnabled defaults to true) hides that.
    // Deliberate asymmetry: batching knobs with batch receive OFF are
    // still accepted-and-ignored, as in the reference, because they are
    // on-by-default knobs a config template commonly carries.
    val chunkKnobs = Seq("maxPendingChunkedMessage",
      "expiryTimeOfIncompleteChunkedMessageMillis",
      "autoAckOldestChunkedMessageOnQueueFull",
      "chunkExpiryWallClock").filter(get(_).isDefined)
    if (batchEnabled && chunkKnobs.nonEmpty)
      fail(s"Chunking parameters (${chunkKnobs.mkString(", ")}) require " +
        "'batchReceiveEnabled' to be false.")

    // time-based seek bounds: [startingTime, endingTime) — an empty or
    // inverted range is a config contradiction, failed like the
    // chunking-knob check above rather than returning zero rows
    val startUs = timeUs("startingTime")
    val endUs = timeUs("endingTime")
    for (s <- startUs; e <- endUs)
      if (e <= s) fail(
        s"Parameter 'endingTime' ($e µs) must be after 'startingTime' " +
          s"($s µs) — the bound is [startingTime, endingTime).")

    // message-id seek (the Reader#seek(MessageId) surface): comma-
    // separated ids "ledger:offset:partition:batch", each positioning
    // its OWN partition at that offset INCLUSIVE. Ids carry no topic,
    // so the option demands exactly one explicit topic; it contradicts
    // a time seek (two different cursors) and the retry log (whose
    // offsets are a different sequence) — both fail loudly, per this
    // layer's no-silently-dead-option rule.
    val msgIdSeeks: Map[Int, Long] = get("startingMessageId") match {
      case None => Map.empty
      case Some(raw) =>
        if (topics.size != 1 || pattern.isDefined) fail(
          "Parameter 'startingMessageId' requires exactly one explicit " +
            "topic in 'topicNames' (a message id carries no topic).")
        if (startUs.isDefined) fail(
          "Parameters 'startingMessageId' and 'startingTime' are two " +
            "different seeks — set one.")
        if (get("readRetries").exists(_.toBoolean)) fail(
          "Parameter 'startingMessageId' targets main-log offsets; it " +
            "cannot bound a retry-log read ('readRetries').")
        val entries = raw.split(",").map(_.trim).filter(_.nonEmpty).map { id =>
          id.split(":") match {
            case Array(_, off, p, _) if off.forall(_.isDigit) &&
                p.forall(_.isDigit) && off.nonEmpty && p.nonEmpty =>
              p.toInt -> off.toLong
            case _ => fail(s"Parameter 'startingMessageId': malformed " +
              s"message id '$id' (expected ledger:offset:partition:batch).")
          }
        }
        val dups = entries.groupBy(_._1).filter(_._2.length > 1).keys
        if (dups.nonEmpty) fail(
          s"Parameter 'startingMessageId': multiple ids for partition(s) " +
            s"${dups.mkString(", ")}.")
        entries.toMap
    }

    // subscription-cursor start (the durable cumulative-ack position,
    // TopicStore.ackCumulative): a THIRD seek kind, so it contradicts
    // both explicit seeks, and it reads main-log cursors so it cannot
    // bound a retry-log read — all fail loudly, per this layer's
    // no-silently-dead-option rule
    val subCursorStart =
      get("startFromSubscriptionCursor").exists(_.toBoolean)
    if (subCursorStart) {
      if (startUs.isDefined) fail(
        "Parameters 'startFromSubscriptionCursor' and 'startingTime' " +
          "are two different seeks — set one.")
      if (msgIdSeeks.nonEmpty) fail(
        "Parameters 'startFromSubscriptionCursor' and " +
          "'startingMessageId' are two different seeks — set one.")
      if (get("readRetries").exists(_.toBoolean)) fail(
        "Parameter 'startFromSubscriptionCursor' reads main-log " +
          "cursors; it cannot bound a retry-log read ('readRetries').")
    }

    PulsarLikeConf(
      serviceUrl = serviceUrl,
      useTLS = useTLS,
      topicNames = topics,
      topicsPattern = pattern,
      subscriptionTopicsMode = enum_("subscriptionTopicsMode",
        SubscriptionTopicsMode.all, (_: SubscriptionTopicsMode).name,
        SubscriptionTopicsMode.AllTopics),
      subscriptionName = get("subscriptionName").getOrElse("sub-default"),
      subscriptionType = enum_("subscriptionType", SubscriptionType.all,
        (_: SubscriptionType).name, SubscriptionType.Exclusive),
      initialPosition = enum_("subscriptionInitialPosition",
        InitialPosition.all, (_: InitialPosition).name, InitialPosition.Latest),
      processingMode = enum_("processingMode", ProcessingMode.all,
        (_: ProcessingMode).name, ProcessingMode.Sync),
      batchReceiveEnabled = batchEnabled,
      batchingMaxMessages = maxMsgs,
      batchingMaxBytes = maxBytes,
      batchingTimeoutMs = timeout,
      receiverQueueSize = long_("receiverQueueSize"),
      dlqMaxRedeliverCount =
        long_("dlqMaxRedeliverCount").map { v =>
          // .toInt would wrap past Int.MaxValue (possibly negative —
          // routing EVERY message to the DLQ instead of effectively none)
          if (v < 0 || v > Int.MaxValue) fail(
            s"Parameter 'dlqMaxRedeliverCount' out of range: $v.")
          v.toInt
        }.getOrElse(5),
      dlqTopic = get("dlqTopic"),
      nackRedeliveryDelayMs = long_("nackRedeliveryDelay"),
      // SUBSUMED, not dead (A16): the reference redelivers messages
      // neither acked nor nacked after this timeout
      // (PulsarMessageConsumer.java:279-281). In the micro-batch mapping
      // the ack IS the checkpoint commit verdict, so "delivered but
      // never acked" ≡ "epoch ran but its commit never landed" — and
      // Structured Streaming's recovery contract redelivers that exact
      // offset range on restart. The timeout VALUE collapses into
      // restart latency; no broker-side timer exists to pace. Pinned by
      // AckTimeoutSubsumptionSpec (kills a query between sink write and
      // verdict, proves the unacked epoch redelivers and acked epochs
      // do not).
      ackTimeoutMs = long_("ackTimeoutMillis"),
      readCompacted = get("readCompacted").exists(_.toBoolean),
      // local-store extensions (no reference analog): batch-read the
      // subscription's pending-redelivery queue (A16 observability), and
      // the partition count used if a write creates the topic
      readRetries = get("readRetries").exists(_.toBoolean),
      // time-based seek (the public Reader#seek(timestamp) surface;
      // no reference analog): position the subscription at the first
      // message with publish_time >= T. Takes precedence over
      // subscriptionInitialPosition; epoch millis or ISO-8601 instant.
      startingTimeUs = startUs,
      // the symmetric EXCLUSIVE upper bound (publish_time < T) for
      // batch reads — a time-range read without a post-scan filter.
      // Batch-only: the micro-batch stream hard-fails on it (a
      // validated option silently ignored is the shape this layer
      // refuses to contain — the ackTimeout lesson).
      endingTimeUs = endUs,
      startingOffsets = msgIdSeeks,
      // batch reads resume at the subscription's durable cumulative-ack
      // cursor (Pulsar: a subscription serves from its ack position).
      // Batch-only, like startingMessageId: the micro-batch stream's
      // cursor is the CHECKPOINT (A15); two durable cursors for one
      // stream would race, so the stream hard-fails on it.
      startFromSubCursor = subCursorStart,
      numPartitions = long_("numPartitions").filter(_ > 0).map(_.toInt),
      chunking = ChunkingConf(
        maxPendingChunkedMessage = long_("maxPendingChunkedMessage"),
        expiryTimeOfIncompleteChunkedMessageMillis =
          long_("expiryTimeOfIncompleteChunkedMessageMillis"),
        autoAckOldestChunkedMessageOnQueueFull =
          get("autoAckOldestChunkedMessageOnQueueFull").exists(_.toBoolean),
        expiryWallClock = get("chunkExpiryWallClock").exists(_.toBoolean)),
      client = ClientConf(
        consumerName = get("consumerName"),
        priorityLevel = long_("priorityLevel"),
        maxTotalReceiverQueueSizeAcrossPartitions =
          long_("maxTotalReceiverQueueSizeAcrossPartitions"),
        autoUpdatePartitions = get("autoUpdatePartitions").forall(_.toBoolean),
        autoUpdatePartitionsIntervalSeconds =
          long_("autoUpdatePartitionsIntervalSeconds"),
        replicateSubscriptionState =
          get("replicateSubscriptionState").exists(_.toBoolean),
        enableTransaction = get("enableTransaction").exists(_.toBoolean),
        operationTimeoutMs = long_("operationTimeout"),
        connectionTimeoutMs = long_("connectionTimeout"),
        numIoThreads = long_("numIoThreads"),
        numListenerThreads = long_("numListenerThreads"),
        keepAliveIntervalSeconds = long_("keepAliveIntervalSeconds"),
        memoryLimitBytes = long_("memoryLimit"),
        tlsAllowInsecureConnection =
          get("tlsAllowInsecureConnection").exists(_.toBoolean),
        tlsHostnameVerificationEnable =
          get("tlsHostnameVerificationEnable").exists(_.toBoolean),
        tlsTrustCertsFilePath = get("tlsTrustCertsFilePath"),
        tlsProtocols = get("tlsProtocols")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty),
        tlsCiphers = get("tlsCiphers")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty)))
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)
}
