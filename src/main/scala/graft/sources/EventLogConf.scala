package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import types._

/**
 * Case-insensitive, string-typed configuration for the graft event-log
 * connector (ref: core/.../EventHubsConf.scala:55-104 — a settings bag
 * serialized into DataSource options; ours is a thin typed view over Spark's
 * own CaseInsensitiveStringMap instead of a custom map implementation).
 *
 * Options:
 *   name                 logical hub name (in-memory registry key); or
 *   path                 parquet file/dir to expose as a seeded event log
 *   partitions           partition count for `path`-seeded or auto-created logs
 *   startingPosition     "start-of-stream" | "end-of-stream" | {"seqNo":N} |
 *                        {"enqueuedTime":"ISO"} — default start for reads
 *   endingPosition       same forms; batch reads only (default end-of-stream)
 *   startingPositions    per-partition start map with precedence over the
 *                        global default (ref EventHubsConf.scala:244-315):
 *                        {"0":{"seqNo":5},"3":{"enqueuedTime":"ISO"},"2":"end-of-stream"}
 *   endingPositions      per-partition end map, same forms; batch reads only
 *   maxEventsPerTrigger  admission-control cap per micro-batch (default
 *                        partitionCount*1000, ref EventHubsSource.scala:91-96)
 *   maxRatesPerPartition per-partition per-trigger event caps with precedence
 *                        over the prorated share (ref EventHubsConf.scala:331-369):
 *                        {"0":500,"3":100}
 *   consumerGroup        named cursor namespace; independent readers keep
 *                        independent throttling state (ref EventHubsConf.scala:205)
 *   failOnDataLoss       true => error when requested seqNos have aged out;
 *                        false => clamp to earliest and log (ref R4)
 *   placementStrategy    "none" | "hash" | "balanced-hash" (ref package.scala:84-87)
 */
final case class EventLogConf(options: Map[String, String]) {
  private def get(k: String): Option[String] = options.get(k.toLowerCase)

  def name: String =
    get("name")
      .orElse(connectionStringEntityPath)
      .orElse(get("durablepath").map(p => DurableEventLog.logName(p, partitions)))
      .orElse(get("path").map(p => EventLogConf.parquetLogName(p, partitions)))
      .getOrElse(throw new IllegalArgumentException(
        "one of 'name', 'connectionString' (with EntityPath), 'durablePath', " +
          "or 'path' is required for the graft-eventlog source"))

  /** Decrypted connection string, if one was set (ref
    * EventHubsConf.connectionString, EventHubsConf.scala:137-145: stored
    * encrypted in the settings bag so renders/checkpoints never hold the
    * plaintext; see [[Obfuscation]] for what that does and does not
    * protect). Local backends need no credentials — the option exists as
    * the parity seam a remote backend implements against, and its
    * EntityPath names the log. */
  def connectionString: Option[String] =
    get("connectionstring").map(Obfuscation.unseal)

  /** EntityPath=<hub> of the connection string (ref
    * ConnectionStringBuilder.getEventHubName) — lets reference-style code
    * that only sets a connection string name its log. */
  private def connectionStringEntityPath: Option[String] =
    connectionString.flatMap(_.split(';').iterator.map(_.trim)
      .collectFirst { case s if s.toLowerCase.startsWith("entitypath=") =>
        s.substring("entitypath=".length) }
      .filter(_.nonEmpty))

  /** Redacted render: secret-bearing values never reach logs, the Spark UI,
    * or exception messages through this object (ref: the reference keeps
    * connection strings AES-encrypted inside the conf for the same reason). */
  override def toString: String = {
    val shown = options.toSeq.sortBy(_._1).map { case (k, v) =>
      if (EventLogConf.SensitiveKeys(k)) s"$k=[REDACTED]" else s"$k=$v"
    }
    s"EventLogConf(${shown.mkString(", ")})"
  }

  /** Executor-shipping form (ref EventHubsConf.trimmed,
    * EventHubsConf.scala:163-191): planning-only options — positions, rate
    * caps, placement, admission/throttling tuning — never leave the driver;
    * readers get only what [[EventLogClients.forConf]] and the retry layer
    * consume. Secrets stay in their sealed form. */
  def executorTrimmed: EventLogConf =
    EventLogConf(options.view.filterKeys(EventLogConf.ExecutorOptions).toMap)

  def path: Option[String] = get("path")

  /** Root directory of a DURABLE file-backed log ([[DurableEventLog]]):
    * readable AND writable, events survive the JVM. Mutually exclusive
    * with `path` (the read-only driver-seeded parquet view). */
  def durablePath: Option[String] = {
    val d = get("durablepath")
    require(d.isEmpty || path.isEmpty,
      "'durablePath' and 'path' are mutually exclusive — 'path' is the " +
        "read-only seeded view, 'durablePath' the writable durable log")
    d
  }

  def partitions: Int = get("partitions").map(_.toInt).getOrElse(DefaultPartitionCount)

  def startingPosition: EventPosition =
    get("startingposition").map(EventPosition.parse).getOrElse(EventPosition.FromStartOfStream)
  def endingPosition: EventPosition =
    get("endingposition").map(EventPosition.parse).getOrElse(EventPosition.FromEndOfStream)

  def startingPositions: Map[PartitionId, EventPosition] = positionMap("startingpositions")
  def endingPositions: Map[PartitionId, EventPosition] = positionMap("endingpositions")

  /** Per-partition position with precedence over the global default
    * (ref: EventHubsConf.startingPositions, EventHubsConf.scala:244-315). */
  def startingPositionFor(pid: PartitionId): EventPosition =
    startingPositions.getOrElse(pid, startingPosition)
  def endingPositionFor(pid: PartitionId): EventPosition =
    endingPositions.getOrElse(pid, endingPosition)

  private def positionMap(k: String): Map[PartitionId, EventPosition] =
    get(k).map { s =>
      MiniJson.parseMixed(s).map {
        case (pid, v: String) => pid.toInt -> EventPosition.parse(v)
        case (pid, m: Map[String @unchecked, String @unchecked]) =>
          pid.toInt -> EventPosition.fromFields(m)
        case (pid, other) =>
          throw new IllegalArgumentException(s"bad position for partition $pid: $other")
      }
    }.getOrElse(Map.empty)

  def maxEventsPerTrigger: Option[Long] = get("maxeventspertrigger").map(_.toLong)

  /** Per-partition per-trigger caps (ref: EventHubsConf.setMaxRatePerPartition
    * / setMaxRatesPerPartition, EventHubsConf.scala:331-369). */
  def maxRatesPerPartition: Map[PartitionId, Long] =
    get("maxratesperpartition").map { s =>
      MiniJson.parseObject(s).map { case (pid, v) =>
        val cap = v.toLong
        require(cap > 0, s"maxRatesPerPartition[$pid] must be positive, got $cap")
        pid.toInt -> cap
      }
    }.getOrElse(Map.empty)

  /** Named cursor namespace (ref EventHubsConf.scala:205). Each group keeps
    * its own adaptive-throttling state; checkpoints already isolate offsets. */
  def consumerGroup: String = get("consumergroup").getOrElse("$Default")

  /** Adaptive-throttling state is per (log, consumer group) so independent
    * readers never skew each other's rate feedback. */
  def throttlerKey: String = s"$name::$consumerGroup"
  def failOnDataLoss: Boolean = get("failondataloss").forall(_.toBoolean)
  def placementStrategy: String = get("placementstrategy").getOrElse("none")

  /** Adaptive slow-partition throttling (ref R3); off by default like the
    * reference's `slowPartitionAdjustment`. */
  def slowPartitionAdjustment: Boolean =
    get("slowpartitionadjustment").exists(_.toBoolean)

  /** Qualification gate for slow-partition adjustment: a partition is only
    * throttleable when its batch receive time exceeds this (ref
    * maxAcceptableBatchReceiveTime, EventHubsConf.scala:530-546; default
    * 30 s, package.scala:43). Plain millis or ISO-8601 duration. */
  def maxAcceptableBatchReceiveTimeMs: Long =
    durationMs("maxacceptablebatchreceivetime", 30000L)
  /** Scope label for the drop-stat counters this source's SQL-UI metrics
    * report: when set, only counters registered under the SAME
    * [[graft.operators.Dedup.withDropScope]] label are published, so two
    * pipelines sharing a JVM never read each other's recall loss. Unset =
    * the legacy process-wide view (every tag, whichever pipeline). */
  def dropMetricsScope: Option[String] =
    get("dropmetricsscope").filter(_.nonEmpty)

  def metricPlugin: Option[MetricPlugin] =
    get("metricplugin").map(cls => Class.forName(cls)
      .getDeclaredConstructor().newInstance().asInstanceOf[MetricPlugin])
  def throttlingStatusPlugin: Option[ThrottlingStatusPlugin] =
    get("throttlingstatusplugin").map(cls => Class.forName(cls)
      .getDeclaredConstructor().newInstance().asInstanceOf[ThrottlingStatusPlugin])

  // ---- resilience / tuning knobs (ref package.scala:39-57 defaults) ----

  /** Bounded retries for transient backend faults; 0 disables the retry
    * wrapper entirely (ref RetryCount=10, package.scala:57). */
  def maxRetries: Int = get("maxretries").map(_.toInt).getOrElse(10)
  def retryDelayMs: Long = get("retrydelayms").map { s =>
    val v = s.toLong; require(v >= 0, s"retryDelayMs must be >= 0, got $v"); v
  }.getOrElse(10L)
  /** Bound on ONE receive attempt (ref DefaultReceiverTimeout 60 s). */
  def receiverTimeoutMs: Long = durationMs("receivertimeout", 60000L)
  /** Bound on one whole client operation including retries
    * (ref DefaultOperationTimeout 300 s). */
  def operationTimeoutMs: Long = durationMs("operationtimeout", 300000L)
  def retryPolicy: RetryPolicy =
    RetryPolicy(maxRetries, retryDelayMs, receiverTimeoutMs, operationTimeoutMs)

  /** Per-partition read-ahead rows for the parquet striped cursor (ref
    * prefetchCount, package.scala:44-47; the reference's AMQP receiver
    * prefetches this many events ahead of the consumer). None = default. */
  def prefetchCount: Option[Long] = get("prefetchcount").map { s =>
    val v = s.toLong
    require(v >= 1, s"prefetchCount must be >= 1, got $v")
    v
  }

  // ---- transport-scope knobs: ACCEPTED and VALIDATED, documented inert ----
  // These tune the reference's AMQP connection lifecycle (receiver
  // recreation, epoch receivers, client thread pool) — transport concerns
  // with no counterpart on the local/simulated backend, which holds no
  // connection to keep alive. They are parsed and range-checked with the
  // reference's rules so a migrating user's conf passes `validated()`
  // unchanged instead of hitting the strict-option rejection, and are
  // deliberately NOT wired to any behavior.

  /** Receiver-recreation threshold after silence (ref setMaxSilentTime,
    * EventHubsConf.scala:387-397: rejects values below MinSilentTime, the
    * AMQP client's 30 s floor). Validated, inert on the local backend. */
  def maxSilentTimeMs: Option[Long] = get("maxsilenttime").map { s =>
    val v = EventLogConf.parseDurationMs(s)
    require(v >= 30000L, s"maxSilentTime is less than the 30 s minimum: $v ms")
    v
  }

  /** Epoch-receiver flag (ref setUseExclusiveReceiver,
    * EventHubsConf.scala:410-418; default true). Validated boolean, inert
    * on the local backend (the striped parquet cursor is always exclusive
    * to this job). */
  def useExclusiveReceiver: Boolean =
    get("useexclusivereceiver").forall { s =>
      require(s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false"),
        s"useExclusiveReceiver must be a boolean, got '$s'")
      s.toBoolean
    }

  /** AMQP client thread-pool size (ref setThreadPoolSize,
    * EventHubsConf.scala:560-571). Validated positive, inert on the local
    * backend (reads run on Spark task threads). */
  def threadPoolSize: Option[Int] = get("threadpoolsize").map { s =>
    val v = s.toInt
    require(v >= 1, s"threadPoolSize must be >= 1, got $v")
    v
  }

  /** Durations accept plain milliseconds or ISO-8601 ("PT60S"). */
  private def durationMs(k: String, dflt: Long): Long = get(k).map { s =>
    val v = EventLogConf.parseDurationMs(s)
    require(v > 0, s"$k must be positive, got $v")
    v
  }.getOrElse(dflt)

  /** Fail on any option the connector does not understand — a typo'd conf
    * silently doing nothing is the worst failure mode of a settings bag
    * (the reference validates through typed EventHubsConf setters; a
    * string-option surface needs an explicit whitelist instead). */
  def validated(): EventLogConf = {
    val unknown =
      options.keySet -- EventLogConf.KnownOptions -- EventLogConf.PassthroughKeys
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"unknown graft-eventlog option(s): ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"known options: ${EventLogConf.KnownOptions.toSeq.sorted.mkString(", ")}")
    // transport-scope knobs are wired to nothing, so their range checks
    // would otherwise never run — force them here so a bad value fails at
    // the same boundary every other option does
    maxSilentTimeMs; useExclusiveReceiver; threadPoolSize
    this
  }
}

object EventLogConf {
  /** Shared duration parse: plain milliseconds or ISO-8601 ("PT60S"). */
  private[sources] def parseDurationMs(s: String): Long =
    if (s.nonEmpty && (s.charAt(0) == 'P' || s.charAt(0) == 'p'))
      java.time.Duration.parse(s).toMillis
    else s.toLong

  def apply(opts: CaseInsensitiveStringMap): EventLogConf =
    EventLogConf(sealSecrets(
      opts.asCaseSensitiveMap().asScala.map { case (k, v) => k.toLowerCase -> v }.toMap))

  def parquetLogName(path: String, partitions: Int): String = s"parquet:$path#$partitions"

  /** Options whose values are credentials: sealed at the connector boundary,
    * redacted in every render. */
  val SensitiveKeys: Set[String] = Set("connectionstring")

  /** Seal sensitive values (idempotent — already-sealed values are kept) so
    * a settings bag built from user options never holds plaintext secrets.
    * Applied at every connector boundary that accepts raw options (DSv2
    * option maps, catalog table properties). */
  def sealSecrets(opts: Map[String, String]): Map[String, String] =
    opts.map { case (k, v) =>
      if (SensitiveKeys(k.toLowerCase)) k.toLowerCase -> Obfuscation.seal(v)
      else k -> v
    }

  /** Every option the connector understands (lowercase). */
  val KnownOptions: Set[String] = Set(
    "name", "path", "durablepath", "partitions", "connectionstring",
    "startingposition", "endingposition", "startingpositions", "endingpositions",
    "maxeventspertrigger", "maxratesperpartition", "consumergroup",
    "failondataloss", "placementstrategy", "slowpartitionadjustment",
    "maxacceptablebatchreceivetime", "dropmetricsscope",
    "metricplugin", "throttlingstatusplugin",
    "maxretries", "retrydelayms", "receivertimeout", "operationtimeout",
    "prefetchcount",
    // transport-scope: validated, documented inert on the local backend
    "maxsilenttime", "useexclusivereceiver", "threadpoolsize")

  /** What executors need (ref EventHubsConf.trimmed's include list,
    * EventHubsConf.scala:163-191): identity + credentials + receive/retry
    * tuning + the reader-side metric plugin + the slow-partition feedback
    * pair — readers RECORD receive metrics gated on
    * `slowpartitionadjustment` (the reference ships
    * SlowPartitionAdjustmentKey and MaxAcceptableBatchReceiveTimeKey for
    * the same executor→driver feedback path), so stripping them would
    * silently disable R3 throttling. Everything else is planning state. */
  val ExecutorOptions: Set[String] = Set(
    "name", "path", "durablepath", "partitions", "connectionstring", "consumergroup",
    "failondataloss", "metricplugin",
    "slowpartitionadjustment", "maxacceptablebatchreceivetime",
    "maxretries", "retrydelayms", "receivertimeout", "operationtimeout",
    "prefetchcount")

  /** Keys Spark itself or the catalog layer injects into option maps —
    * present-but-not-ours, never rejected. */
  private[sources] val PassthroughKeys: Set[String] = Set(
    "checkpointlocation", "queryname", "provider", "owner", "location",
    "comment", "external")
}

/**
 * Obfuscation for secret-bearing conf values (ref EventHubsUtils
 * encrypt/decrypt, EventHubsUtils.scala:187-207): AES with a key derived
 * from a fixed connector string via PBKDF2. Like the reference's, this is
 * HYGIENE, not protection from an adversary who can run code in the same
 * JVM — it keeps plaintext credentials out of logs, the Spark UI, explain
 * output, checkpoint metadata, and heap dumps of serialized conf maps.
 * Sealed values carry an `enc:` prefix so sealing is idempotent and
 * mixed-provenance maps (user-fresh vs catalog-loaded) normalize safely.
 */
object Obfuscation {
  private val Prefix = "enc:"
  // the 1000-iteration PBKDF2 derivation runs ONCE: the key is a fixed
  // constant, and seal/unseal sit on per-task paths (conf.name via
  // EntityPath resolves through unseal in every reader)
  private lazy val keySpec: javax.crypto.spec.SecretKeySpec = {
    val version = "graft-eventlog-1"
    val factory = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val spec = new javax.crypto.spec.PBEKeySpec(
      version.toCharArray, version.getBytes("UTF-8"), 1000, 256)
    new javax.crypto.spec.SecretKeySpec(
      factory.generateSecret(spec).getEncoded, "AES")
  }

  private def decryptBody(value: String): String = {
    val cipher = javax.crypto.Cipher.getInstance("AES/ECB/PKCS5Padding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE, keySpec)
    new String(cipher.doFinal(
      java.util.Base64.getDecoder.decode(value.substring(Prefix.length))), "UTF-8")
  }

  /** Idempotent: a value is "already sealed" only if it carries the marker
    * AND a non-empty body that decrypts — a plaintext credential that
    * merely happens to start with the marker (including the bare marker:
    * AES decrypt of an EMPTY body "succeeds" with empty output) gets
    * sealed like any other, instead of being stored verbatim and read back
    * wrong at unseal time. */
  def seal(value: String): String =
    if (value.length > Prefix.length && value.startsWith(Prefix) &&
        scala.util.Try(decryptBody(value)).isSuccess) value
    else {
      val cipher = javax.crypto.Cipher.getInstance("AES/ECB/PKCS5Padding")
      cipher.init(javax.crypto.Cipher.ENCRYPT_MODE, keySpec)
      Prefix + java.util.Base64.getEncoder.encodeToString(
        cipher.doFinal(value.getBytes("UTF-8")))
    }

  def unseal(value: String): String =
    if (!value.startsWith(Prefix) || value.length == Prefix.length) value
    else try decryptBody(value)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        "value carries the sealed-credential marker but does not decrypt — " +
          "it was not sealed by this connector; re-set the credential", e)
    }
}

/**
 * Proportional admission control: split a per-trigger event budget across
 * partitions proportionally to backlog, guaranteeing small partitions are not
 * starved (ref: EventHubsSource.rateLimit, core/.../EventHubsSource.scala:263-319
 * — same floor/ceil semantics, reimplemented).
 *
 * Given per-partition (from, latest) bounds and a total budget, returns the
 * per-partition until-seqNo for the next batch. `maxRates` caps individual
 * partitions' advance regardless of their prorated share — including in the
 * whole-backlog-fits fast path (ref per-partition max rate clamp,
 * EventHubsConf.scala:331-369).
 */
object RateLimiter {
  def prorate(
      bounds: Map[PartitionId, (SequenceNumber, SequenceNumber)],
      budget: Long,
      throttleFactor: PartitionId => Double = _ => 1.0,
      maxRates: Map[PartitionId, Long] = Map.empty): Map[PartitionId, SequenceNumber] = {
    require(budget > 0, s"budget must be positive, got $budget")
    def capped(p: PartitionId, from: SequenceNumber, until: SequenceNumber): SequenceNumber =
      maxRates.get(p).fold(until)(cap => math.min(until, from + cap))
    val backlog: Map[PartitionId, Long] =
      bounds.map { case (p, (from, latest)) => p -> math.max(0L, latest - from) }
    val total = backlog.values.sum
    if (total == 0) {
      bounds.map { case (p, (from, _)) => p -> from }
    } else if (total <= budget) {
      bounds.map { case (p, (from, latest)) => p -> capped(p, from, latest) }
    } else {
      bounds.map { case (p, (from, latest)) =>
        val share = budget.toDouble * backlog(p) / total * throttleFactor(p)
        // DELIBERATE DIVERGENCE from the reference: it floors prorated
        // shares >= 1 (EventHubsSource.scala:308-315), which can starve a
        // tiny-backlog partition whose share rounds to 0 for many triggers;
        // we ceil, so every nonempty partition advances every trigger at the
        // cost of overshooting the budget by at most P-1 events/trigger
        // (bounded, property-tested in RateLimiterPropertySpec). Clamp to
        // the service-reported latest.
        val until = from + math.ceil(share).toLong
        p -> capped(p, from, math.min(latest, math.max(from, until)))
      }
    }
  }
}

/**
 * Stable partition->executor placement so executor-side reader caches stay
 * warm across micro-batches (ref: core/.../EventHubsSource.scala:386-397 and
 * 468-484; strategies at package.scala:84-87).
 *
 *  - Hash: place partition i on executor hash(name-i) mod E.
 *  - BalancedHash: start at hash(name) mod E and round-robin partitions from
 *    there — guarantees an even spread even when the hash clusters.
 */
object PlacementStrategy {
  def locate(
      strategy: String,
      np: NameAndPartition,
      sortedExecutors: IndexedSeq[String]): Option[String] = {
    if (sortedExecutors.isEmpty) None
    else strategy.toLowerCase match {
      case "hash" =>
        Some(sortedExecutors(math.floorMod(np.toString.hashCode, sortedExecutors.size)))
      case "balanced-hash" | "balancedhash" =>
        val base = math.floorMod(np.name.hashCode, sortedExecutors.size)
        Some(sortedExecutors(math.floorMod(base + np.partitionId, sortedExecutors.size)))
      case _ => None
    }
  }
}
