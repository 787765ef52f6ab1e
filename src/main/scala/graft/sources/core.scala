package graft.sources

import java.time.Instant

/**
 * Core domain types for the graft event-log connector.
 *
 * The data model mirrors the reference's partitioned, offset-addressed event
 * log (ref: core/.../NameAndPartition.scala:28, EventPosition.scala:31-34,
 * OffsetRange.scala:42-83) re-expressed for Spark DataSource V2: a stream is a
 * named log with dense integer partitions; every position is normalized to a
 * per-partition sequence number before planning; the unit of work is a
 * half-open seqNo range [fromSeqNo, untilSeqNo) that maps 1:1 onto a DSv2
 * InputPartition.
 */
object types {
  type PartitionId = Int
  type SequenceNumber = Long
  type Rate = Long

  /** Sentinel sequence numbers (ref: core/.../EventPosition.scala:75-83). */
  val StartOfStreamSeqNo: SequenceNumber = -1L
  val EndOfStreamSeqNo: SequenceNumber = -2L

  /** Sentinel OFFSET strings (ref: core/.../package.scala:34-35 — the
    * reference's byte-offset position kind reserves "-1" for start-of-stream
    * and "@latest" for end-of-stream). */
  val StartOfStreamOffset: String = "-1"
  val EndOfStreamOffset: String = "@latest"

  val DefaultPartitionCount: Int = 4
  val DefaultMaxEventsPerTrigger: Long = 1000L
}

import types._

/** Identity of one partition of one named event log. */
final case class NameAndPartition(name: String, partitionId: PartitionId) {
  require(partitionId >= 0, s"negative partitionId $partitionId")
  override def toString: String = s"$name-$partitionId"
}

/**
 * A position within a partition, normalized to a sequence number at planning
 * time. One of: a byte-offset string, an absolute sequence number, an
 * enqueued-time seek, or a start/end-of-stream sentinel. (ref:
 * core/.../EventPosition.scala:31-106 — the reference's threefold
 * offset/seqNo/enqueuedTime model; translation at
 * EventHubsClient.scala:264-353.)
 */
sealed trait EventPosition extends Serializable
object EventPosition {
  /** Byte-offset position (ref: EventPosition.scala:42-56). The offset is a
    * backend-defined STRING: the same opaque token the source emits in its
    * `offset` column, fed back to seek — with the reserved sentinels
    * [[types.StartOfStreamOffset]] ("-1") and [[types.EndOfStreamOffset]]
    * ("@latest"). Translation to a seqNo is the backend's job
    * (EventLogClient.seekOffset). */
  final case class FromOffset(offset: String, isInclusive: Boolean = true)
      extends EventPosition
  final case class FromSequenceNumber(seqNo: SequenceNumber, isInclusive: Boolean = true)
      extends EventPosition
  final case class FromEnqueuedTime(time: Instant) extends EventPosition
  case object FromStartOfStream extends EventPosition
  case object FromEndOfStream extends EventPosition

  def fromOffset(offset: String): EventPosition = FromOffset(offset)
  def fromSequenceNumber(seqNo: SequenceNumber): EventPosition = FromSequenceNumber(seqNo)
  def fromEnqueuedTime(t: Instant): EventPosition = FromEnqueuedTime(t)

  /** Build from the parsed-object form {"offset":"…"} / {"seqNo":N} /
    * {"enqueuedTime":"ISO"} — offset wins when several are present, matching
    * the reference's convert precedence (EventPosition.scala:37-47). */
  def fromFields(m: Map[String, String]): EventPosition =
    m.get("offset")
      .map(v => FromOffset(v))
      .orElse(m.get("seqNo").map(v => FromSequenceNumber(v.toLong)))
      .orElse(m.get("enqueuedTime").map(v => FromEnqueuedTime(Instant.parse(v))))
      .getOrElse(throw new IllegalArgumentException(s"bad position: $m"))

  /** Parse the option-string form: "start-of-stream" | "end-of-stream" |
    * {"offset":"…"} | {"seqNo":N} | {"enqueuedTime":"ISO-8601"} */
  def parse(s: String): EventPosition = s.trim match {
    case "start-of-stream" | "earliest" => FromStartOfStream
    case "end-of-stream" | "latest"     => FromEndOfStream
    case j if j.startsWith("{") => fromFields(MiniJson.parseObject(j))
    case other =>
      // bare long = sequence number
      try FromSequenceNumber(other.toLong)
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"bad position: $s")
      }
  }

  def render(p: EventPosition): String = p match {
    case FromStartOfStream           => "start-of-stream"
    case FromEndOfStream             => "end-of-stream"
    case FromOffset(o, _)            => s"""{"offset":"${MiniJson.escape(o)}"}"""
    case FromSequenceNumber(n, _)    => s"""{"seqNo":$n}"""
    case FromEnqueuedTime(t)         => s"""{"enqueuedTime":"$t"}"""
  }
}

/**
 * The scan unit: a half-open range [fromSeqNo, untilSeqNo) of one partition,
 * with an optional preferred executor (ref: core/.../OffsetRange.scala:53-83).
 * Maps 1:1 to a DSv2 InputPartition; the invariant "input-partition index ==
 * log partition id" (ref: EventHubsRDDPartition.scala:27) is preserved by
 * planInputPartitions emitting ranges in partition order.
 */
final case class OffsetRange(
    nameAndPartition: NameAndPartition,
    fromSeqNo: SequenceNumber,
    untilSeqNo: SequenceNumber,
    preferredLoc: Option[String]) {
  require(fromSeqNo >= 0, s"fromSeqNo $fromSeqNo < 0 for $nameAndPartition")
  require(untilSeqNo >= fromSeqNo, s"inverted range [$fromSeqNo,$untilSeqNo) for $nameAndPartition")
  def name: String = nameAndPartition.name
  def partitionId: PartitionId = nameAndPartition.partitionId
  def count: Long = untilSeqNo - fromSeqNo
}

/**
 * Minimal JSON support for the connector's flat offset/position payloads.
 * Hand-rolled (no external deps) because every document we (de)serialize is a
 * one- or two-level object of strings and longs:
 *   {"hub":{"0":123,"1":456}}   — source offsets (ref JsonUtils.scala:63-100)
 *   {"seqNo":42}                — positions
 */
object MiniJson {
  /** Parse a flat JSON object of scalar values into Map[String, String]
    * (numbers/strings/bools rendered as their literal text, unquoted). */
  def parseObject(s: String): Map[String, String] = {
    val p = new Parser(s)
    p.skipWs()
    val m = p.parseObj(flatten = true).asInstanceOf[Map[String, String]]
    m
  }

  /** Parse a two-level object: {"name":{"pid":seqNo,...},...} */
  def parseNested(s: String): Map[String, Map[String, String]] = {
    val p = new Parser(s)
    p.skipWs()
    p.parseObj(flatten = false).asInstanceOf[Map[String, Map[String, String]]]
  }

  /** Parse one level whose values are either scalars (-> String) or flat
    * objects (-> Map[String, String]) — the per-partition position form
    * {"0":{"seqNo":5},"3":"end-of-stream"}. */
  def parseMixed(s: String): Map[String, Any] = {
    val p = new Parser(s)
    p.skipWs()
    p.parseObj(flatten = false)
  }

  def renderPartitionSeqNos(name: String, seqNos: Map[PartitionId, SequenceNumber]): String = {
    val inner = seqNos.toSeq.sortBy(_._1)
      .map { case (p, s) => s""""$p":$s""" }.mkString(",")
    s"""{"${escape(name)}":{$inner}}"""
  }

  def parsePartitionSeqNos(s: String): Map[NameAndPartition, SequenceNumber] =
    parseNested(s).flatMap { case (name, inner) =>
      inner.map { case (pid, seq) => NameAndPartition(name, pid.toInt) -> seq.toLong }
    }

  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c    => c.toString
  }

  private final class Parser(s: String) {
    private var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      skipWs()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i in $s")
      i += 1
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case c => sb.append(c)
          }
        } else sb.append(s.charAt(i))
        i += 1
      }
      i += 1
      sb.toString
    }
    private def parseScalar(): String = {
      skipWs()
      if (s.charAt(i) == '"') parseString()
      else {
        val start = i
        while (i < s.length && !",}]".contains(s.charAt(i)) && !s.charAt(i).isWhitespace) i += 1
        s.substring(start, i)
      }
    }
    def parseObj(flatten: Boolean): Map[String, Any] = {
      expect('{')
      val b = Map.newBuilder[String, Any]
      skipWs()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        expect(':')
        skipWs()
        val v: Any =
          if (!flatten && s.charAt(i) == '{') parseObj(flatten = true)
          else parseScalar()
        b += k -> v
        skipWs()
        if (i < s.length && s.charAt(i) == ',') i += 1 else done = true
      }
      expect('}')
      b.result()
    }
  }
}
