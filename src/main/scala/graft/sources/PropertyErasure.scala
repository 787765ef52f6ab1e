package graft.sources

/**
 * Typed property erasure: free-form typed application properties are erased
 * to `Map[String, String]` before they enter the row schema, with per-type
 * rules mirroring the reference's AMQP value handling
 * (ref §1.3: core/.../EventHubsSourceProvider.scala:180-226 — strings pass
 * through; binary becomes its UTF-8 string; primitive scalars render as
 * their literal form; everything structured is JSON-serialized).
 *
 * The reference leans on json4s for the catch-all case; we hand-render the
 * small JSON subset needed (no extra dependencies) with deterministic
 * ordering so erased values are stable shuffle/compare keys.
 */
object PropertyErasure {

  def erase(props: Map[String, Any]): Map[String, String] =
    props.map { case (k, v) => k -> eraseValue(v) }

  def eraseValue(v: Any): String = v match {
    case null                => "null"
    case s: String           => s
    case b: Array[Byte]      => new String(b, "UTF-8")
    case c: Char             => c.toString
    case b: Boolean          => b.toString
    case b: Byte             => b.toString
    case s: Short            => s.toString
    case i: Int              => i.toString
    case l: Long             => l.toString
    case f: Float            => renderFloat(f)
    case d: Double           => renderDouble(d)
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal       => d.bigDecimal.toPlainString
    case t: java.time.Instant => t.toString
    case m: Map[_, _]        => renderJson(m)
    case i: Iterable[_]      => renderJsonArray(i)
    case other               => other.toString
  }

  private def renderDouble(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Render via the float's own literal (1.1f -> "1.1", never the double
    * extension 1.100000023841858). */
  private def renderFloat(f: Float): String =
    if (f == math.floor(f) && !f.isInfinite && math.abs(f) < 1e15f) f.toLong.toString
    else f.toString

  private def renderJson(m: Map[_, _]): String =
    m.toSeq.map { case (k, v) => (k.toString, v) }.sortBy(_._1)
      .map { case (k, v) => s""""${MiniJson.escape(k)}":${jsonValue(v)}""" }
      .mkString("{", ",", "}")

  private def renderJsonArray(i: Iterable[_]): String =
    i.map(jsonValue).mkString("[", ",", "]")

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => s""""${MiniJson.escape(s)}""""
    case b: Boolean => b.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    // route floating point through the same renderers as top-level values so
    // a number erases identically at any nesting depth
    case f: Float  => renderFloat(f)
    case d: Double => renderDouble(d)
    case m: Map[_, _] => renderJson(m)
    case i: Iterable[_] => renderJsonArray(i)
    case other => s""""${MiniJson.escape(other.toString)}""""
  }

  /** Convenience: build an Event with typed properties erased. */
  def event(
      body: Array[Byte],
      enqueuedTimeMicros: Long,
      typedProperties: Map[String, Any],
      partitionKey: String = null,
      publisher: String = null): Event =
    Event(body, enqueuedTimeMicros, publisher, partitionKey,
      properties = erase(typedProperties))
}
