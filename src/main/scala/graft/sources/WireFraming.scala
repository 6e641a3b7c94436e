package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** The reference's wire framing, re-expressed as the parse layer of the
  * weather-grid source (openmeteo_requests/Client.py:31-43): an HTTP body
  * is a concatenation of `[4-byte little-endian length][payload]` frames,
  * EXCEPT that the server signals an in-stream error by emitting raw
  * UTF-8 text starting with "Unexpected" — whose first 4 bytes read as
  * the little-endian int 0x78656E55 ("Unex") — in place of a length
  * prefix. A decoder that sees that magic must surface the rest of the
  * stream as the error message instead of parsing garbage frames.
  *
  * The payload here is a simple columnar grid message (the stand-in for
  * the reference's FlatBuffers table, which is not a public dependency of
  * this build): little-endian
  * `[long location][long startMicros][long intervalMicros]
  *  [int nSlots][int nVars][nVars x nSlots doubles]`,
  * variables in REQUEST order exactly like the reference's response
  * (lambda_function.py:27-36 — request order = column order).
  */
object WireFraming {
  /** LE int of ASCII "Unex" — every server error message begins with
    * "Unexpected", so matching the first 4 bytes against this magic is
    * the in-stream error check (Client.py:38-40).
    */
  val ErrorMagic: Int = 0x78656E55

  final class WireError(message: String) extends RuntimeException(message)

  /** Frame a message sequence into one wire body. */
  def encode(messages: Seq[Array[Byte]]): Array[Byte] = {
    val buf = ByteBuffer.allocate(messages.map(_.length + 4).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    messages.foreach { m => buf.putInt(m.length); buf.put(m) }
    buf.array()
  }

  /** An in-stream error blob: raw UTF-8 text whose leading "Unexpected"
    * doubles as the error magic. Appended by a server mid-stream, never
    * length-prefixed.
    */
  def encodeError(message: String): Array[Byte] = {
    require(message.startsWith("Unexpected"),
      "wire errors must start with 'Unexpected' — the magic IS the text")
    message.getBytes(UTF_8)
  }

  /** Lazily walk the frames of a wire body. Throws [[WireError]] with the
    * embedded message when the error magic appears in place of a length
    * prefix, and on truncated frames.
    */
  def decode(data: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pos = 0
      override def hasNext: Boolean = pos < data.length
      override def next(): Array[Byte] = {
        if (pos + 4 > data.length)
          throw new WireError(s"truncated length prefix at byte $pos")
        val len = ByteBuffer.wrap(data, pos, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        if (len == ErrorMagic)
          throw new WireError(new String(data, pos, data.length - pos, UTF_8))
        if (len < 0 || pos + 4 + len > data.length)
          throw new WireError(s"truncated frame at byte $pos (len=$len)")
        val out = java.util.Arrays.copyOfRange(data, pos + 4, pos + 4 + len)
        pos += 4 + len
        out
      }
    }

  /** One decoded columnar grid message: `series(v)(i)` is variable v's
    * value at slot i, variables in request order.
    */
  final case class GridMessage(loc: Long, startMicros: Long,
                               intervalMicros: Long, nSlots: Int,
                               series: Array[Array[Double]])

  /** Server side: the [start, end) grid for one location as framed
    * columnar messages of at most `slotsPerMessage` slots each — the
    * multi-message body shape of the reference's batched responses.
    * Values come from the same deterministic generator the source has
    * always used ([[WeatherGridSource.value]]), so going through bytes
    * changes no query result.
    */
  def encodeResponse(loc: Long, start: Long, end: Long, interval: Long,
                     variables: Seq[String], slotsPerMessage: Int,
                     injectError: Boolean = false): Array[Byte] = {
    val keys = variables.map(WeatherGridSource.varKey)
    val totalSlots = math.max(0L, (end - start + interval - 1) / interval)
    val messages = (0L until totalSlots by slotsPerMessage.toLong).map { s0 =>
      val n = math.min(slotsPerMessage.toLong, totalSlots - s0).toInt
      val msgStart = start + s0 * interval
      val buf = ByteBuffer.allocate(32 + variables.size * n * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putLong(loc).putLong(msgStart).putLong(interval)
        .putInt(n).putInt(variables.size)
      keys.foreach { k =>
        var i = 0
        while (i < n) {
          buf.putDouble(WeatherGridSource.value(loc, msgStart + i * interval, k))
          i += 1
        }
      }
      buf.array()
    }
    val body = encode(messages)
    if (!injectError) body
    else {
      // fault injection for the error-path test: a valid first frame (if
      // any), then the raw error text where the next frame should start
      val cut = if (messages.isEmpty) 0 else 4 + messages.head.length
      val err = encodeError(
        "Unexpected weather API error: synthetic fault injection")
      val out = new Array[Byte](cut + err.length)
      System.arraycopy(body, 0, out, 0, cut)
      System.arraycopy(err, 0, out, cut, err.length)
      out
    }
  }

  /** Parse one frame payload back into a [[GridMessage]]. */
  def parseMessage(payload: Array[Byte]): GridMessage = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val loc = buf.getLong; val start = buf.getLong; val interval = buf.getLong
    val nSlots = buf.getInt; val nVars = buf.getInt
    if (payload.length != 32 + nVars.toLong * nSlots * 8)
      throw new WireError(
        s"grid message size mismatch: ${payload.length} bytes for " +
          s"$nVars vars x $nSlots slots")
    val series = Array.ofDim[Double](nVars, nSlots)
    var v = 0
    while (v < nVars) {
      var i = 0
      while (i < nSlots) { series(v)(i) = buf.getDouble; i += 1 }
      v += 1
    }
    GridMessage(loc, start, interval, nSlots, series)
  }
}
