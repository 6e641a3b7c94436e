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
  *  [int nSlots][int nVars]
  *  [float latitude][float longitude][float elevation][ubyte model]
  *  [nVars x ([short variable][ubyte unit][ubyte aggregation]
  *            [int altitude])]
  *  [nVars x nSlots doubles]`,
  * variables in REQUEST order exactly like the reference's response
  * (lambda_function.py:27-36 — request order = column order). The four
  * metadata scalars mirror the reference response's per-location header
  * (openmeteo_sdk/WeatherApiResponse.py:32-71: Latitude/Longitude/
  * Elevation as Float32, Model as Uint8), and the per-variable block
  * mirrors VariableWithValues' column header (Variable/Unit/Aggregation
  * enum ids + Altitude, openmeteo_sdk/VariableWithValues.py) — the ids
  * resolve against [[WeatherVocab]] on both ends.
  *
  * Both directions STREAM: the server emits frames one at a time
  * ([[encodeResponseChunks]]) and the client decodes from an arbitrary
  * chunk iterator with memory bounded by one frame ([[decodeChunks]]) —
  * an eager whole-body materialization would make per-task memory grow
  * with the scan window, at odds with fleet-scale scans.
  */
object WireFraming {
  /** LE int of ASCII "Unex" — every server error message begins with
    * "Unexpected", so matching the first 4 bytes against this magic is
    * the in-stream error check (Client.py:38-40).
    */
  val ErrorMagic: Int = 0x78656E55

  /** Fixed frame-header size: 3 longs + 2 ints + 3 floats + 1 byte. */
  val HeaderBytes: Int = 8 * 3 + 4 * 2 + 4 * 3 + 1

  /** Per-variable header block: short + 2 ubytes + int. */
  val VarMetaBytes: Int = 2 + 1 + 1 + 4

  /** One data column's identity on the wire — VariableWithValues' enum
    * ids (variable/unit/aggregation + altitude in metres, 0 = none —
    * the FlatBuffers scalar default, VariableWithValues.py:104-108).
    */
  final case class VarMeta(variableId: Int, unitId: Int,
                           aggregationId: Int, altitudeM: Int)

  final class WireError(message: String) extends RuntimeException(message)

  /** Frame a message sequence into one wire body (test/one-shot form). */
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

  /** Lazily walk the frames of a wire body arriving as ARBITRARY byte
    * chunks (the streaming-HTTP read path). Buffered bytes never exceed
    * one frame plus one chunk, regardless of how many frames the body
    * holds. Throws [[WireError]] when the error magic appears in place of
    * a length prefix (the remainder of the stream is the message) and on
    * truncated frames.
    */
  def decodeChunks(chunks: Iterator[Array[Byte]]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var buf: Array[Byte] = Array.emptyByteArray
      private var pos = 0 // consumed prefix of buf
      private def avail: Int = buf.length - pos
      private def pull(): Boolean =
        if (!chunks.hasNext) false
        else {
          val c = chunks.next()
          if (avail == 0) buf = c
          else { // compact: drop the consumed prefix, append the chunk
            val nb = new Array[Byte](avail + c.length)
            System.arraycopy(buf, pos, nb, 0, avail)
            System.arraycopy(c, 0, nb, avail, c.length)
            buf = nb
          }
          pos = 0
          true
        }
      private def ensure(n: Int): Boolean = {
        while (avail < n && pull()) {}
        avail >= n
      }
      override def hasNext: Boolean = ensure(1)
      override def next(): Array[Byte] = {
        if (!ensure(4))
          throw new WireError(s"truncated length prefix ($avail bytes left)")
        val len = ByteBuffer.wrap(buf, pos, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        if (len == ErrorMagic) {
          while (pull()) {} // the REST of the stream is the error text
          throw new WireError(new String(buf, pos, avail, UTF_8))
        }
        if (len < 0 || !ensure(4 + len))
          throw new WireError(s"truncated frame (len=$len, $avail bytes left)")
        val out = java.util.Arrays.copyOfRange(buf, pos + 4, pos + 4 + len)
        pos += 4 + len
        out
      }
    }

  /** Whole-body decode (test/one-shot form) — same semantics, one chunk. */
  def decode(data: Array[Byte]): Iterator[Array[Byte]] =
    decodeChunks(Iterator.single(data))

  /** One decoded columnar grid message: `series(v)(i)` is variable v's
    * value at slot i, variables in request order; lat/lon/elevation/model
    * are the response-level location metadata scalars.
    */
  final case class GridMessage(loc: Long, startMicros: Long,
                               intervalMicros: Long, nSlots: Int,
                               latitude: Float, longitude: Float,
                               elevation: Float, model: Int,
                               varMeta: Array[VarMeta],
                               series: Array[Array[Double]])

  /** One framed (length-prefixed) message: `slotTs(i)` is slot i's
    * timestamp in micros — callers pass an arithmetic grid (fixed-interval
    * axes) or a calendar point (monthly). Values come from the same
    * deterministic generator the source has always used
    * ([[WeatherGridSource.value]]), so going through bytes changes no
    * query result.
    */
  private def frameChunk(loc: Long, msgStart: Long, interval: Long,
                         nSlots: Int, slotTs: Int => Long,
                         variables: Seq[String]): Array[Byte] = {
    val keys = variables.map(WeatherGridSource.varKey)
    val payload = HeaderBytes + variables.size * VarMetaBytes +
      keys.size * nSlots * 8
    val buf = ByteBuffer.allocate(4 + payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(payload)
    buf.putLong(loc).putLong(msgStart).putLong(interval)
      .putInt(nSlots).putInt(keys.size)
    buf.putFloat(WeatherGridSource.latitude(loc))
      .putFloat(WeatherGridSource.longitude(loc))
      .putFloat(WeatherGridSource.elevation(loc))
      .put(WeatherGridSource.modelId(loc).toByte)
    variables.foreach { v =>
      val m = WeatherGridSource.varMeta(v)
      buf.putShort(m.variableId.toShort).put(m.unitId.toByte)
        .put(m.aggregationId.toByte).putInt(m.altitudeM)
    }
    keys.foreach { k =>
      var i = 0
      while (i < nSlots) {
        buf.putDouble(WeatherGridSource.value(loc, slotTs(i), k))
        i += 1
      }
    }
    buf.array()
  }

  private def withInjectedError(frames: Iterator[Array[Byte]],
                                inject: Boolean): Iterator[Array[Byte]] =
    if (!inject) frames
    else // a valid first frame (if any), then the raw error text where the
         // next frame should start — the fault-injection shape the error-
         // path tests exercise end-to-end
      frames.take(1) ++ Iterator.single(encodeError(
        "Unexpected weather API error: synthetic fault injection"))

  /** Server side, streaming: the [start, end) fixed-interval grid for one
    * location as a LAZY iterator of wire chunks, one length-prefixed
    * columnar frame of at most `slotsPerMessage` slots each — the
    * multi-message body shape of the reference's batched responses, with
    * per-task memory bounded by ONE frame regardless of the scan window.
    */
  def encodeResponseChunks(loc: Long, start: Long, end: Long, interval: Long,
                           variables: Seq[String], slotsPerMessage: Int,
                           injectError: Boolean = false): Iterator[Array[Byte]] = {
    val totalSlots = math.max(0L, (end - start + interval - 1) / interval)
    val frames = (0L until totalSlots by slotsPerMessage.toLong).iterator
      .map { s0 =>
        val n = math.min(slotsPerMessage.toLong, totalSlots - s0).toInt
        val msgStart = start + s0 * interval
        frameChunk(loc, msgStart, interval, n,
          i => msgStart + i * interval, variables)
      }
    withInjectedError(frames, injectError)
  }

  /** Server side, monthly axis: calendar-month slots have no fixed
    * `intervalMicros` (the one axis the interval knob cannot express —
    * openmeteo_sdk/VariablesWithMonth.py carries Year/Month instead of a
    * time step), so each month is its own single-slot frame whose
    * msgStart IS the slot timestamp.
    */
  def encodeMonthlyChunks(loc: Long, months: Iterator[Long],
                          variables: Seq[String],
                          injectError: Boolean = false): Iterator[Array[Byte]] = {
    val frames = months.map(m => frameChunk(loc, m, 0L, 1, _ => m, variables))
    withInjectedError(frames, injectError)
  }

  /** Parse one frame payload back into a [[GridMessage]]. */
  def parseMessage(payload: Array[Byte]): GridMessage = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val loc = buf.getLong; val start = buf.getLong; val interval = buf.getLong
    val nSlots = buf.getInt; val nVars = buf.getInt
    val lat = buf.getFloat; val lon = buf.getFloat; val elev = buf.getFloat
    val model = buf.get() & 0xFF // uint8, like the reference's Model field
    if (payload.length !=
        HeaderBytes + nVars.toLong * VarMetaBytes + nVars.toLong * nSlots * 8)
      throw new WireError(
        s"grid message size mismatch: ${payload.length} bytes for " +
          s"$nVars vars x $nSlots slots")
    val meta = Array.tabulate(nVars) { _ =>
      VarMeta(buf.getShort.toInt, buf.get() & 0xFF, buf.get() & 0xFF,
              buf.getInt)
    }
    val series = Array.ofDim[Double](nVars, nSlots)
    var v = 0
    while (v < nVars) {
      var i = 0
      while (i < nSlots) { series(v)(i) = buf.getDouble; i += 1 }
      v += 1
    }
    GridMessage(loc, start, interval, nSlots, lat, lon, elev, model, meta,
                series)
  }
}
