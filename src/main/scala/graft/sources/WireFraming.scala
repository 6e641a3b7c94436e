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
  * Each frame's payload is a REAL `WeatherApiResponse` FlatBuffer
  * ([[FlatBufs]] implements the public wire format), field-for-field on
  * the reference's generated table layouts:
  *  - response header: Latitude/Longitude/Elevation Float32, LocationId
  *    Int64, Model Uint8 (openmeteo_sdk/WeatherApiResponse.py:32-79,
  *    vtable slots 4/6/8/12/14);
  *  - fixed-interval axes ride the cadence-matched VariablesWithTime
  *    arm (`Minutely15` for 900 s — the reference's own request,
  *    lambda_function.py:107-119 — `Daily` for 86400 s, `Hourly`
  *    otherwise): Time/TimeEnd epoch seconds Int64, Interval seconds
  *    Int32, Variables vector (VariablesWithTime.py:31-56, slots
  *    4/6/8/10);
  *  - the calendar-month axis rides the `Monthly` VariablesWithMonth arm
  *    — Year Int16, Month Int8, Count Int32, Variables vector
  *    (VariablesWithMonth.py:31-56);
  *  - each data column is a VariableWithValues: Variable/Unit/
  *    Aggregation Uint8 enum ids + Altitude Int16, Values as a Float32
  *    vector (VariableWithValues.py:29-114) — ids resolve against
  *    [[WeatherVocab]] on both ends, and values are f32-quantized on
  *    the wire exactly as the reference's `ValuesAsNumpy()` float32
  *    columns are.
  * Variables appear in REQUEST order exactly like the reference's
  * response (lambda_function.py:27-36 — request order = column order).
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

  /** Vtable slots of the openmeteo_sdk tables (the byte offsets the
    * reference's generated accessors pass to `Offset(...)`).
    */
  private object Slots {
    // WeatherApiResponse.py:32-142
    val Latitude = 4; val Longitude = 6; val Elevation = 8
    val LocationId = 12; val Model = 14
    val Current = 22; val Daily = 24; val Hourly = 26
    val Minutely15 = 28; val Monthly = 30
    // VariablesWithTime.py:31-56
    val Time = 4; val TimeEnd = 6; val Interval = 8; val Variables = 10
    // VariablesWithMonth.py:31-56 (Variables shares slot 10)
    val Year = 4; val Month = 6; val Count = 8
    // VariableWithValues.py:29-114
    val Variable = 4; val Unit = 6; val Values = 10
    val Altitude = 14; val Aggregation = 16
  }

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
    * axes) or a calendar point (monthly). Values come from the
    * deterministic generator ([[WeatherGridSource.value]]) quantized to
    * Float32 on the wire, the real schema's value type — every consumer
    * reads through this path, so the quantization is uniform.
    */
  private def utcOf(micros: Long): java.time.ZonedDateTime =
    java.time.Instant.ofEpochSecond(micros / 1000000L)
      .atZone(java.time.ZoneOffset.UTC)

  private def frameChunk(loc: Long, msgStart: Long, interval: Long,
                         nSlots: Int, slotTs: Int => Long,
                         variables: Seq[String]): Array[Byte] = {
    import FlatBufs.{Scalar, Tbl, VecF32, VecTbl}
    require(msgStart % 1000000L == 0 && interval % 1000000L == 0,
      s"wire times are epoch seconds; got micros $msgStart/$interval")
    val varTables = variables.map { v =>
      val m = WeatherGridSource.varMeta(v)
      val k = WeatherGridSource.varKey(v)
      val values = Array.tabulate(nSlots)(i =>
        WeatherGridSource.value(loc, slotTs(i), k).toFloat)
      // default-valued scalars are OMITTED, like generated builders
      Tbl(Seq(Slots.Variable -> Scalar.u8(m.variableId),
              Slots.Unit -> Scalar.u8(m.unitId),
              Slots.Aggregation -> Scalar.u8(m.aggregationId),
              Slots.Altitude -> Scalar.i16(m.altitudeM),
              Slots.Values -> VecF32(values))
        .filter {
          case (_, Scalar(_, 0L)) => false
          case _                  => true
        })
    }
    // cadence picks the response arm, like the real API: the reference's
    // 15-minute request reads `Minutely15` (lambda_function.py:107-119)
    val armSlot = interval / 1000000L match {
      case 900L   => Slots.Minutely15
      case 86400L => Slots.Daily
      case _      => Slots.Hourly
    }
    val axis =
      if (interval > 0L) // fixed-interval grid -> a VariablesWithTime arm
        armSlot -> Tbl(Seq(
          Slots.Time -> Scalar.i64(msgStart / 1000000L),
          Slots.TimeEnd ->
            Scalar.i64((msgStart + nSlots.toLong * interval) / 1000000L),
          Slots.Interval -> Scalar.i32((interval / 1000000L).toInt),
          Slots.Variables -> VecTbl(varTables)))
      else { // calendar-month frame -> the Monthly arm (Year/Month axis)
        val zdt = utcOf(msgStart)
        Slots.Monthly -> Tbl(Seq(
          Slots.Year -> Scalar.i16(zdt.getYear),
          Slots.Month -> Scalar.i8(zdt.getMonthValue),
          Slots.Count -> Scalar.i32(nSlots),
          Slots.Variables -> VecTbl(varTables)).filter {
            case (_, Scalar(_, 0L)) => false
            case _                  => true
          })
      }
    val payload = FlatBufs.build(
      Tbl(Seq(
        Slots.Latitude -> Scalar.f32(WeatherGridSource.latitude(loc)),
        Slots.Longitude -> Scalar.f32(WeatherGridSource.longitude(loc)),
        Slots.Elevation -> Scalar.f32(WeatherGridSource.elevation(loc)),
        Slots.LocationId -> Scalar.i64(loc),
        Slots.Model -> Scalar.u8(WeatherGridSource.modelId(loc)),
        axis).filter {
          case (_, Scalar(_, 0L)) => false
          case _                  => true
        }),
      sizeHint = 256 + variables.size * (64 + nSlots * 4))
    val framed = ByteBuffer.allocate(4 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    framed.putInt(payload.length).put(payload)
    framed.array()
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

  /** Parse one frame payload — a `WeatherApiResponse` FlatBuffer — back
    * into a [[GridMessage]]. Values are Float32 on the wire (the
    * reference reads them as numpy float32, lambda_function.py:112-119)
    * and widen to double here, so downstream sees f32-quantized doubles
    * exactly as the reference pipeline does.
    */
  def parseMessage(payload: Array[Byte]): GridMessage =
    try {
      val root = FlatBufs.root(payload)
      val loc = root.i64(Slots.LocationId)
      val lat = root.f32(Slots.Latitude)
      val lon = root.f32(Slots.Longitude)
      val elev = root.f32(Slots.Elevation)
      val model = root.u8(Slots.Model)
      // the AXIS is authoritative for the slot count — a zero-variable
      // request (e.g. a pruned-to-nothing COUNT(*) scan) still describes
      // its time grid, exactly like the reference's Time/TimeEnd pair
      val (axis, startMicros, intervalMicros, nSlots) =
        Seq(Slots.Minutely15, Slots.Hourly, Slots.Daily, Slots.Current)
          .iterator.flatMap(root.table(_)).nextOption() match {
          case Some(h) =>
            val interval = h.i32(Slots.Interval)
            if (interval <= 0)
              throw new WireError(s"non-positive Interval $interval")
            val slots =
              ((h.i64(Slots.TimeEnd) - h.i64(Slots.Time)) / interval).toInt
            (h, h.i64(Slots.Time) * 1000000L, interval.toLong * 1000000L,
             slots)
          case None =>
            val m = root.table(Slots.Monthly).getOrElse(
              throw new WireError(
                "response carries no time-series arm (minutely_15/hourly/" +
                  "daily/current/monthly all absent)"))
            val start = java.time.LocalDate
              .of(m.i16(Slots.Year), m.u8(Slots.Month), 1)
              .atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.getEpochSecond * 1000000L
            (m, start, 0L, m.i32(Slots.Count))
        }
      if (nSlots < 0)
        throw new WireError(s"negative slot count $nSlots")
      val nVars = axis.vecLen(Slots.Variables)
      val meta = new Array[VarMeta](nVars)
      val series = new Array[Array[Double]](nVars)
      var v = 0
      while (v < nVars) {
        val t = axis.vecTable(Slots.Variables, v)
        meta(v) = VarMeta(t.u8(Slots.Variable), t.u8(Slots.Unit),
                          t.u8(Slots.Aggregation), t.i16(Slots.Altitude))
        val vals = t.vecF32(Slots.Values)
        if (vals.length != nSlots)
          throw new WireError(
            s"Values length ${vals.length} != axis slot count $nSlots")
        series(v) = vals.map(_.toDouble)
        v += 1
      }
      GridMessage(loc, startMicros, intervalMicros, nSlots, lat, lon, elev,
                  model, meta, series)
    } catch {
      case e: WireError => throw e
      case e @ (_: IllegalArgumentException |
                _: IndexOutOfBoundsException |
                _: java.time.DateTimeException) =>
        throw new WireError(s"malformed response buffer: ${e.getMessage}")
    }
}
