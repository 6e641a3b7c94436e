package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FlatBufs, WireFraming}
import FlatBufs.{Scalar, Str, Tbl, VecF32, VecI64, VecTbl}

/** The minimal FlatBuffers codec behind the weather wire.
  *
  * The golden facts pinned here were CROSS-VALIDATED against the
  * reference's real generated Python reader (the vendored
  * openmeteo_sdk.WeatherApiResponse + flatbuffers packages,
  * /root/reference/package): the exact buffers built by
  * [[WireFraming]]'s encoder were parsed by `GetRootAs` and every
  * scalar, enum id, float32 value, and both axis arms matched what
  * [[WireFraming.parseMessage]] reads. If these assertions drift, the
  * wire no longer speaks the reference's format.
  */
class FlatBufsSpec extends AnyFunSuite {

  test("round-trip: every value kind through build + Table") {
    val buf = FlatBufs.build(Tbl(Seq(
      4 -> Scalar.f32(1.5f),
      6 -> Scalar.i64(-42L),
      8 -> Scalar.u8(200),
      10 -> Scalar.i16(-3),
      12 -> Scalar.i32(123456),
      14 -> Str("héllo"),
      16 -> VecF32(Array(1f, 2.25f, Float.NaN)),
      18 -> VecI64(Array(Long.MinValue, 0L, Long.MaxValue)),
      20 -> VecTbl(Seq(
        Tbl(Seq(4 -> Scalar.u8(1))),
        Tbl(Seq(4 -> Scalar.u8(2), 6 -> Str("x"))))),
      22 -> Scalar.f64(math.Pi))))
    val t = FlatBufs.root(buf)
    assert(t.f32(4) === 1.5f)
    assert(t.i64(6) === -42L)
    assert(t.u8(8) === 200)
    assert(t.i16(10) === -3)
    assert(t.i32(12) === 123456)
    assert(t.string(14) === Some("héllo"))
    val fs = t.vecF32(16)
    assert(fs(0) === 1f && fs(1) === 2.25f && fs(2).isNaN)
    assert(t.vecI64(18).toSeq === Seq(Long.MinValue, 0L, Long.MaxValue))
    assert(t.vecLen(20) === 2)
    assert(t.vecTable(20, 0).u8(4) === 1)
    assert(t.vecTable(20, 1).u8(4) === 2)
    assert(t.vecTable(20, 1).string(6) === Some("x"))
    assert(t.f64(22) === math.Pi)
  }

  test("absent fields return schema defaults, like generated accessors") {
    val buf = FlatBufs.build(Tbl(Seq(4 -> Scalar.u8(9))))
    val t = FlatBufs.root(buf)
    assert(t.u8(4) === 9)
    assert(t.i64(6) === 0L) // in-vtable slot, zero offset
    assert(t.f32(6, 2.5f) === 2.5f)
    assert(t.i32(100, -1) === -1) // beyond the vtable entirely
    assert(t.table(8) === None)
    assert(t.string(8) === None)
    assert(t.vecLen(8) === 0)
    assert(t.vecF32(8).isEmpty)
  }

  test("scalars land naturally aligned (spec requirement)") {
    val buf = FlatBufs.build(Tbl(Seq(
      4 -> Scalar.u8(1), 6 -> Scalar.i64(7L), 8 -> Scalar.i16(3),
      10 -> Scalar.f64(1.0), 12 -> Scalar.i32(5))))
    val t = FlatBufs.root(buf)
    assert(t.fieldPos(6) % 8 === 0)
    assert(t.fieldPos(10) % 8 === 0)
    assert(t.fieldPos(12) % 4 === 0)
    assert(t.fieldPos(8) % 2 === 0)
    assert(t.i64(6) === 7L && t.f64(10) === 1.0 && t.i32(12) === 5)
  }

  test("golden hourly frame: the buffer the Python generated reader parsed") {
    // Cross-validated 2026-08: openmeteo_sdk.WeatherApiResponse.GetRootAs
    // read these exact values from this exact encoder output.
    val payload = WireFraming.decodeChunks(WireFraming.encodeResponseChunks(
      loc = 7L, start = 1704067200L * 1000000L,
      end = (1704067200L + 4 * 3600L) * 1000000L,
      interval = 3600L * 1000000L,
      variables = Seq("temperature_2m", "rain", "wind_speed_10m"),
      slotsPerMessage = 100)).next()
    val m = WireFraming.parseMessage(payload)
    assert(m.loc === 7L)
    assert(m.latitude === 88.25f && m.longitude === -144.25f)
    assert(m.elevation === 1072.75f && m.model === 3)
    assert(m.startMicros === 1704067200L * 1000000L)
    assert(m.intervalMicros === 3600L * 1000000L)
    assert(m.nSlots === 4)
    assert(m.varMeta.map(v =>
      (v.variableId, v.unitId, v.aggregationId, v.altitudeM)).toSeq ===
      Seq((47, 1, 0, 2), (28, 32, 0, 0), (59, 24, 0, 10)))
    // float32-quantized doubles, exactly what ValuesAsNumpy() yielded
    assert(m.series(0).map(_.toFloat).toSeq ===
      Seq(62.32f, 47.6f, -17.36f, -13.84f))
    assert(m.series(1).map(_.toFloat).toSeq ===
      Seq(147.8f, 133.08f, -17.96f, -14.44f))
    assert(m.series(2).map(_.toFloat).toSeq ===
      Seq(-18.09f, 121.75f, -47.53f, -16.81f))
    // raw-buffer shape facts the Python reader relied on: root uoffset,
    // Hourly arm present (slot 26), Monthly/Daily absent
    val root = FlatBufs.root(payload)
    assert(root.table(26).isDefined && root.table(30).isEmpty &&
      root.table(24).isEmpty)
    assert(root.string(18) === None) // Timezone omitted -> None, like py
  }

  test("cadence picks the response arm: 900s rides Minutely15, like the reference request") {
    def arm(intervalSec: Long): Seq[Int] = {
      val payload = WireFraming.decodeChunks(WireFraming.encodeResponseChunks(
        loc = 1L, start = 1704067200L * 1000000L,
        end = (1704067200L + 2 * intervalSec) * 1000000L,
        interval = intervalSec * 1000000L,
        variables = Seq("rain"), slotsPerMessage = 100)).next()
      val root = FlatBufs.root(payload)
      // slots 22/24/26/28 = Current/Daily/Hourly/Minutely15
      Seq(22, 24, 26, 28).filter(root.table(_).isDefined)
    }
    assert(arm(900L) === Seq(28))
    assert(arm(3600L) === Seq(26))
    assert(arm(86400L) === Seq(24))
    assert(arm(21600L) === Seq(26)) // six-hourly: generic fixed interval
    // parse reads all arms identically
    val p = WireFraming.decodeChunks(WireFraming.encodeResponseChunks(
      loc = 1L, start = 1704067200L * 1000000L,
      end = (1704067200L + 1800L) * 1000000L, interval = 900L * 1000000L,
      variables = Seq("rain"), slotsPerMessage = 100)).next()
    val m = WireFraming.parseMessage(p)
    assert(m.nSlots === 2 && m.intervalMicros === 900L * 1000000L)
  }

  test("golden monthly frame: Year/Month axis, count and f32 value") {
    val payload = WireFraming.decodeChunks(WireFraming.encodeMonthlyChunks(
      loc = 2L, months = Iterator(1709251200L * 1000000L),
      variables = Seq("temperature_2m"))).next()
    // the Python reader saw: year=2024 month=3 count=1 values=24.45
    val root = FlatBufs.root(payload)
    val monthly = root.table(30).get
    assert(monthly.i16(4) === 2024 && monthly.u8(6) === 3)
    assert(monthly.i32(8) === 1)
    val m = WireFraming.parseMessage(payload)
    assert(m.loc === 2L && m.nSlots === 1 && m.intervalMicros === 0L)
    assert(m.startMicros === 1709251200L * 1000000L)
    assert(m.series(0).head.toFloat === 24.45f)
  }

  test("parseMessage rejects malformed buffers as WireError") {
    intercept[WireFraming.WireError] {
      WireFraming.parseMessage(Array[Byte](1, 2, 3))
    }
    // a valid FlatBuffer that is not a weather response (no axis arm)
    val stray = FlatBufs.build(Tbl(Seq(4 -> Scalar.f32(1f))))
    intercept[WireFraming.WireError] { WireFraming.parseMessage(stray) }
  }
}
