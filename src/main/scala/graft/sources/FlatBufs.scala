package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** A minimal FlatBuffers codec — just enough of Google's public wire
  * format (flatbuffers.dev, "FlatBuffers internals") to read and write
  * the openmeteo_sdk response tables, so the weather wire carries REAL
  * `WeatherApiResponse` FlatBuffers instead of a stand-in layout. No
  * FlatBuffers dependency resolves in this build, and the format is
  * small: this file implements it from the public spec directly.
  *
  * Format facts used here (all little-endian):
  *  - The buffer starts with a u32 uoffset to the root table
  *    (`target = offset_position + stored_value`, so the root value is
  *    simply the root table's position).
  *  - A table starts with an i32 soffset to its vtable
  *    (`vtable_pos = table_pos - stored_value`), followed by inline
  *    field data.
  *  - A vtable is u16 `vtable_bytes`, u16 `table_bytes`, then one u16
  *    per field slot: the field's offset from the table start, 0 when
  *    the field is absent (reader returns the schema default). Field
  *    slot N lives at vtable byte offset `4 + 2*N` — the same constants
  *    the reference's generated accessors pass to `Offset(...)`
  *    (e.g. WeatherApiResponse.py:32 `Offset(4)` = slot 0).
  *  - Strings and vectors are reached through a u32 uoffset; at the
  *    target, a u32 element count precedes the payload. Table-vector
  *    elements are themselves uoffsets, one per table.
  *
  * The writer emits front-to-back (root table first, children after,
  * offsets patched once child positions are known) — layout-equivalent
  * to flatc's back-to-front construction because every uoffset still
  * points forward and every soffset still resolves to its vtable.
  * Fields equal to their schema default are omitted, exactly like
  * generated builders (`self.Get(... ) ... return 0.0` fallbacks in
  * WeatherApiResponse.py). Scalars are naturally aligned: tables are
  * 8-aligned and fields padded per width, vectors pad so elements land
  * on their own width.
  */
object FlatBufs {

  // ---------------------------------------------------------------- values

  /** One field value to serialize. `slot` keys are vtable byte offsets
    * (4, 6, 8, ... — matching the generated accessors' constants).
    */
  sealed trait Val
  /** Inline scalar: `width` bytes of `bits`, little-endian. */
  final case class Scalar(width: Int, bits: Long) extends Val
  final case class Str(s: String) extends Val
  final case class VecF32(xs: Array[Float]) extends Val
  final case class VecI64(xs: Array[Long]) extends Val
  final case class Tbl(fields: Seq[(Int, Val)]) extends Val
  final case class VecTbl(xs: Seq[Tbl]) extends Val

  object Scalar {
    def u8(v: Int): Scalar = Scalar(1, v.toLong & 0xffL)
    def i8(v: Int): Scalar = Scalar(1, v.toLong & 0xffL)
    def i16(v: Int): Scalar = Scalar(2, v.toLong & 0xffffL)
    def i32(v: Int): Scalar = Scalar(4, v.toLong & 0xffffffffL)
    def i64(v: Long): Scalar = Scalar(8, v)
    def f32(v: Float): Scalar =
      Scalar(4, java.lang.Float.floatToRawIntBits(v).toLong & 0xffffffffL)
    def f64(v: Double): Scalar =
      Scalar(8, java.lang.Double.doubleToRawLongBits(v))
  }

  // ---------------------------------------------------------------- writer

  private final class Buf(initial: Int) {
    private var a = new Array[Byte](math.max(initial, 64))
    var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > a.length) {
        var cap = a.length
        while (cap < pos + n) cap *= 2
        a = java.util.Arrays.copyOf(a, cap)
      }
    def align(n: Int): Unit = { // zero-pad to an n-byte boundary
      val pad = (n - pos % n) % n
      ensure(pad); pos += pad
    }
    def put(width: Int, bits: Long): Unit = {
      ensure(width)
      var i = 0
      while (i < width) { a(pos + i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
      pos += width
    }
    def putBytes(bs: Array[Byte]): Unit = {
      ensure(bs.length)
      System.arraycopy(bs, 0, a, pos, bs.length)
      pos += bs.length
    }
    def skip(n: Int): Unit = { ensure(n); pos += n }
    def pwrite(at: Int, width: Int, bits: Long): Unit = {
      var i = 0
      while (i < width) { a(at + i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(a, pos)
  }

  private def width(v: Val): Int = v match {
    case Scalar(w, _) => w
    case _            => 4 // offset-typed fields inline as a u32 uoffset
  }

  /** Serialize `root` into a standalone FlatBuffers byte array. */
  def build(root: Tbl, sizeHint: Int = 1024): Array[Byte] = {
    val out = new Buf(sizeHint)
    out.skip(4) // root uoffset, patched when the root table lands
    // (node to emit, position of the u32 uoffset that points at it)
    val queue = mutable.Queue[(Val, Int)]((root, 0))
    while (queue.nonEmpty) {
      val (node, patchAt) = queue.dequeue()
      val nodePos = node match {
        case t: Tbl => emitTable(out, t, queue)
        case Str(s) =>
          val bs = s.getBytes(UTF_8)
          out.align(4)
          val p = out.pos
          out.put(4, bs.length.toLong)
          out.putBytes(bs)
          out.put(1, 0L) // flatc null-terminates strings
          p
        case VecF32(xs) =>
          out.align(4)
          val p = out.pos
          out.put(4, xs.length.toLong)
          xs.foreach(x =>
            out.put(4, java.lang.Float.floatToRawIntBits(x).toLong & 0xffffffffL))
          p
        case VecI64(xs) =>
          // pad so the first ELEMENT (at p+4) is 8-aligned
          out.align(4)
          if ((out.pos + 4) % 8 != 0) out.skip(4)
          val p = out.pos
          out.put(4, xs.length.toLong)
          xs.foreach(out.put(8, _))
          p
        case VecTbl(xs) =>
          out.align(4)
          val p = out.pos
          out.put(4, xs.length.toLong)
          val elemBase = out.pos
          out.skip(4 * xs.length)
          xs.zipWithIndex.foreach { case (t, i) =>
            queue.enqueue((t, elemBase + 4 * i))
          }
          p
        case s: Scalar =>
          throw new IllegalArgumentException(s"scalar $s is not a heap node")
      }
      out.pwrite(patchAt, 4, (nodePos - patchAt).toLong)
    }
    out.toArray
  }

  private def emitTable(out: Buf, t: Tbl,
                        queue: mutable.Queue[(Val, Int)]): Int = {
    val fields = t.fields.sortBy(_._1)
    require(fields.map(_._1).distinct.size == fields.size,
      "duplicate field slot in table")
    val nSlots =
      if (fields.isEmpty) 0 else (fields.map(_._1).max - 4) / 2 + 1
    val vtBytes = 4 + 2 * nSlots
    // table layout: i32 soffset at 0, then fields widest-first (each
    // naturally aligned — the table itself starts 8-aligned)
    var cursor = 4
    val rel = fields.sortBy { case (slot, v) => (-width(v), slot) }.map {
      case (slot, v) =>
        val w = width(v)
        cursor = cursor + ((w - cursor % w) % w)
        val r = cursor
        cursor += w
        (slot, v, r)
    }
    val tblBytes = cursor
    out.align(2)
    val vtPos = out.pos
    out.put(2, vtBytes.toLong)
    out.put(2, tblBytes.toLong)
    val slotRel = rel.map { case (slot, _, r) => slot -> r }.toMap
    (0 until nSlots).foreach { i =>
      out.put(2, slotRel.getOrElse(4 + 2 * i, 0).toLong)
    }
    out.align(8)
    val tblPos = out.pos
    out.skip(tblBytes) // zero-filled; fields patched in place below
    out.pwrite(tblPos, 4, (tblPos - vtPos).toLong) // i32 soffset to vtable
    rel.foreach { case (_, v, r) =>
      v match {
        case Scalar(w, bits) => out.pwrite(tblPos + r, w, bits)
        case child           => queue.enqueue((child, tblPos + r))
      }
    }
    tblPos
  }

  // ---------------------------------------------------------------- reader

  /** Positioned table reader — the Scala analog of the generated
    * accessors' `Offset`/`Get`/`Indirect`/`String`/`Vector` walk.
    * Accessors take the same vtable byte offsets the generated code
    * passes to `Offset(...)`; absent fields yield the given default,
    * like the generated `return 0.0` fallbacks.
    */
  final class Table(val bytes: Array[Byte], val pos: Int) {
    private def u8at(p: Int): Int = bytes(p) & 0xff
    private def u16at(p: Int): Int = u8at(p) | (u8at(p + 1) << 8)
    private def i32at(p: Int): Int =
      u8at(p) | (u8at(p + 1) << 8) | (u8at(p + 2) << 16) | (u8at(p + 3) << 24)
    private def i64at(p: Int): Long =
      (i32at(p).toLong & 0xffffffffL) | (i32at(p + 4).toLong << 32)

    private val vtPos = pos - i32at(pos)
    private val vtBytes = u16at(vtPos)

    /** Absolute position of a field's data, or 0 when absent. */
    def fieldPos(slot: Int): Int =
      if (slot + 1 < vtBytes) {
        val rel = u16at(vtPos + slot)
        if (rel == 0) 0 else pos + rel
      } else 0

    def u8(slot: Int, default: Int = 0): Int = {
      val p = fieldPos(slot); if (p == 0) default else u8at(p)
    }
    def i16(slot: Int, default: Int = 0): Int = {
      val p = fieldPos(slot); if (p == 0) default else u16at(p).toShort.toInt
    }
    def i32(slot: Int, default: Int = 0): Int = {
      val p = fieldPos(slot); if (p == 0) default else i32at(p)
    }
    def i64(slot: Int, default: Long = 0L): Long = {
      val p = fieldPos(slot); if (p == 0) default else i64at(p)
    }
    def f32(slot: Int, default: Float = 0f): Float = {
      val p = fieldPos(slot)
      if (p == 0) default else java.lang.Float.intBitsToFloat(i32at(p))
    }
    def f64(slot: Int, default: Double = 0.0): Double = {
      val p = fieldPos(slot)
      if (p == 0) default else java.lang.Double.longBitsToDouble(i64at(p))
    }

    private def indirect(p: Int): Int = p + i32at(p)

    def table(slot: Int): Option[Table] = {
      val p = fieldPos(slot)
      if (p == 0) None else Some(new Table(bytes, indirect(p)))
    }
    def string(slot: Int): Option[String] = {
      val p = fieldPos(slot)
      if (p == 0) None
      else {
        val t = indirect(p)
        Some(new String(bytes, t + 4, i32at(t), UTF_8))
      }
    }
    def vecLen(slot: Int): Int = {
      val p = fieldPos(slot); if (p == 0) 0 else i32at(indirect(p))
    }
    def vecF32(slot: Int): Array[Float] = {
      val p = fieldPos(slot)
      if (p == 0) Array.emptyFloatArray
      else {
        val t = indirect(p)
        Array.tabulate(i32at(t))(j =>
          java.lang.Float.intBitsToFloat(i32at(t + 4 + 4 * j)))
      }
    }
    def vecI64(slot: Int): Array[Long] = {
      val p = fieldPos(slot)
      if (p == 0) Array.emptyLongArray
      else {
        val t = indirect(p)
        Array.tabulate(i32at(t))(j => i64at(t + 4 + 8 * j))
      }
    }
    def vecTable(slot: Int, j: Int): Table = {
      val p = fieldPos(slot)
      require(p != 0, s"table vector at slot $slot is absent")
      val t = indirect(p)
      require(j >= 0 && j < i32at(t),
        s"table vector index $j out of ${i32at(t)}")
      new Table(bytes, indirect(t + 4 + 4 * j))
    }
  }

  /** Open a buffer at its root table. */
  def root(bytes: Array[Byte]): Table = {
    require(bytes.length >= 8, s"buffer too small: ${bytes.length} bytes")
    val rootPos = (bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8) |
      ((bytes(2) & 0xff) << 16) | ((bytes(3) & 0xff) << 24)
    require(rootPos >= 4 && rootPos < bytes.length,
      s"root offset $rootPos out of ${bytes.length}-byte buffer")
    new Table(bytes, rootPos)
  }
}
