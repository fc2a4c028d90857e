package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `media_probe(bytes)` — container-format sniff + typed metadata from
  * raw media bytes, as ONE native expression over `BinaryType`.
  *
  * This closes part of the [[graft.ext.Multimodal]] codec stub honestly:
  * no media library is needed to read container HEADERS — magic bytes
  * identify the format; PNG (IHDR chunk), JPEG (SOFn segment) and GIF
  * (logical screen descriptor) carry pixel dimensions, and WAV (RIFF
  * `fmt ` chunk) carries sample rate / channel count, all in plain
  * big-/little-endian integer fields. Pure byte reads, codegen'd,
  * map-only at any scale (and only the first KB of each blob is ever
  * touched, however large the media column is).
  *
  * Returns `struct(format string, width int, height int, sample_rate
  * int, channels int)` — image formats report 0 for the audio fields
  * and vice versa; NULL for bytes that match no known magic or whose
  * header is truncated / malformed — corrupt media routes to a
  * quarantine filter instead of crashing the scan. Reference behavior
  * boundary: the reference app has no media path at all (its payload is
  * opaque base64, DataGenerator.java:456); this operator is part of the
  * §2.9 north-star multimodal family.
  */
case class MediaProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaProbe.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"media_probe requires binary input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MediaProbe.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaProbe.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)
  override def prettyName: String = "media_probe"
}

object MediaProbe {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(format: String, w: Long, h: Long): InternalRow =
    // dimension fields are 16-bit (JPEG/GIF) or 31-bit (PNG caps at
    // 2^31-1 per spec); anything outside [1, Int.MaxValue] is malformed
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) null
    else InternalRow(UTF8String.fromString(format), w.toInt, h.toInt, 0, 0)

  private def audioRow(format: String, sampleRate: Long, channels: Int): InternalRow =
    // RIFF fields are u32/u16; a zero rate or zero channels is malformed
    if (sampleRate < 1 || sampleRate > Int.MaxValue || channels < 1) null
    else InternalRow(UTF8String.fromString(format), 0, 0, sampleRate.toInt, channels)

  private val pngMagic =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def startsWith(b: Array[Byte], magic: Array[Byte]): Boolean = {
    if (b.length < magic.length) return false
    var i = 0
    while (i < magic.length) { if (b(i) != magic(i)) return false; i += 1 }
    true
  }

  /** Called from generated code — must stay public+static. Returns null
    * for unrecognized or malformed headers.
    */
  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 10) return null
    // PNG: 8-byte magic, then the IHDR chunk (length + type + 13-byte
    // payload: width/height as big-endian u32 at offsets 16/20)
    if (startsWith(bytes, pngMagic)) {
      if (bytes.length < 24) return null
      if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R'))
        return null
      return row("png", be32(bytes, 16), be32(bytes, 20))
    }
    // GIF: "GIF87a"/"GIF89a", then the logical screen descriptor
    // (width/height as little-endian u16 at offsets 6/8)
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      return row("gif", le16(bytes, 6), le16(bytes, 8))
    }
    // WAV: "RIFF"....."WAVE", then a chunk walk to the "fmt " chunk
    // (channels as LE u16 at +2, sample rate as LE u32 at +4 of its
    // payload)
    if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes.length >= 12 &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      var pos = 12
      while (pos + 8 <= bytes.length) {
        val size = le32(bytes, pos + 4)
        if (bytes(pos) == 'f' && bytes(pos + 1) == 'm' &&
            bytes(pos + 2) == 't' && bytes(pos + 3) == ' ') {
          if (size < 16 || pos + 16 > bytes.length) return null
          return audioRow("wav", le32(bytes, pos + 12), le16(bytes, pos + 10))
        }
        // a declared chunk larger than the buffer itself cannot be
        // skipped to anything — and bounding size by bytes.length keeps
        // the position arithmetic far from Int overflow (a size near
        // 2^31 would wrap `pos` negative and the walk would index
        // bytes(negative) instead of quarantining)
        if (size < 0 || size > bytes.length) return null
        pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      return null
    }
    // JPEG: FF D8, then a marker-segment walk to the first SOFn frame
    // header (C0-CF except the non-frame C4/C8/CC), whose payload is
    // precision(1) + height(be u16) + width(be u16)
    if (u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) {
      var pos = 2
      while (pos + 4 <= bytes.length) {
        if (u8(bytes, pos) != 0xff) return null // lost marker sync
        val marker = u8(bytes, pos + 1)
        if (marker == 0xff) { pos += 1 } // fill bytes before a marker
        else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (pos + 9 > bytes.length) return null
          return row("jpeg", be16(bytes, pos + 7), be16(bytes, pos + 5))
        } else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          pos += 2 // standalone marker, no length field
        } else if (marker == 0xd9) {
          return null // EOI before any SOF
        } else {
          val len = be16(bytes, pos + 2)
          if (len < 2) return null
          pos += 2 + len
        }
      }
      return null
    }
    null
  }

  /** Column API. */
  def mediaProbe(bytes: Column): Column =
    GraftColumns.column(MediaProbe(GraftColumns.expression(bytes)))
}
