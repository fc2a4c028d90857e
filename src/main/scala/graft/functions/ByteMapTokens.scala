package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `byte_map_tokens(text)` — GPT-2-style BYTE-LEVEL pre-tokenization
  * (X5f byte-totality, r14; the `bytes_to_unicode` construction of
  * Radford et al. 2019 / openai/gpt-2 `encoder.py`, public): split on
  * ASCII whitespace, then map each word's raw UTF-8 BYTES one-to-one
  * onto a fixed 256-character alphabet — the 188 printable Latin-1
  * bytes (33-126, 161-172, 174-255) map to their own code point, the
  * 68 control/space/soft-hyphen bytes shift to U+0100+index so every
  * symbol is a visible single BMP char that no tokenizer boundary can
  * eat. The byte-level guarantee follows: EVERY possible input byte is
  * one of the 256 base symbols, so a BPE vocabulary seeded with all of
  * them encodes ARBITRARY UTF-8 text with zero unknowns — the totality
  * the [a-z0-9] alphabet approximates with its reserved-unk policy
  * (x86). The mapping is a bijection, so [[ByteMapTokens.unmapWord]]
  * restores the exact original bytes (round-trip pinned in ExtSpec).
  *
  * Splitting runs directly on the UTF-8 bytes: multi-byte sequences
  * never contain bytes < 0x80, so splitting on the six ASCII
  * whitespace bytes (0x09-0x0D, 0x20 — exactly the oracle's
  * `[ \t\n\x0b\f\r]+` class) can never cut a code point. Map-only,
  * no join, no shuffle; one codegen'd expression (the BpeSegment /
  * RefLmScore discipline).
  */
case class ByteMapTokens(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    ByteMapTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteMapTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteMapTokens =
    copy(child = newChild)
  override def prettyName: String = "byte_map_tokens"
}

object ByteMapTokens {

  /** byte (0..255) → mapped char. Identity on the printable Latin-1
    * ranges; the 68 excluded bytes (0-32, 127-160, 173) shift to
    * 256 + their ascending index — the exact GPT-2 table.
    */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var shift = 0
    var b = 0
    while (b < 256) {
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) || b >= 174)
        out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
      b += 1
    }
    out
  }

  /** mapped char → byte (the inverse; total on the image). */
  private val charToByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var b = 0
    while (b < 256) {
      m.put(Character.valueOf(byteToChar(b)), java.lang.Byte.valueOf(b.toByte))
      b += 1
    }
    m
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** One word's UTF-8 bytes → mapped-alphabet string. */
  def mapWord(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[mapWord]] at the byte level: mapped string → the
    * exact original bytes. Fails loudly on a char outside the mapped
    * alphabet (impossible for strings this module produced).
    */
  def unmapBytes(mapped: String): Array[Byte] = {
    val bytes = new Array[Byte](mapped.length)
    var i = 0
    while (i < mapped.length) {
      val b = charToByte.get(Character.valueOf(mapped.charAt(i)))
      require(b != null, s"char U+${mapped.charAt(i).toInt.toHexString} " +
        "is not in the byte-mapped alphabet")
      bytes(i) = b.byteValue()
      i += 1
    }
    bytes
  }

  /** [[unmapBytes]] decoded as UTF-8 text (total when the mapped
    * string came from [[mapWord]] of real text).
    */
  def unmapWord(mapped: String): String =
    new String(unmapBytes(mapped), java.nio.charset.StandardCharsets.UTF_8)

  /** Called from generated code — must stay public+static. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || isWs(bytes(i))) {
        if (sb.length > 0) {
          out += UTF8String.fromString(sb.toString)
          sb.setLength(0)
        }
      } else sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def byte_map_tokens(text: Column): Column =
    GraftColumns.column(ByteMapTokens(GraftColumns.expression(text)))
}
