package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Member-aware SPLITTABLE reader for per-record-gzip containers — the
  * format Common Crawl actually ships (`.warc.gz` with one gzip MEMBER
  * per WARC record, members concatenated; RFC 1952 §2.2 makes member
  * concatenation a valid gzip stream, which is exactly what lets a
  * reader resynchronize mid-file). Plain gzip input is
  * one-task-per-file in every engine — at 100 TB that is a cluster
  * idling behind a handful of stuck tasks — but per-record members
  * restore split parallelism: any byte offset can scan forward to the
  * next member boundary and decompress independently from there.
  *
  * Split protocol (the text-format `LineRecordReader` discipline,
  * re-based onto gzip member boundaries):
  *  - a split owns every member whose FIRST byte lies in
  *    `[start, end)`; the final owned member is read to completion
  *    past `end` (the next split's scan skips over it);
  *  - at `start > 0` the reader scans forward for the member magic
  *    (`1f 8b 08`) and VALIDATES the candidate by fully decompressing
  *    it and checking the RFC 1952 trailer (CRC32 + ISIZE) — a magic
  *    byte-triple inside compressed data essentially cannot pass both,
  *    so false syncs self-correct by advancing the scan;
  *  - a member that decompresses but fails its trailer mid-file is a
  *    false sync, not data: the scan resumes past its magic. A member
  *    cut off by end-of-file (the truncated-download reality) EMITS
  *    its partial plaintext — the WARC parser's `Content-Length`
  *    integrity gate then quarantines it as a `malformed` row
  *    downstream, never a crash ([[FileSources.readWarc]]'s declared
  *    contract, held by the gz path too). Because a false sync can
  *    ALSO parse as truncated (a garbage stored-block length swallows
  *    the rest of the file without a deflate error), a truncated
  *    candidate is held back and emitted only if the scan finds no
  *    later valid member in the split — a later valid member proves
  *    the file did not end there and supersedes the candidate.
  *
  * One record per member is the writer contract
  * ([[FileSources.writeWarcGz]]); the emitted value is the member's
  * decompressed text, which [[FileSources]]' shared header parse
  * consumes exactly like an uncompressed-container record.
  */
class GzipMemberInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(context: JobContext, filename: Path): Boolean = true
  override def createRecordReader(split: InputSplit,
                                  context: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new GzipMemberRecordReader
}

class GzipMemberRecordReader extends RecordReader[LongWritable, Text] {
  private var in: FSDataInputStream = _
  private var fileLen = 0L
  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var done = false
  private val key = new LongWritable(0)
  private val value = new Text()

  override def initialize(split: InputSplit, ctx: TaskAttemptContext): Unit = {
    val fsplit = split.asInstanceOf[FileSplit]
    val path = fsplit.getPath
    val fs = path.getFileSystem(ctx.getConfiguration)
    fileLen = fs.getFileStatus(path).getLen
    in = fs.open(path)
    start = fsplit.getStart
    end = start + fsplit.getLength
    pos = start
  }

  private sealed trait Parsed
  private case class Valid(bytes: Array[Byte], nextOff: Long) extends Parsed
  private case class Truncated(bytes: Array[Byte]) extends Parsed
  private case object Invalid extends Parsed

  /** Scan forward from `from` for the next `1f 8b 08` at an offset
    * < `end`; -1 when the split has no further candidate.
    */
  private def findMagic(from: Long): Long = {
    if (from >= end || from >= fileLen) return -1L
    in.seek(from)
    val buf = new Array[Byte](64 * 1024)
    var base = from
    // keep 2 bytes of overlap so a magic spanning chunk boundaries hits
    var carry = Array.emptyByteArray
    while (base < end) {
      val n = in.read(buf)
      if (n <= 0) return -1L
      val window = carry ++ buf.take(n)
      var i = 0
      val limit = window.length - 2
      while (i < limit) {
        if (window(i) == 0x1f.toByte && window(i + 1) == 0x8b.toByte &&
          window(i + 2) == 0x08.toByte) {
          val off = base - carry.length + i
          if (off >= from && off < end) return off
        }
        i += 1
      }
      base += n
      carry = window.takeRight(2)
    }
    -1L
  }

  /** Fully parse the gzip member at `offset`: RFC 1952 header (all
    * optional fields), raw-deflate body, trailer CRC32 + ISIZE check.
    */
  private def parseMember(offset: Long): Parsed = {
    in.seek(offset)
    val bis = new java.io.BufferedInputStream(in, 64 * 1024)
    var headerLen = 0
    def rb(): Int = { val b = bis.read(); if (b >= 0) headerLen += 1; b }
    if (rb() != 0x1f || rb() != 0x8b || rb() != 0x08) return Invalid
    val flg = rb()
    if (flg < 0 || (flg & 0xe0) != 0) return Invalid // reserved bits set
    var i = 0
    while (i < 6) { if (rb() < 0) return Invalid; i += 1 } // MTIME, XFL, OS
    if ((flg & 0x04) != 0) { // FEXTRA
      val lo = rb(); val hi = rb()
      if (lo < 0 || hi < 0) return Invalid
      var toSkip = lo | (hi << 8)
      while (toSkip > 0) { if (rb() < 0) return Invalid; toSkip -= 1 }
    }
    if ((flg & 0x08) != 0) { // FNAME, zero-terminated
      var b = rb(); while (b > 0) b = rb(); if (b < 0) return Invalid
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      var b = rb(); while (b > 0) b = rb(); if (b < 0) return Invalid
    }
    if ((flg & 0x02) != 0) { // FHCRC
      if (rb() < 0 || rb() < 0) return Invalid
    }
    val inf = new java.util.zip.Inflater(true)
    val crc = new java.util.zip.CRC32
    val inBuf = new Array[Byte](64 * 1024)
    val outBuf = new Array[Byte](128 * 1024)
    val outBytes = new java.io.ByteArrayOutputStream()
    try {
      var eof = false
      while (!inf.finished() && !eof) {
        if (inf.needsInput()) {
          val n = bis.read(inBuf)
          if (n < 0) eof = true else inf.setInput(inBuf, 0, n)
        }
        if (!eof && !inf.finished()) {
          val n =
            try inf.inflate(outBuf)
            catch { case _: java.util.zip.DataFormatException => return Invalid }
          if (n > 0) { outBytes.write(outBuf, 0, n); crc.update(outBuf, 0, n) }
        }
      }
      if (!inf.finished()) return Truncated(outBytes.toByteArray)
      val trailerOff = offset + headerLen + inf.getBytesRead
      if (trailerOff + 8 > fileLen) return Truncated(outBytes.toByteArray)
      in.seek(trailerOff)
      val tr = new Array[Byte](8)
      var got = 0
      while (got < 8) {
        val n = in.read(tr, got, 8 - got)
        if (n < 0) return Truncated(outBytes.toByteArray)
        got += n
      }
      def le32(o: Int): Long =
        (tr(o) & 0xffL) | ((tr(o + 1) & 0xffL) << 8) |
          ((tr(o + 2) & 0xffL) << 16) | ((tr(o + 3) & 0xffL) << 24)
      if (le32(0) == crc.getValue && le32(4) == (inf.getBytesWritten & 0xffffffffL))
        Valid(outBytes.toByteArray, trailerOff + 8)
      else Invalid
    } finally inf.end()
  }

  // First Truncated candidate seen while scanning this split, held
  // back until the scan proves no later valid member exists: Truncated
  // is genuine ONLY when the file really ends mid-member, but a false
  // sync whose garbage deflate runs to end-of-file without a
  // DataFormatException (a stored-block length can swallow arbitrary
  // trailing bytes) parses Truncated too. A later Valid member in the
  // same split refutes the candidate (the file did not end there) and
  // supersedes it; only a scan that exhausts the split emits it.
  private var heldTruncated: (Long, Array[Byte]) = null

  override def nextKeyValue(): Boolean = {
    if (done) return false
    var scanFrom = pos
    while (true) {
      val o = findMagic(scanFrom)
      if (o < 0) {
        done = true
        if (heldTruncated != null) {
          // end-of-file cut the member short: surface the partial
          // plaintext so the Content-Length gate quarantines it
          key.set(heldTruncated._1)
          value.set(heldTruncated._2)
          heldTruncated = null
          return true
        }
        return false
      }
      parseMember(o) match {
        case Valid(bytes, next) =>
          heldTruncated = null // refuted: a real member follows it
          key.set(o)
          value.set(bytes)
          pos = next
          return true
        case Truncated(bytes) =>
          if (heldTruncated == null) heldTruncated = (o, bytes)
          scanFrom = o + 3 // keep scanning: a later Valid refutes it
        case Invalid =>
          scanFrom = o + 3 // false sync inside compressed data
      }
    }
    false // unreachable
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
