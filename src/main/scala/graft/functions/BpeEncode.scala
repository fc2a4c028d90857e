package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `bpe_encode(tokens)` — the full BPE tokenizer APPLICATION surface
  * (X5f, r11): each word of a token array segments into subwords and
  * each subword maps to its vocabulary id; the output is the
  * concatenated `array<long>` of token ids — what a training-data
  * export actually ships (x80's [[BpeSegment]] stops at subword
  * COUNTS).
  *
  * Segmentation is RANK-BASED (the shape every production BPE encoder
  * uses): repeatedly find the adjacent pair with the LOWEST merge rank
  * present in the word and apply that one merge greedy-left-to-right,
  * until no ranked pair remains. Per word this is O(len · applied
  * merges) — independent of the vocabulary size k, where the k-pass
  * form ([[BpeSegment]], kept as the equality oracle) scans all k
  * merges per word: the right shape at a real 30k-merge vocabulary.
  * The two are EQUAL under any rank-topologically-consistent merge
  * list — which [[graft.ext.TextStats.bpeTrain]] guarantees, since a
  * merge consuming a composite symbol can only be counted after the
  * merges that build it (PropertySpec fuzzes the equivalence on
  * trained lists).
  *
  * The merge-rank and vocab-id hash tables ride as ONE codegen
  * reference object ([[BpeEncode.Table]], rebuilt transiently per
  * executor) — no join, no shuffle, streams unchanged.
  *
  * OUT-OF-VOCABULARY policy (r12): a segmented symbol absent from the
  * vocabulary encodes as `unkId`. Segmentation only ever produces
  * base characters or merge outputs, and every merge output is in the
  * vocabulary by construction — so an unknown symbol is always a
  * GENUINELY NOVEL CHARACTER the training corpus never contained (the
  * character-level fallback is total for in-alphabet text, the
  * byte-level-BPE guarantee restated over the [a-z0-9] token
  * alphabet). The declared reservation is `unkId = vocab.length` (the
  * first id past the trained space — what x86 passes); the legacy
  * default -1 marks self-corpus encodes where unk cannot occur.
  */
case class BpeEncode(child: Expression, lefts: Array[String],
                     rights: Array[String], vocab: Array[String],
                     unkId: Long = -1L)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(lefts.length == rights.length,
    s"merge list mismatch: ${lefts.length} lefts vs ${rights.length} rights")

  @transient private lazy val table =
    new BpeEncode.Table(lefts, rights, vocab, unkId)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("table", table, "graft.functions.BpeEncode.Table")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncode.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object BpeEncode {

  // symbols are [a-z0-9]+ concatenations, so a space separator in
  // the pair key never collides
  private final val Sep = ' '

  /** The prepared merge-rank + vocab-id lookup — serialized with the
    * raw arrays, hash maps rebuilt transiently on each executor.
    * Duplicate merge pairs / vocab tokens keep their FIRST occurrence
    * (lowest rank / lowest id) — the declared tie policy, mirrored by
    * the oracle's min-position dedup.
    */
  final class Table(val lefts: Array[String], val rights: Array[String],
                    val vocab: Array[String], val unkId: Long = -1L)
      extends Serializable {
    // PRECONDITION (checked loudly): merge OUTPUT strings must be
    // distinct. The rank-based segmenter re-applies a merge whenever
    // its pair reappears; if two merges produced the same composite
    // string (e.g. ("ab","c") and ("a","bc") -> "abc"), the later
    // producer could recreate a lower-rank pair's operand and the
    // rank-based and k-pass ([[BpeSegment]]) segmentations would
    // silently diverge. [[graft.ext.TextStats.bpeTrain]]'s lists
    // satisfy this on the fixtures (PropertySpec fuzz); any list that
    // does not must fail here, not drift.
    locally {
      val seen = new java.util.HashSet[String](lefts.length * 2)
      var i = 0
      while (i < lefts.length) {
        require(seen.add(lefts(i) + rights(i)),
          s"duplicate merge output '${lefts(i)}${rights(i)}' at rank $i: " +
            "rank-based BPE segmentation requires distinct merge outputs")
        i += 1
      }
    }
    @transient lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](lefts.length * 2)
      var i = 0
      while (i < lefts.length) {
        m.putIfAbsent(lefts(i) + Sep + rights(i), Integer.valueOf(i))
        i += 1
      }
      m
    }
    @transient lazy val ids: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
      var i = 0
      while (i < vocab.length) {
        m.putIfAbsent(vocab(i), java.lang.Long.valueOf(i.toLong))
        i += 1
      }
      m
    }

    // content-based equality so canonicalized plans dedupe correctly
    override def equals(o: Any): Boolean = o match {
      case t: Table => unkId == t.unkId && java.util.Arrays.equals(
          lefts.asInstanceOf[Array[AnyRef]], t.lefts.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(
          rights.asInstanceOf[Array[AnyRef]], t.rights.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(
          vocab.asInstanceOf[Array[AnyRef]], t.vocab.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int =
      31 * (31 * (31 * java.util.Arrays.hashCode(lefts.asInstanceOf[Array[AnyRef]]) +
        java.util.Arrays.hashCode(rights.asInstanceOf[Array[AnyRef]])) +
        java.util.Arrays.hashCode(vocab.asInstanceOf[Array[AnyRef]])) +
        java.lang.Long.hashCode(unkId)
  }

  /** Called from generated code — must stay public+static. */
  def compute(tokens: ArrayData, t: Table): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](tokens.numElements() * 2)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val syms = segmentWord(tokens.getUTF8String(i).toString, t)
        var j = 0
        while (j < syms.length) {
          val id = t.ids.get(syms(j))
          out += (if (id == null) t.unkId else id.longValue())
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Rank-based segmentation of one word: lowest-rank adjacent pair
    * first, each application greedy-L2R non-overlapping (exactly one
    * pair is the argmin, so the per-pass semantics match
    * [[BpeSegment]]'s merge pass).
    */
  def segmentWord(w: String, t: Table): Array[String] = {
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = w.length
    var continue = len > 1
    while (continue) {
      // argmin rank over adjacent pairs
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < len - 1) {
        val r = t.rank.get(syms(j) + Sep + syms(j + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = j }
        j += 1
      }
      if (bi < 0) continue = false
      else {
        val a = syms(bi); val b = syms(bi + 1)
        val out = new Array[String](len)
        var o = 0
        var k = 0
        while (k < len) {
          if (k + 1 < len && syms(k) == a && syms(k + 1) == b) {
            out(o) = a + b; o += 1; k += 2
          } else { out(o) = syms(k); o += 1; k += 1 }
        }
        syms = out; len = o
        continue = len > 1
      }
    }
    if (len == syms.length) syms else java.util.Arrays.copyOf(syms, len)
  }

  /** Column API: token ids of `tokens` under ordered `merges` and the
    * rank-ordered `vocab` (id = position).
    */
  def bpe_encode(tokens: Column, merges: Seq[(String, String)],
                 vocab: Seq[String], unkId: Long = -1L): Column =
    GraftColumns.column(BpeEncode(GraftColumns.expression(tokens),
      merges.map(_._1).toArray, merges.map(_._2).toArray, vocab.toArray,
      unkId))
}
