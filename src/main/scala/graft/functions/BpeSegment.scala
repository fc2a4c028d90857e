package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `bpe_subwords(tokens)` — the whole BPE APPLICATION as one codegen'd
  * expression: total subword count of a token array under an ordered
  * merge list, each word segmented by k greedy left-to-right merge
  * passes in plain JVM loops.
  *
  * Exists for the same reason as [[NbScoreVec]]: the built-ins
  * formulation (`transform(toks, w -> fold1(fold2(...chars(w))))`)
  * nests k interpreted higher-order `aggregate` lambdas per word, each
  * allocating a fresh accumulator array per symbol — x80's first bench
  * wall was 10.7 s at sf0.1, ALL of it lambda dispatch + array churn.
  * Here each word is segmented with two small JVM arrays and the merge
  * rules ride as codegen reference objects; the built-ins fold remains
  * the spec equality oracle ([[graft.ext.TextStats.bpeSegmentCountBuiltins]]).
  *
  * Merge semantics are EXACTLY [[graft.ext.TextStats.bpeMergeStep]]'s:
  * per merge (a, b), scan left-to-right, non-overlapping — "aaaa" +
  * (a,a) → [aa, aa]. Null token elements are skipped defensively.
  */
case class BpeSegment(child: Expression, lefts: Array[String],
                      rights: Array[String])
  extends UnaryExpression with ImplicitCastInputTypes {

  require(lefts.length == rights.length,
    s"merge list mismatch: ${lefts.length} lefts vs ${rights.length} rights")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    BpeSegment.compute(input.asInstanceOf[ArrayData], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeSegment.compute($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
  override def prettyName: String = "bpe_subwords"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object BpeSegment {

  /** Called from generated code — must stay public+static. */
  def compute(tokens: ArrayData, lefts: Array[String],
              rights: Array[String]): Long = {
    var total = 0L
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t))
        total += segmentOne(tokens.getUTF8String(t).toString, lefts, rights)
      t += 1
    }
    total
  }

  /** Number of symbols one word segments into under the ordered merge
    * list: start from characters, apply each merge greedy-L2R
    * non-overlapping in place.
    */
  def segmentOne(w: String, lefts: Array[String],
                 rights: Array[String]): Int =
    segmentSyms(w, lefts, rights).length

  /** The k-pass segmentation ITSELF (one pass per merge, in merge
    * order) — [[segmentOne]]'s symbols, exposed so the rank-based
    * segmenter ([[BpeEncode]]) can be equality-fuzzed against this
    * form (the two are provably equal under rank-topologically-
    * consistent merge lists, i.e. any list [[graft.ext.TextStats.bpeTrain]]
    * produces — a merge consuming a composite symbol always ranks
    * after the merges that build it).
    */
  def segmentSyms(w: String, lefts: Array[String],
                  rights: Array[String]): Array[String] = {
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = w.length
    var m = 0
    while (m < lefts.length && len > 1) {
      val a = lefts(m); val b = rights(m)
      val out = new Array[String](len)
      var o = 0
      var j = 0
      while (j < len) {
        if (j + 1 < len && syms(j) == a && syms(j + 1) == b) {
          out(o) = a + b; o += 1; j += 2
        } else { out(o) = syms(j); o += 1; j += 1 }
      }
      syms = out; len = o; m += 1
    }
    if (len == syms.length) syms else java.util.Arrays.copyOf(syms, len)
  }

  /** Column API: total subword count of `tokens` under `merges`
    * (ordered (left, right) rules as codegen reference objects).
    */
  def bpe_subwords(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftColumns.column(BpeSegment(GraftColumns.expression(tokens),
      merges.map(_._1).toArray, merges.map(_._2).toArray))
}
