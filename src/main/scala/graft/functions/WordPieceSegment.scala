package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_pieces(tokens)` — greedy longest-match-first ("maximal
  * munch") WordPiece segmentation of every token under a FIXED
  * vocabulary (the BERT tokenizer's decoding step: Schuster & Nakajima
  * 2012's inference rule as published with BERT), as one expression
  * with the vocabulary riding as a codegen reference object (the
  * [[BpeSegment]]/[[UnigramSegment]] discipline: no join, no shuffle,
  * no interpreted lambda in the hot path).
  *
  * The DECLARED decode rule (engine-portable; the x126 oracle replays
  * it by exhaustive path enumeration + the lexicographically-maximal
  * length-sequence characterization of greedy, PropertySpec fuzzes the
  * loop against a plain-JVM brute force):
  *  - at position 0 the piece is the longest vocabulary entry NOT
  *    prefixed `##` that prefixes the word (enforced even when the
  *    word's raw text itself starts "##" — position type, not string
  *    shape, decides admissibility); at every later position it
  *    is the longest `##`-prefixed entry whose content matches;
  *  - if NO entry matches at some position, the WHOLE word becomes one
  *    `[UNK]` sentinel (BERT's rule — no backtracking, no partial
  *    emission). Greedy never dead-ends when every single character of
  *    the word is in the vocabulary, so on in-alphabet text the greedy
  *    path equals the lexicographically-maximal complete path the
  *    oracle selects; a word with any out-of-alphabet character has NO
  *    complete path on either side — the two formulations agree
  *    exactly.
  *
  * Like [[UnigramSegment]], matching is over UTF-16 code units — the
  * shipped [a-z0-9] word view is ASCII, so the precondition holds by
  * construction (enforced on the vocabulary at Column construction).
  */
case class WordPieceSegment(child: Expression, vocab: Array[String],
                            maxPieceLen: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    WordPieceSegment.compute(input.asInstanceOf[ArrayData], vocab,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vocab", vocab, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceSegment.compute($c, $vRef, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceSegment =
    copy(child = newChild)
  override def prettyName: String = "wordpiece_pieces"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object WordPieceSegment {

  /** The declared whole-word unknown sentinel: cannot collide with a
    * real piece (corpus pieces are `[a-z0-9#]`).
    */
  val Unk = "[UNK]"

  /** Called from generated code — must stay public+static. Pieces of
    * every non-null token, in token order then piece order.
    */
  def compute(tokens: ArrayData, vocab: Array[String],
              maxPieceLen: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val segs = greedy(tokens.getUTF8String(t).toString, vocab,
          maxPieceLen)
        var i = 0
        while (i < segs.length) {
          out += UTF8String.fromString(segs(i)); i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** The greedy loop itself, exposed for the plain-JVM property fuzz.
    * `vocab` must be sorted ascending (binary search).
    */
  def greedy(w: String, vocab: Array[String],
             maxPieceLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      var l = math.min(maxPieceLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        // pos-0 pieces must be WORD-INITIAL vocabulary entries: a word
        // whose raw text starts "##" (reachable via the byte-level
        // word view on '#'-bearing corpora) must not match a
        // ##-continuation entry here — the oracle's
        // NOT starts_with(token, '##') condition, mirrored exactly
        if ((pos > 0 || !cand.startsWith("##")) &&
          java.util.Arrays.binarySearch(
            vocab.asInstanceOf[Array[AnyRef]], cand) >= 0) hit = cand
        else l -= 1
      }
      if (hit == null) return Array(Unk) // whole-word UNK, no backtrack
      out += hit
      pos += l
    }
    out.toArray
  }

  /** Column API: greedy WordPiece pieces of `tokens` under a vocabulary
    * sorted ascending; `maxPieceLen` bounds the munch by CONTENT length
    * (the `##` prefix does not count).
    */
  def wordpiece_pieces(tokens: Column, vocab: Array[String],
                       maxPieceLen: Int): Column = {
    require(vocab.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "vocab must be strictly sorted ascending")
    require(vocab.forall(p => !p.exists(Character.isSurrogate)),
      "wordpiece_pieces matches UTF-16 code units: vocabulary (and " +
        "tokens) must be BMP-only — feed an ASCII word view")
    GraftColumns.column(WordPieceSegment(GraftColumns.expression(tokens),
      vocab, maxPieceLen))
  }
}
