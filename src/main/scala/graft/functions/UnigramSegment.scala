package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_pieces(tokens)` — Viterbi segmentation of every token under
  * a FIXED unigram-LM piece table (Kudo 2018's decoding step), as one
  * expression with the model riding as codegen reference objects (the
  * [[BpeSegment]]/[[RefLmScore]] discipline: no join, no shuffle, no
  * interpreted lambda in the hot path).
  *
  * The DECLARED decode rule (engine-portable; the x117/x118 oracles
  * replay it by exhaustive path enumeration, PropertySpec fuzzes this
  * DP against a plain-JVM brute force):
  *  - candidate pieces are substrings present in the model table, plus
  *    every single character as a virtual piece with the count-0
  *    smoothed cost (totality: any word segments, unseen characters
  *    pay the maximal declared cost);
  *  - best segmentation minimizes (total cost, piece count, piece path
  *    lexicographically) — the two tie layers make the argmin exact
  *    and engine-portable; costs are the 6dp-ROUNDED per-piece values
  *    (rounding happens at model build, so both engines sum identical
  *    doubles left-to-right and the tuple compare never hinges on a
  *    last-ulp ln difference).
  *
  * The layered objective is DP-decomposable: cost and piece count are
  * additive, and two partial paths reaching the same position with
  * equal piece count have equal path-string length, so neither is a
  * proper prefix of the other and concatenation preserves their order.
  */
case class UnigramSegment(child: Expression, pieces: Array[String],
                          costs: Array[Double], unkCost: Double,
                          maxPieceLen: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(pieces.length == costs.length,
    s"model mismatch: ${pieces.length} pieces vs ${costs.length} costs")
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegment.compute(input.asInstanceOf[ArrayData], pieces, costs,
      unkCost, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("pieces", pieces, "java.lang.String[]")
    val cRef = ctx.addReferenceObj("costs", costs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegment.compute($c, $pRef, $cRef, " +
        s"${unkCost}D, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
  override def prettyName: String = "unigram_pieces"

  override lazy val canonicalized: Expression =
    copy(child = child.canonicalized)
}

object UnigramSegment {

  /** Called from generated code — must stay public+static. Pieces of
    * every non-null token, in token order then piece order.
    */
  def compute(tokens: ArrayData, pieces: Array[String],
              costs: Array[Double], unkCost: Double,
              maxPieceLen: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val segs = viterbi(tokens.getUTF8String(t).toString, pieces, costs,
          unkCost, maxPieceLen)
        var i = 0
        while (i < segs.length) {
          out += UTF8String.fromString(segs(i)); i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** The DP itself, exposed for the plain-JVM property fuzz. */
  def viterbi(w: String, pieces: Array[String], costs: Array[Double],
              unkCost: Double, maxPieceLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    // best tuple per end position: (cost, npieces, path); path pieces
    // joined by the \u0001 separator for the declared lexicographic tie layer
    val bCost = new Array[Double](n + 1)
    val bNp = new Array[Int](n + 1)
    val bPath = new Array[String](n + 1)
    bPath(0) = ""
    var j = 1
    while (j <= n) {
      var haveBest = false
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        val i = j - l
        if (bPath(i) != null) {
          val sub = w.substring(i, j)
          val k = java.util.Arrays.binarySearch(
            pieces.asInstanceOf[Array[AnyRef]], sub)
          val c =
            if (k >= 0) costs(k)
            else if (l == 1) unkCost // virtual single-char piece
            else Double.NaN
          if (!java.lang.Double.isNaN(c)) {
            val cost = bCost(i) + c
            val np = bNp(i) + 1
            val path = if (i == 0) sub else bPath(i) + "\u0001" + sub
            val better = !haveBest ||
              cost < bCost(j) ||
              (cost == bCost(j) && (np < bNp(j) ||
                (np == bNp(j) && path.compareTo(bPath(j)) < 0)))
            if (better) {
              bCost(j) = cost; bNp(j) = np; bPath(j) = path; haveBest = true
            }
          }
        }
        l += 1
      }
      if (!haveBest) bPath(j) = null
      j += 1
    }
    bPath(n).split('\u0001')
  }

  /** Column API: Viterbi pieces of `tokens` under the (sorted-piece,
    * cost) model; `pieces` MUST arrive sorted ascending (binary search).
    *
    * PRECONDITION (r16, per the r15 advice): the DP segments UTF-16
    * CODE UNITS (`substring`/`length`), so tokens must be BMP-only — an
    * astral-plane character would split across its surrogate pair into
    * invalid half-surrogate pieces. Both shipped token views satisfy
    * this by construction ([a-z0-9] tokens are ASCII; byte-mapped
    * tokens use BMP chars ≤ U+0143), and the model side is enforced
    * here: a piece containing a surrogate cannot have been seeded from
    * a conforming view.
    */
  def unigram_pieces(tokens: Column, pieces: Array[String],
                     costs: Array[Double], unkCost: Double,
                     maxPieceLen: Int): Column = {
    require(pieces.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "pieces must be strictly sorted ascending")
    require(pieces.forall(p => !p.exists(Character.isSurrogate)),
      "unigram_pieces segments UTF-16 code units: pieces (and tokens) " +
        "must be BMP-only — feed an ASCII or byte-mapped word view")
    GraftColumns.column(UnigramSegment(GraftColumns.expression(tokens),
      pieces, costs, unkCost, maxPieceLen))
  }
}
