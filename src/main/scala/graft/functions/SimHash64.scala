package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(text)` — the 64-bit SimHash fingerprint (per-bit majority
  * vote over xxhash64 token hashes) as ONE native expression.
  *
  * The built-ins formulation ([[graft.ext.Dedup.simhashBuiltins]]) builds
  * 64 per-bit vote expressions, each containing the
  * `transform(tokens(text), xxhash64)` subtree — and lambda functions
  * block Catalyst's subexpression elimination, so every row tokenizes
  * and hashes 64 TIMES (measured: ~7s to fingerprint 5k docs at sf0.1).
  * This expression tokenizes and hashes once and tallies all 64 bit
  * counters in that single pass (~0.2s for the same frame).
  *
  * Bit-identical to the built-ins form (ExtSpec equivalence test):
  * same tokenization ([[WordShingles.tokenize]] == the oracle's
  * `string_split_regex(lower(text), '[^a-z0-9]+')` with empties
  * dropped), same hash (Spark's `xxhash64` with its default seed 42),
  * same strict-majority vote (`ones * 2 > n`), zero fingerprint for a
  * tokenless document.
  */
case class SimHash64(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Called from generated code — must stay public+static. */
  def compute(text: UTF8String): Long = {
    val toks = WordShingles.tokenize(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      // the exact hash functions.xxhash64 computes (default seed 42)
      val h = XxHash64Function.hash(
        UTF8String.fromString(toks(i)), StringType, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val n = toks.length
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) res |= 1L << b
      b += 1
    }
    res
  }

  /** Column API. */
  def simhash64(text: Column): Column =
    GraftColumns.column(SimHash64(GraftColumns.expression(text)))
}
