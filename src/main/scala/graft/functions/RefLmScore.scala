package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ref_lm_score(text, lang)` — the X5k reference-LM mean bigram
  * log-probability ([[graft.ext.TextStats.refLmAvgLogProb]] semantics)
  * as ONE native codegen'd expression.
  *
  * Exists because the built-ins form (an `aggregate` fold whose lambda
  * does two `conv(substring(md5(g),1,8),16,10)` probes per position)
  * runs the lambda INTERPRETED — higher-order functions don't
  * participate in whole-stage codegen — and pays hex-string allocation
  * + base-16 parsing per bigram (measured 42.8 cpu-sec to score sf0.1;
  * this expression: the same corpus in ~4). One pass per document:
  * tokenize once ([[WordShingles.tokenize]], the oracle's
  * `string_split_regex(lower(text), '[^a-z0-9]+')` with empties
  * dropped), per bigram take MD5's first 4 bytes as the unsigned
  * bucket (== the SQL `('0x' || substr(md5(g), 1, 8))::bigint`) and
  * binary-search the model tables ([[BucketLookup.compute]]).
  *
  * Bit-identical to the declared SQL replay: same bytes into MD5, same
  * unsigned-mod bucket, same add-one smoothing `ln((cb+1)/(cu+nb))`,
  * same sequential left-to-right summation order as the fold it
  * replaces, same unseen-lang degrade (index -1 → negative keys → both
  * lookups default 0 → ln(1/nb) per bigram). Sub-2-token documents
  * return NaN (no mean exists — callers filter, with `isnan` or a
  * token-count predicate, the x38 convention); null text or lang
  * returns null (callers coalesce/filter, same convention).
  */
case class RefLmScore(left: Expression, right: Expression,
                      table: RefLmScore.Table)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override protected def nullSafeEval(text: Any, lang: Any): Any =
    RefLmScore.compute(text.asInstanceOf[UTF8String],
      lang.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the model rides as ONE reference object (the PqReconstruct
    // lesson — never inline tables into generated source)
    val tRef = ctx.addReferenceObj("reflm", table,
      classOf[RefLmScore.Table].getName)
    defineCodeGen(ctx, ev, (t, l) =>
      s"graft.functions.RefLmScore.compute($t, $l, $tRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RefLmScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ref_lm_score"
}

object RefLmScore {

  /** The trained model as flat sorted arrays (binary-search form of
    * [[graft.ext.TextStats.RefLm]]'s maps) + the language index.
    */
  class Table(val langs: Array[String],
              val cbKeys: Array[Long], val cbVals: Array[Double],
              val cuKeys: Array[Long], val cuVals: Array[Double],
              val numBuckets: Int) extends Serializable {
    @transient private lazy val langIdx: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](langs.length * 2)
      var i = 0
      while (i < langs.length) { m.put(langs(i), i); i += 1 }
      m
    }
    def idxOf(lang: String): Int = {
      val v = langIdx.get(lang)
      if (v == null) -1 else v.intValue()
    }
  }

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 MD5 bytes as an unsigned 32-bit value, mod numBuckets —
    * exactly `('0x' || substr(md5(s), 1, 8))::bigint % nb`.
    */
  private def bucket(md: java.security.MessageDigest, s: String,
                     nb: Int): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u % nb
  }

  /** Called from generated code — must stay public+static. */
  def compute(text: UTF8String, lang: UTF8String, t: Table): Double = {
    val toks = WordShingles.tokenize(text)
    val nb = t.numBuckets
    // uniform sub-2-token sentinel: the fold's 1-token case was 0/0=NaN
    // but its 0-token case was 0/-1=-0.0 — return NaN for both so
    // "no mean exists" is one value callers can test with isnan
    if (toks.length < 2) return Double.NaN
    val off = t.idxOf(lang.toString).toLong * nb
    val md = mdLocal.get()
    var sum = 0.0
    var i = 0
    while (i + 1 < toks.length) {
      val w1 = toks(i)
      val cb = BucketLookup.compute(off + bucket(md, w1 + " " + toks(i + 1), nb),
        t.cbKeys, t.cbVals, 0.0)
      val cu = BucketLookup.compute(off + bucket(md, w1, nb),
        t.cuKeys, t.cuVals, 0.0)
      sum += java.lang.Math.log((cb + 1.0) / (cu + nb))
      i += 1
    }
    sum / (toks.length - 1)
  }

  /** Column API. */
  def ref_lm_score(text: Column, lang: Column, table: Table): Column =
    GraftColumns.column(RefLmScore(GraftColumns.expression(text),
      GraftColumns.expression(lang), table))
}
