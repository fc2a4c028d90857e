package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X5/X6: text analysis for training-data pipelines (SURVEY §2.9) —
  * token counting, quality scoring, language ID, fingerprinting.
  * Everything is a codegen'd Column expression: map-only at any scale.
  */
object TextStats {

  /** Whitespace-ish token count (empty tokens excluded, engine-agnostic). */
  def tokenCount(text: Column): Column = size(Dedup.tokens(text))

  /** BPE-ish subword count heuristic: word chunks + digit runs +
    * punctuation marks each count as a token.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9.,;:!?']+"), t => t =!= "")) +
      length(regexp_replace(text, "[^.,;:!?]", ""))

  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(length(text), lit(1)), 6)

  def upperRatio(text: Column): Column =
    round(length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
      greatest(length(text), lit(1)), 6)

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this")

  /** Fraction of tokens that are (English) stopwords — a standard
    * quality-filter feature (Gopher/C4-style heuristics).
    */
  def stopwordRatio(text: Column): Column = {
    val toks = Dedup.tokens(text)
    round(size(array_intersect_keepdup(toks)).cast("double") /
      greatest(size(toks), lit(1)), 6)
  }

  // stopword membership with duplicates preserved (array_intersect dedups)
  private def array_intersect_keepdup(toks: Column): Column =
    filter(toks, t => t.isin(englishStopwords: _*))

  /** Composite quality score in [0,1]: length band + stopword presence -
    * punctuation excess. Deterministic, SQL-expressible.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val lenScore = when(len.between(100, 20000), 0.5d)
      .when(len.between(20, 99), 0.25d).otherwise(0.0d)
    val stopScore = when(stopwordRatio(text) >= 0.05, 0.3d).otherwise(0.0d)
    val punctPenalty = when(punctRatio(text) > 0.1, 0.2d).otherwise(0.0d)
    round(lenScore + stopScore + lit(0.2d) - punctPenalty, 6)
  }

  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "para", "con", "una"))

  /** Heuristic language ID: CJK codepoint presence, else the language
    * whose stopword marker set scores highest on the token list
    * (ties -> lexicographic, 'und' = undetermined when nothing matches).
    */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** X6: 256-bit content fingerprint (hex). */
  def fingerprint(text: Column): Column = sha2(text, 256)

  /** Rolling-hash document fingerprint: xxhash64 over the sorted distinct
    * 3-shingle set — stable under shingle order.
    */
  def shingleFingerprint(text: Column, k: Int = 3): Column =
    xxhash64(concat_ws("|", array_sort(Dedup.shingles(text, k))))
}
