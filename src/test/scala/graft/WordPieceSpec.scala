package graft

import org.apache.spark.sql.functions._
import graft.ext.TextStats
import graft.functions.WordPieceSegment

/** Crafted cases for the X5f-e WordPiece trainer + greedy encoder:
  * hand-computed likelihood-gain merges on a corpus small enough to
  * verify on paper, and the BERT whole-word-[UNK] rule on words built
  * to hit each branch of the maximal munch.
  */
class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  test("trainer picks the likelihood-gain argmax and stops when below minCount") {
    // words: "ab" x3, "cd" x1 -> symbols a/##b (mass 3), c/##d (mass 1)
    // pairs: (a,##b) count 3 (eligible), (c,##d) count 1 (< minCount)
    val docs = Seq("ab ab ab cd").toDF("text")
    val merges = TextStats.wordPieceTrain(docs, "text", numMerges = 5)
    assert(merges.length == 1)
    val (l, r, c, score) = merges(0)
    assert((l, r, c) == (("a", "##b", 3L)))
    // score = round(ln 3 - ln 3 - ln 3, 6) = -ln 3
    assert(math.abs(score - BigDecimal(-math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
  }

  test("likelihood gain beats raw count: frequent-symbol pairs are penalized") {
    // "xy" x4 -> (x,##y) count 4 but both symbols carry mass 4+2=no...
    // corpus: "xy" x4, "xz" x4, "pq" x3:
    //   (x,##y) c=4, cl=c(x)=8, cr=4 -> ln4 - ln8 - ln4 = -ln8
    //   (p,##q) c=3, cl=3,      cr=3 -> ln3 - ln3 - ln3 = -ln3 > -ln8
    // BPE would merge (x,##y) first (count 4 > 3); WordPiece must pick (p,##q)
    val docs = Seq(("xy xz " * 4) + ("pq " * 3)).toDF("text")
    val merges = TextStats.wordPieceTrain(docs, "text", numMerges = 1)
    assert(merges.head._1 == "p" && merges.head._2 == "##q")
  }

  test("vocab order: initial chars, ##chars, then merge outputs deduped") {
    val docs = Seq("ab ab ab cd").toDF("text")
    val merges = TextStats.wordPieceTrain(docs, "text", numMerges = 5)
    val vocab = TextStats.wordPieceVocab(docs, "text", merges.toSeq)
    assert(vocab == Seq("a", "b", "c", "d", "##a", "##b", "##c", "##d", "ab"))
  }

  test("greedy maximal munch with ## continuations; whole-word UNK on any dead end") {
    val vocab = Array("a", "ab", "b", "c", "d", "##a", "##b", "##c", "##d")
      .sorted
    def enc(w: String) = WordPieceSegment.greedy(w, vocab, 2).toSeq
    assert(enc("ab") == Seq("ab"))
    assert(enc("abc") == Seq("ab", "##c"))   // longest first, then continue
    assert(enc("cd") == Seq("c", "##d"))
    assert(enc("axb") == Seq(WordPieceSegment.Unk)) // ##x missing: WHOLE word
    assert(enc("xab") == Seq(WordPieceSegment.Unk)) // initial x missing
    assert(enc("") == Seq.empty)
  }

  test("a word whose raw text starts '##' never takes a continuation entry at pos 0") {
    // reachable via the byte-level word view on '#'-bearing corpora:
    // the candidate at pos 0 is the raw substring, which can EQUAL a
    // ##-continuation vocab string — position type must win (the
    // oracle's NOT starts_with(token, '##') pos-0 condition)
    val vocab = Array("#", "a", "##", "##a", "###", "##b").sorted
    def enc(w: String) = WordPieceSegment.greedy(w, vocab, 2).toSeq
    // "##a": pos 0 may NOT match "##a" (continuation form) nor "##";
    // it must take word-initial "#", then continuations "###", "##a"
    assert(enc("##a") == Seq("#", "###", "##a"))
    // "##b": same prefix path; "b" exists only as continuation "##b"
    assert(enc("##b") == Seq("#", "###", "##b"))
    // word-initial "#" still matches normally
    assert(enc("#a") == Seq("#", "##a"))
  }

  test("byte-level vocabulary makes encoding total: arbitrary unicode, zero unk") {
    // ASCII-only training corpus; encode text with 2/3/4-byte UTF-8 —
    // both forms of all 256 base symbols are in the vocabulary, so the
    // whole-word [UNK] branch must be dead
    val docs = Seq("ab ab ab cd").toDF("text")
    val merges = TextStats.wordPieceTrain(docs, "text", numMerges = 5,
      wordsCol = Some(TextStats.byteWords(col("text"))))
    val vocab = TextStats.wordPieceVocabBytes(merges.toSeq)
    val unk = vocab.length.toLong
    // unicode via escapes (the byteMarker discipline: no
    // source-encoding step can mangle it): 2/3/4-byte UTF-8 + a
    // control char
    val out = Seq("d\u00e9j\u00e0 \u4e16\u754c \uD83D\uDE80 ab \u0007ctrl")
      .toDF("text")
      .select(TextStats.wordPieceEncodeIds(col("text"), vocab,
        wordsCol = Some(TextStats.byteWords(col("text")))).as("ids"))
      .select(size(col("ids")), size(filter(col("ids"), x => x === lit(unk))))
      .head()
    assert(out.getInt(0) > 0)
    assert(out.getInt(1) == 0, "byte-level WordPiece must emit zero unk ids")
  }

  test("encodeIds: [UNK] maps to the reserved id vocab.length") {
    val docs = Seq("ab ab ab cd").toDF("text")
    val merges = TextStats.wordPieceTrain(docs, "text", numMerges = 5)
    val vocab = TextStats.wordPieceVocab(docs, "text", merges.toSeq)
    val out = Seq("ab abc cd zq").toDF("text")
      .select(TextStats.wordPieceEncodeIds(col("text"), vocab).as("ids"))
      .head().getSeq[Long](0)
    val id = vocab.zipWithIndex.toMap
    assert(out == Seq(id("ab"), id("ab"), id("##c"), id("c"), id("##d"),
      vocab.length).map(_.toLong))
  }
}
