package graft

import org.apache.spark.sql.functions._
import graft.ext.Extract

/** Crafted cases for the X26 HTML → clean-text extractor: each test
  * pins one stage of the declared pipeline (noise strip, block
  * segmentation, entity decode order, and both legs of the keep rule)
  * on inputs built to decide exactly that stage.
  */
class ExtractSpec extends SparkSuite {
  import spark.implicits._

  private def extract(html: String): (Long, Long, String) = {
    val r = Seq(html).toDF("html")
      .withColumn("_bf", Extract.blockFeatures(col("html")))
      .select(Extract.blockCountOf(col("_bf")).cast("long"),
        Extract.keptCountOf(col("_bf")).cast("long"),
        Extract.textOf(col("_bf")))
      .head()
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  test("body prose survives, nested inline tags stripped") {
    val (_, kept, txt) = extract(
      "<div><p>seven <b>bold</b> words of <i>body</i> text here</p></div>")
    assert(kept == 1L)
    assert(txt == "seven bold words of body text here")
  }

  test("script and style vanish wholesale, a literal < inside script cannot leak") {
    val (_, kept, txt) = extract(
      "<script>if (a<2) { emit('<p>fake para with many words inside</p>'); }</script>" +
        "<style>p { color: red; }</style>" +
        "<p>the one real paragraph with enough words kept</p>")
    assert(kept == 1L)
    assert(txt == "the one real paragraph with enough words kept")
  }

  test("comments stripped even when they contain block tags") {
    val (_, kept, txt) = extract(
      "<!-- <p>commented out paragraph with plenty of words</p> -->" +
        "<p>real paragraph body with seven plain words</p>")
    assert(kept == 1L)
    assert(txt == "real paragraph body with seven plain words")
  }

  test("entity decode order: double-escaped entities survive literally") {
    val (_, kept, txt) = extract(
      "<p>q&amp;a &lt;tag&gt; &#39;x&#39; &quot;y&quot; &amp;lt; and more words here</p>")
    assert(kept == 1L)
    // &amp;lt; -> &lt; (literal), NOT <
    assert(txt == "q&a <tag> 'x' \"y\" &lt; and more words here")
  }

  test("keep rule leg 1: short blocks drop (nav, title, headings)") {
    val (blocks, kept, txt) = extract(
      "<title>Short Title</title><h1>tiny heading</h1>" +
        "<p>this paragraph has the six tokens needed</p>")
    assert(blocks == 3L)
    assert(kept == 1L)
    assert(txt == "this paragraph has the six tokens needed")
  }

  test("keep rule leg 2: link farms drop even with enough tokens") {
    val (_, kept, _) = extract(
      "<p><a href=\"/a\">one two three four five six seven</a> ok</p>")
    assert(kept == 0L)
  }

  test("low anchor share keeps: prose with one inline link") {
    val (_, kept, txt) = extract(
      "<p>a long paragraph of prose that happens to mention " +
        "<a href=\"/x\">a link</a> in passing among many words</p>")
    assert(kept == 1L)
    assert(txt.contains("a link in passing"))
  }

  test("multi-block documents keep order; empty html yields empty text") {
    val (_, kept, txt) = extract(
      "<p>first body paragraph with seven plain words</p>" +
        "<nav><a href=\"/h\">Home</a> <a href=\"/a\">About</a></nav>" +
        "<p>second body paragraph with seven plain words</p>")
    assert(kept == 2L)
    assert(txt == "first body paragraph with seven plain words\n" +
      "second body paragraph with seven plain words")
    val (b0, k0, t0) = extract("")
    assert(b0 == 0L && k0 == 0L && t0 == "")
  }

  test("htmlWrap fixture: exactly the content paragraph survives, decoded") {
    val out = Seq((5L, "some body words that keep the paragraph alive"))
      .toDF("doc_id", "text")
      .withColumn("_bf", Extract.blockFeatures(
        Extract.htmlWrap(col("doc_id"), col("text"))))
      .select(Extract.keptCountOf(col("_bf")),
        Extract.textOf(col("_bf"))).head()
    assert(out.getInt(0) == 1)
    assert(out.getString(1) ==
      "Q&A <notes> some body words that keep the paragraph alive")
  }

  // --- r16 fidelity pass: new boundaries + stopword-density rescue ---

  test("table cells and rows are block boundaries") {
    val (_, kept, txt) = extract(
      "<table><tr><td>the first cell is a long prose sentence kept here</td>" +
        "<td>x1</td></tr><tr><td>the second row also carries enough prose " +
        "words to keep</td></tr></table>")
    // each cell is its own block: two prose cells keep, the 'x1' cell
    // drops on the token floor — one undivided table would have kept
    // everything as a single blob
    assert(kept == 2L)
    assert(txt == "the first cell is a long prose sentence kept here\n" +
      "the second row also carries enough prose words to keep")
  }

  test("consecutive <br> variants split blocks without manufacturing content") {
    val (_, kept, txt) = extract(
      "<div>the first line of the pair has its words<br><br/>and the " +
        "second line of the pair keeps too<br />short</div>")
    assert(kept == 2L, s"got $kept: $txt")
    assert(txt == "the first line of the pair has its words\n" +
      "and the second line of the pair keeps too")
  }

  test("all heading levels are boundaries; heading text still drops on the floor") {
    val (_, kept, txt) = extract(
      "<h2>About</h2><p>the body paragraph after the heading keeps " +
        "with plenty of words</p><h6>fine print</h6>")
    assert(kept == 1L)
    assert(txt.startsWith("the body paragraph"))
  }

  test("entity-bearing anchors: decoded text, anchor share counts the raw anchor") {
    // the anchor text is entity-escaped; the link farm must still drop
    // (anchor share is computed while inline tags are intact)
    val (_, kept, _) = extract(
      "<p><a href=\"/x\">Q&amp;A &lt;one&gt; two three four five six</a> ok</p>")
    assert(kept == 0L, "entity-heavy link farm slipped past the anchor rule")
    // and a prose block with one entity-bearing anchor keeps, decoded
    val (_, k2, t2) = extract(
      "<p>plenty of ordinary prose words surround <a href=\"/y\">Q&amp;A</a> " +
        "the single tiny link</p>")
    assert(k2 == 1L)
    assert(t2.contains("Q&A"))
  }

  test("stopword-dense short blocks rescue; short non-prose still drops") {
    // 4 tokens, 2 stopwords (50% >= 30%) -> rescued below the 6-token floor
    val (_, k1, t1) = extract("<p>this is body prose</p>")
    assert(k1 == 1L, s"stopword-dense short block not rescued: $t1")
    // 4 tokens, 0 stopwords -> still drops (nav-ish labels)
    val (_, k2, _) = extract("<p>Home Products Pricing Contact</p>")
    assert(k2 == 0L, "non-prose short block slipped past the rescue leg")
    // under the rescue floor entirely (2 tokens, both stopwords)
    val (_, k3, _) = extract("<p>of the</p>")
    assert(k3 == 0L, "sub-floor block kept")
  }

  test("rescue list keys by page language: German prose the English list would mis-drop") {
    // 4 tokens, 3 German function words: the page langid pre-pass
    // reads 'de', the de-keyed list rescues — under the retired
    // English-only rule (n_stop would be 0) this prose was dropped
    val (_, k1, t1) = extract("<p>und das ist gut</p>")
    assert(k1 == 1L, s"German short prose mis-dropped: $t1")
    assert(t1 == "und das ist gut")
    // French twin through the same seam
    val (_, k2, _) = extract("<p>le chat est dans</p>")
    assert(k2 == 1L, "French short prose mis-dropped")
    // the SAME German block inside an English-dominated page keys the
    // list to 'en' and drops — the list is per page, not per block
    val (_, k3, t3) = extract(
      "<div><p>the quick brown fox jumps over the lazy dog for fun " +
        "with the others and the rest of that crowd</p></div>" +
        "<div><p>und das ist gut</p></div>")
    assert(k3 == 1L, s"en-page German block not dropped: $t3")
    assert(!t3.contains("und das ist gut"))
    // page language itself is exposed for the pre-pass contract
    val lang = Seq("<p>und das ist gut</p>").toDF("html")
      .select(Extract.pageLang(col("html"))).head().getString(0)
    assert(lang == "de")
  }
}
