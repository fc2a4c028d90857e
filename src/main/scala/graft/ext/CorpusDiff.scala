package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (SURVEY §2.9 north-star family) — the
  * incremental-refresh bookkeeping step: given two versions of a corpus,
  * classify every document as added / removed / changed / unchanged. The
  * output drives everything downstream of a refresh (what to re-embed,
  * re-dedup — [[Dedup.crossDupPairs]] consumes exactly the `added` +
  * `changed` set — re-curate, or retire from the training mix).
  *
  * Scale design (100 TB per snapshot): the document PAYLOAD never
  * shuffles. Each side map-reduces to a slim (id, md5-hex) frame — 8 B +
  * 32 B per doc — and the diff is ONE full-outer hash equi-join on id
  * over those slim frames; status is a map-only `when` over the join
  * output. Content equality via md5 text hash (the [[Dedup.exact]]
  * convention, engine-portable so the oracle can replay it); id columns
  * must be unique per snapshot (a corpus with duplicate ids needs
  * [[Dedup.exact]] first — duplicate ids would fan the join out).
  */
object CorpusDiff {

  /** Output: one row per id present in either snapshot —
    * (doc_id, status, h_old, h_new); hashes null on the absent side.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    def slim(df: DataFrame, h: String) = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        md5(coalesce(col(textCol), lit(""))).as(h))
    slim(oldDf, "h_old").join(slim(newDf, "h_new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"),
        col("h_old"), col("h_new"))
  }
}
