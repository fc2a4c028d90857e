package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X26b (r16): URL canonicalization + URL-level dedup — the step-0.5
  * web-corpus stage between container ingest (x120's WARC reader, whose
  * `WARC-Target-URI` header this consumes) and content dedup: C4
  * (Raffel et al. 2020) dedups at URL level before any text pass,
  * RefinedWeb (Penedo et al. 2023) runs exact-URL dedup across crawl
  * snapshots, and the per-domain caps/stats every published pipeline
  * keeps (x66's X7g) need a REGISTERED domain, not a raw host.
  *
  * Canonical form (declared, engine-portable — each rule is a regex or
  * list op both engines run verbatim; the constants are interpolated
  * into the DuckDB oracle so Scala and SQL can never desync):
  *  1. scheme and host lowercase (RFC 3986 §6.2.2.1 — case-insensitive
  *     components; path/query stay case-sensitive);
  *  2. one leading `www.` stripped from the host;
  *  3. default ports drop (`:80` under http, `:443` under https);
  *     non-default ports are CONTENT and stay;
  *  4. the fragment drops (never sent to the server — two URLs
  *     differing only in `#...` fetch the same page);
  *  5. tracking query parameters drop: any key starting `utm_` plus
  *     the exact keys in [[TrackingParams]]; surviving parameters keep
  *     their ORIGINAL order (sorting them is a stricter variant that
  *     merges `?a=1&b=2` with `?b=2&a=1` — the declared rule here is
  *     conservative: parameter order can be semantic);
  *  6. an empty residual query drops its `?`;
  *  7. trailing slashes strip from the path, and an empty path
  *     normalizes to `/` (so `http://h`, `http://h/` and `http://h//`
  *     coincide).
  *
  * Registered domain (the simplified public-suffix rule, declared): the
  * host's last two labels — or last THREE when the second-to-last label
  * is a multi-part second-level TLD ([[MultiPartTlds]]: `co.uk`,
  * `com.au`, `ac.jp`-family). The full public-suffix list is data, not
  * code; this is the context-free core every pipeline starts from.
  *
  * Scale: everything here is built-in regex/array expression work —
  * map-only, no shuffle, scan parallelism; the dedup itself is ONE
  * partial-agg'd groupBy on the canonical string (at 100 TB the only
  * shuffle, on slim (url, id) rows — document text never moves).
  *
  * (No reference citation — the reference engine is a Kafka traffic
  * generator with no web path; this extends the x120→x113 chain.)
  */
object Urls {

  /** Exact-match tracking keys (beyond the `utm_` prefix family). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  /** Second-level labels that make a three-label registered domain. */
  val MultiPartTlds: Seq[String] = Seq("ac", "co", "com", "edu", "gov", "net", "org")

  /** The component regexes (shared with the oracle SQL verbatim). */
  val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  val QueryRe = "^[^#]*\\?([^#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  private def authority(url: Column): Column =
    regexp_extract(url, AuthorityRe, 1)

  /** Lowercased, `www.`-stripped host. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(authority(url), "^([^:]*)", 1)),
      "^www\\.", "")

  def port(url: Column): Column =
    regexp_extract(authority(url), ":([0-9]+)$", 1)

  private def canonPortPart(sch: Column, p: Column): Column =
    when(p === "" ||
      (sch === "http" && p === "80") || (sch === "https" && p === "443"),
      lit("")).otherwise(concat(lit(":"), p))

  private def canonPath(url: Column): Column = {
    val stripped = regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Query with tracking parameters removed, original order kept. */
  private def canonQueryPart(url: Column): Column = {
    val kept = filter(split(regexp_extract(url, QueryRe, 1), "&"), p => {
      val key = element_at(split(p, "="), 1)
      p =!= "" && !key.startsWith("utm_") && !key.isin(TrackingParams: _*)
    })
    when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
  }

  /** The canonical URL (rules 1–7 above). Inputs that do not parse as
    * `scheme://authority...` canonicalize with empty scheme/host — a
    * declared pass-through class the caller can filter on
    * (`scheme(url) === ""`), never a crash.
    */
  def canonicalUrl(url: Column): Column = {
    val u = coalesce(url, lit(""))
    val sch = scheme(u)
    concat(sch, lit("://"), host(u), canonPortPart(sch, port(u)),
      canonPath(u), canonQueryPart(u))
  }

  /** Registered domain of an already-canonical host (or any lowercase
    * host): last two labels, or last three under [[MultiPartTlds]].
    */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    when(n <= 2, hostCol)
      .when(element_at(labels, -2).isin(MultiPartTlds: _*),
        concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** URL-level dedup (the C4/RefinedWeb rule): one survivor per
    * canonical URL — deterministic keeper = the smallest id (crawl
    * pipelines use earliest-fetch; ids are the fixture's fetch order).
    * Output: one row per canonical URL with its registered domain,
    * keeper id and duplicate count. The only shuffle is the groupBy on
    * the canonical string over slim (url, id) rows.
    */
  def urlDedup(urls: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = urls.select(canonicalUrl(col(urlCol)).as("canonical_url"),
      col(idCol).cast("long").as("id"))
    canon.groupBy("canonical_url")
      .agg(min(col("id")).as("keeper_id"), count(lit(1)).as("n_dups"))
      .withColumn("reg_domain",
        registeredDomain(host(col("canonical_url"))))
      .select("canonical_url", "reg_domain", "keeper_id", "n_dups")
  }
}
