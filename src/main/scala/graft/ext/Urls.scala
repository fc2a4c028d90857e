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
  * Registered domain (r17 — the public-suffix list as DATA): the PSL
  * is a published dataset (publicsuffix.org), not code, so the rule
  * table rides as a kilobyte artifact ([[PublicSuffixes]] is the
  * shipped curated core; deployments load the full list through the
  * same seam — [[graft.ext.Artifacts.saveVocab]]/`loadVocab`, which
  * the declared x124 exercises end-to-end). Longest-match semantics
  * over EXACT rules: the public suffix of a host is its longest
  * rule-matching label suffix (default: the last label), and the
  * registered domain is that suffix plus one label — hosts at or
  * below suffix depth pass through whole. Wildcard (`*.ck`) and
  * exception (`!www.ck`) rules are a straightforward extension of the
  * same table; the shipped core is exact-rule only (declared). The
  * match compiles to a literal per-depth set-membership CASE — pure
  * map-side expression work, no join, exactly like a broadcast of the
  * kilobyte table but visible to codegen.
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

  /** The shipped public-suffix core (publicsuffix.org — public data;
    * exact rules only, see the object scaladoc). ICANN section: the
    * common country second-level registration suffixes; PRIVATE
    * section: the platform suffixes every crawl actually hits (a
    * `github.io` host is a DIFFERENT registrant per subdomain — the
    * last-2-labels heuristic would collapse all of GitHub Pages into
    * one "domain" and starve the per-domain caps). Deployments swap
    * the full list in through the same parameter.
    */
  val PublicSuffixes: Seq[String] = Seq(
    // ICANN: uk / jp / au / nz / br / cn / mx / in / za / kr / sg /
    // tr / tw / hk / ar / il / th / my / pl
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in",
    "co.za", "net.za", "org.za", "web.za", "ac.za", "gov.za",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "co.th", "in.th", "ac.th", "go.th", "or.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "eu.org",
    // PRIVATE: hosting-platform suffixes
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "firebaseapp.com", "web.app", "netlify.app", "vercel.app",
    "pages.dev", "workers.dev", "wordpress.com", "appspot.com",
    "s3.amazonaws.com")

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
    * host) under a public-suffix rule table (default: the shipped
    * [[PublicSuffixes]] core): longest matching rule suffix plus one
    * label; default suffix = the last label; hosts at or below suffix
    * depth pass through whole. Compiles to a per-depth literal
    * set-membership CASE — map-only, codegen'd, no join.
    */
  def registeredDomain(hostCol: Column,
                       psl: Seq[String] = PublicSuffixes): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val byLen = psl.groupBy(_.count(_ == '.') + 1)
    val maxK = if (byLen.isEmpty) 1 else byLen.keys.max
    def lastLabels(k: Int) = concat_ws(".", slice(labels, -k, k))
    val default = when(n <= 2, hostCol).otherwise(lastLabels(2))
    (maxK to 2 by -1).flatMap(k => byLen.get(k).map(k -> _))
      .foldRight(default) { case ((k, rules), acc) =>
        // n == k: the host IS the suffix rule — at-suffix-depth
        // pass-through (the declared contract) at every rule depth,
        // not just the n <= 2 default.
        when(n > k && lastLabels(k).isin(rules: _*), lastLabels(k + 1))
          .when(n === k && hostCol.isin(rules: _*), hostCol)
          .otherwise(acc)
      }
  }

  /** [[registeredDomain]] as oracle SQL over a DuckDB label-list
    * expression `ls` and host expression `hst` — interpolated into the
    * x124 oracle so the Scala rule table and the SQL can never desync
    * (the keepSql discipline).
    */
  def registeredDomainSql(ls: String, hst: String,
                          psl: Seq[String] = PublicSuffixes): String = {
    val byLen = psl.groupBy(_.count(_ == '.') + 1)
    val maxK = if (byLen.isEmpty) 1 else byLen.keys.max
    val whens = (maxK to 2 by -1).flatMap(k => byLen.get(k).map { rules =>
      val lst = rules.mkString("['", "','", "']")
      s"WHEN len($ls) > $k AND list_contains(" +
        s"$lst, array_to_string($ls[-$k:], '.')) " +
        s"THEN array_to_string($ls[-${k + 1}:], '.') " +
        s"WHEN len($ls) = $k AND list_contains($lst, $hst) THEN $hst"
    })
    s"CASE ${whens.mkString(" ")} WHEN len($ls) <= 2 THEN $hst " +
      s"ELSE array_to_string($ls[-2:], '.') END"
  }

  /** URL-level dedup (the C4/RefinedWeb rule): one survivor per
    * canonical URL — deterministic keeper = the smallest id (crawl
    * pipelines use earliest-fetch; ids are the fixture's fetch order).
    * Output: one row per canonical URL with its registered domain,
    * keeper id and duplicate count. The only shuffle is the groupBy on
    * the canonical string over slim (url, id) rows.
    */
  def urlDedup(urls: DataFrame, urlCol: String, idCol: String,
               psl: Seq[String] = PublicSuffixes,
               latestWins: Boolean = false): DataFrame = {
    val canon = urls.select(canonicalUrl(col(urlCol)).as("canonical_url"),
      col(idCol).cast("long").as("id"))
    canon.groupBy("canonical_url")
      .agg((if (latestWins) max(col("id")) else min(col("id")))
        .as("keeper_id"), count(lit(1)).as("n_dups"))
      .withColumn("reg_domain",
        registeredDomain(host(col("canonical_url")), psl))
      .select("canonical_url", "reg_domain", "keeper_id", "n_dups")
  }

  /** X26c across crawl snapshots (r17 — the RefinedWeb form, the r16
    * verdict's stretch #8): fold a FRESH crawl's page set into the
    * standing canonical-URL keeper index without re-scanning history.
    * Keeper policy is the same min/max id rule as [[urlDedup]]
    * (`latestWins = false` = first-fetch-wins, the RefinedWeb
    * cross-snapshot rule where a re-crawled URL dedups away;
    * `latestWins = true` = the C4-preprocessing convention where the
    * newest fetch replaces — the policy the x131 composition
    * refreshes under, because it exercises the changed-content path).
    * The parameter is REQUIRED (no default): the fold == rebuild
    * exactness below only holds when the standing index was built
    * under the SAME policy, so the caller must state which one —
    * a defaulted `true` here against [[urlDedup]]'s defaulted `false`
    * would silently fold a min-keeper index under max semantics.
    *
    * EXACTNESS (the x85/x112 argument, index-sized): min/max/count are
    * associative-commutative, so
    * `urlDedupRefresh(urlDedup(v1), v2) == urlDedup(v1 ∪ v2)` row for
    * row (UrlSpec pins it) — the fold IS the rebuild, delta-priced.
    *
    * SCALE: the fresh side aggregates to snapshot-sized slim rows
    * before the join; the standing index joins as slim (url, domain,
    * id, count) rows — one index-sized shuffle, document text never
    * moves (bucketing the persisted index by canonical_url removes
    * even that at deployment). reg_domain carries forward for known
    * URLs and computes fresh only for new ones.
    */
  def urlDedupRefresh(standing: DataFrame, fresh: DataFrame,
                      urlCol: String, idCol: String,
                      latestWins: Boolean,
                      psl: Seq[String] = PublicSuffixes): DataFrame = {
    val f = fresh.select(canonicalUrl(col(urlCol)).as("canonical_url"),
        col(idCol).cast("long").as("id"))
      .groupBy("canonical_url")
      .agg((if (latestWins) max(col("id")) else min(col("id")))
        .as("_f_keeper"), count(lit(1)).as("_f_dups"))
    standing.join(f, Seq("canonical_url"), "full_outer")
      .select(col("canonical_url"),
        coalesce(col("reg_domain"),
          registeredDomain(host(col("canonical_url")), psl))
          .as("reg_domain"),
        (if (latestWins) greatest(col("keeper_id"), col("_f_keeper"))
         else least(col("keeper_id"), col("_f_keeper"))).as("keeper_id"),
        (coalesce(col("n_dups"), lit(0L)) + coalesce(col("_f_dups"), lit(0L)))
          .as("n_dups"))
  }
}
