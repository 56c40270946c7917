package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the identity step a crawl corpus needs before
  * any URL-keyed dedup or per-domain aggregation: superficially distinct
  * URLs (`HTTP://Example.com:80/a?utm_source=x#frag` vs
  * `http://example.com/a`) must collapse to one key or every downstream
  * exact-dedup / frequency / robots rule silently fragments.
  *
  * Rules applied (the conservative, semantics-preserving subset of RFC
  * 3986 §6 normalization plus the standard tracking-parameter strip):
  *  - scheme and host lowercased;
  *  - default port removed (`:80` for http, `:443` for https; other
  *    ports kept);
  *  - fragment removed;
  *  - empty path normalized to `/`;
  *  - tracking query parameters removed (`utm_*`, `fbclid`, `gclid`);
  *    surviving parameters keep their ORIGINAL order (full RFC
  *    normalization does not sort, and sorting can change servers'
  *    interpretation);
  *  - a trailing `?` left by a fully-stripped query is dropped.
  *
  * Everything is regexp_extract / split / filter / concat built-ins —
  * per-row, zero shuffle, codegen'd, and replayable verbatim in the
  * DuckDB oracle (same regex dialect for these patterns). Outputs also
  * expose `host` and `domain` (the last two dot-labels — a stand-in for
  * the public-suffix registered domain, which needs the PSL table; at
  * deploy, join host suffixes against a broadcast PSL dimension).
  *
  * Reference scope: beyond-reference (training-data pipeline brief);
  * the reference's URL surface is sitelink resolution (J2), which is
  * dictionary-based, not syntactic.
  */
object Urls {

  /** (norm_url, host, domain) for a URL column. Malformed rows (no
    * `scheme://`) pass through with norm_url = input, host/domain "". */
  def normalized(url: Column): (Column, Column, Column) = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val noFrag = element_at(split(rest, "#", 2), 1)
    val authority = regexp_extract(noFrag, "^([^/?]*)", 1)
    val pathq = substring(noFrag, length(authority) + 1, lit(1000000))
    val hostRaw = lower(element_at(split(authority, ":", 2), 1))
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val pathNorm = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)") && !(p === ""))
    val queryNorm = array_join(params, "&")
    val norm = when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), hostRaw, portPart, pathNorm,
      when(queryNorm === "", lit("")).otherwise(concat(lit("?"), queryNorm))))
    val domain = regexp_extract(hostRaw, "([^.]+\\.[^.]+)$", 1)
    (norm, hostRaw, domain)
  }

  /** Normalize a URL column of `df` into (idCols..., norm_url, host,
    * domain) — one map pass. */
  def normalize(df0: DataFrame, url: Column, idCols: Column*): DataFrame = {
    val df = Par.spread(df0) // regex-heavy map: widen narrow scans (guide §2.5)
    val (n, h, d) = normalized(url)
    df.select(idCols :+ n.as("norm_url") :+ h.as("host") :+ d.as("domain"): _*)
  }

  /** Per-domain crawl profile over a URL column: distinct normalized
    * URLs and total rows per domain (the fan-in table a crawler's
    * politeness/quality budget reads). Two partial-aggregable hash aggs
    * — first on norm_url (the dedup), then on domain. */
  def domainProfile(df: DataFrame, url: Column): DataFrame = {
    val (n, _, d) = normalized(url)
    df.select(n.as("norm_url"), d.as("domain"))
      .groupBy("domain", "norm_url").agg(count(lit(1)).as("c"))
      .groupBy("domain").agg(
        count(lit(1)).as("distinct_urls"),
        sum("c").as("n_rows"))
  }
}
