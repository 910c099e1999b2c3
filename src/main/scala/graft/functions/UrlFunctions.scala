package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the key derivation
  * behind URL-level dedup and per-domain caps (the first pass of
  * C4/RefinedWeb-style pipelines: a crawl carries the same page under
  * `http://` vs `https://`, with and without tracking parameters, with
  * re-ordered query strings, and the curation layer must treat those
  * as ONE document before any content-level dedup runs).
  *
  * The normal form, applied in order:
  *   1. trim; drop the fragment (`#...`);
  *   2. lowercase the scheme and authority (never the path or query);
  *   3. drop the scheme's default port (`:80` http, `:443` https);
  *   4. drop tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`)
  *      and empty params, then sort the survivors byte-wise;
  *   5. collapse trailing slashes on the path (`/a/` = `/a`; a bare
  *      authority keeps `/`).
  *
  * Deliberately NOT handled (documented non-goals, same trade as the
  * reference pipelines): userinfo (`user:pass@`), percent-encoding
  * equivalence, and IDN — each needs a spec table, none occurs in
  * curated crawl manifests after fetch-layer normalization.
  *
  * Everything is codegen'd built-ins over one row at a time — no UDF,
  * no shuffle; the expressions compose into any scan-side projection.
  */
object UrlFunctions {

  private val trackingKeys = "^(utm_[^=]*|fbclid|gclid|ref)$"

  /** Authority (host[:port]) of the trimmed, fragment-free URL,
    * lowercased — empty string when the input has no `://`. */
  private def authorityOf(u: Column): Column =
    lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))

  /** Lowercased scheme, empty when absent. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(trim(url), "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Lowercased host: authority minus any `:port` suffix. */
  def urlHost(url: Column): Column =
    regexp_replace(authorityOf(trim(url)), ":[0-9]+$", "")

  /** Registered domain of a host — the per-site cap key: the last two
    * labels, or three when the last two are a well-known second-level
    * public suffix (`co.uk`-style). A one-label host returns itself. */
  def registeredDomain(host: Column): Column = {
    val secondLevel = Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp",
      "com.br", "co.in", "com.cn")
    val labels = split(host, "\\.")
    TextFunctions.bound(labels) { ls =>
      val n = size(ls)
      val lastTwo = concat_ws(".", element_at(ls, -2), element_at(ls, -1))
      val lastThree =
        concat_ws(".", element_at(ls, -3), element_at(ls, -2), element_at(ls, -1))
      when(n <= 1, host)
        .when(n >= 3 && lastTwo.isin(secondLevel: _*), lastThree)
        .otherwise(lastTwo)
    }
  }

  /** The full canonical form (rules in the object doc). Inputs without
    * a `scheme://` are returned trimmed and fragment-stripped but
    * otherwise untouched — a relative reference has no authority to
    * normalize against. */
  def urlNormalize(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = authorityOf(u)
    // authority with the scheme's default port dropped
    val authNorm =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    // path: after the authority, before '?' — '' and '/'+ both → '/'
    val rawPath = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val query = TextFunctions.bound(
      array_sort(filter(split(rawQuery, "&"), p =>
        p =!= "" && !regexp_extract(p, "^([^=]*)", 1).rlike(trackingKeys)))) { ps =>
      when(size(ps) > 0, concat(lit("?"), array_join(ps, "&"))).otherwise(lit(""))
    }
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), authNorm, path, query))
  }
}
