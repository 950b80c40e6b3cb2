package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization (X123): the normalization a crawl pipeline
  * runs BEFORE any content fetch or dedup — the same page arrives as
  * `HTTP://Example.COM:80/a/?b=2&a=1#frag` and
  * `http://example.com/a?a=1&b=2`, and URL-level dedup is orders of
  * magnitude cheaper than fetching + content-deduping the copy.
  *
  * Rules (the conservative, semantics-preserving subset of RFC 3986
  * §6): drop the fragment; lowercase scheme and host (case-
  * insensitive by spec — the PATH is NOT touched, it is case-
  * sensitive); strip the scheme's default port (:80 http, :443
  * https); empty path → `/`; strip ONE trailing slash from non-root
  * paths; sort query parameters byte-lexicographically (param order
  * is almost never semantic; byte order is the one both engines
  * share). Everything is `Column` regex/array ops in the Java∩RE2
  * common subset — a narrow codegen'd pass, and the oracle runs the
  * identical chain.
  */
object Urls {

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pq = substr(rest, length(hostport) + lit(1))
    val rawPath = regexp_extract(pq, "^([^?]*)", 1)
    val path0 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      substr(path0, lit(1), length(path0) - lit(1))).otherwise(path0)
    val query = regexp_extract(pq, "\\?(.*)$", 1)
    val sortedQ = array_join(array_sort(
      filter(split(query, "&"), p => p =!= "")), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  def canonicalizeSql(e: String): String = {
    val noFrag = s"regexp_replace($e, '#.*$$', '', 'g')"
    val scheme = s"lower(regexp_extract($noFrag, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    val rest = s"regexp_replace($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    val hostport = s"lower(regexp_extract($rest, '^([^/?#]*)', 1))"
    val host = s"""(CASE WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '')
                  |  WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')
                  |  ELSE $hostport END)""".stripMargin
    val pq = s"substring($rest, length($hostport) + 1)"
    val rawPath = s"regexp_extract($pq, '^([^?]*)', 1)"
    val path0 = s"(CASE WHEN $rawPath = '' THEN '/' ELSE $rawPath END)"
    val path = s"(CASE WHEN $path0 <> '/' AND $path0 LIKE '%/' " +
      s"THEN substring($path0, 1, length($path0) - 1) ELSE $path0 END)"
    val query = s"regexp_extract($pq, '\\?(.*)$$', 1)"
    val sortedQ = s"array_to_string(list_sort(" +
      s"list_filter(string_split($query, '&'), p -> p <> '')), '&')"
    s"($scheme || '://' || $host || $path || " +
      s"(CASE WHEN $sortedQ = '' THEN '' ELSE '?' || $sortedQ END))"
  }
}
