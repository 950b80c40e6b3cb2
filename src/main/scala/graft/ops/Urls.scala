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
  * §6): drop the fragment; lowercase scheme and HOST ONLY (userinfo
  * and path are case-SENSITIVE by spec and pass through verbatim);
  * strip the scheme's default port (:80 http, :443 https); empty
  * path → `/`; strip ONE trailing slash from non-root paths; sort
  * query parameters byte-lexicographically (param order is almost
  * never semantic; byte order is the one both engines share).
  * URIs WITHOUT a hierarchical `scheme://` part (`dns:example.com`,
  * relative references — real Common Crawl metadata records carry
  * them) pass through UNCHANGED: guessing a host in a non-hierarchical
  * URI would fold case on text that isn't a host. Everything is
  * `Column` regex/array ops in the Java∩RE2 common subset — a narrow
  * codegen'd pass, and the oracle runs the identical chain.
  */
object Urls {

  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, SchemePrefix, "")
    val auth = regexp_extract(rest, "^([^/?#]*)", 1)
    // userinfo (up to the last @) keeps its case; only host:port folds
    val ui = regexp_extract(auth, "^(.*@)", 1)
    val hp = lower(regexp_extract(auth, "([^@]*)$", 1))
    val host = when(scheme === "http", regexp_replace(hp, ":80$", ""))
      .when(scheme === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val pq = substr(rest, length(auth) + lit(1))
    val rawPath = regexp_extract(pq, "^([^?]*)", 1)
    val path0 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      substr(path0, lit(1), length(path0) - lit(1))).otherwise(path0)
    val query = regexp_extract(pq, "\\?(.*)$", 1)
    val sortedQ = array_join(array_sort(
      filter(split(query, "&"), p => p =!= "")), "&")
    val canon = concat(scheme, lit("://"), ui, host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
    when(url.rlike(SchemePrefix), canon).otherwise(url)
  }

  /** The SQL twin, staged through LATERAL COLUMN ALIASES in a scalar
    * subquery so each stage is computed (and readable) once instead
    * of textually inlined into every consumer.
    */
  def canonicalizeSql(e: String): String =
    s"""(SELECT CASE WHEN NOT regexp_matches(_u, '$SchemePrefix')
       |  THEN _u
       |  ELSE _scheme || '://' || _ui || _host || _path ||
       |    (CASE WHEN _sq = '' THEN '' ELSE '?' || _sq END) END
       | FROM (SELECT _u,
       |   regexp_replace(_u, '#.*$$', '', 'g') AS _nf,
       |   lower(regexp_extract(_nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS _scheme,
       |   regexp_replace(_nf, '$SchemePrefix', '') AS _rest,
       |   regexp_extract(_rest, '^([^/?#]*)', 1) AS _auth,
       |   regexp_extract(_auth, '^(.*@)', 1) AS _ui,
       |   lower(regexp_extract(_auth, '([^@]*)$$', 1)) AS _hp,
       |   (CASE WHEN _scheme = 'http' THEN regexp_replace(_hp, ':80$$', '')
       |         WHEN _scheme = 'https' THEN regexp_replace(_hp, ':443$$', '')
       |         ELSE _hp END) AS _host,
       |   substring(_rest, length(_auth) + 1) AS _pq,
       |   regexp_extract(_pq, '^([^?]*)', 1) AS _rp,
       |   (CASE WHEN _rp = '' THEN '/' ELSE _rp END) AS _p0,
       |   (CASE WHEN _p0 <> '/' AND _p0 LIKE '%/'
       |         THEN substring(_p0, 1, length(_p0) - 1) ELSE _p0 END) AS _path,
       |   regexp_extract(_pq, '\\?(.*)$$', 1) AS _q,
       |   array_to_string(list_sort(
       |     list_filter(string_split(_q, '&'), p -> p <> '')), '&') AS _sq
       |  FROM (SELECT ($e) AS _u)))""".stripMargin
}
