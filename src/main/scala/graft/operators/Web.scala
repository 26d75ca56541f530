package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Web-corpus curation primitives: URL canonicalization and per-host
  * rollups — the rung below [[SourceQuality]] for corpora whose natural
  * source key is a URL (CommonCrawl-style pipelines dedup and gate by
  * CANONICAL URL and by HOST, not by the raw string: `HTTP://WWW.A.COM:80/x/?b=2&utm_s=z&a=1#f`
  * and `http://a.com/x?a=1&b=2` are the same page).
  *
  * The canonical form (documented contract, applied in this order):
  *   1. scheme lowercased; a string with no `scheme://` prefix is
  *      MALFORMED → null canonical + null host (its own rollup class,
  *      like the null-source class in [[SourceQuality]]);
  *   2. userinfo (`user:pass@`) dropped; host lowercased; ONE leading
  *      `www.` stripped; default ports dropped (`:80` for http, `:443`
  *      for https), other ports kept;
  *   3. fragment dropped;
  *   4. path: runs of `/` collapsed, trailing slashes stripped (so the
  *      root path canonicalizes to the bare authority);
  *   5. query: tracking params removed (`utm_*`, `fbclid`, `gclid`),
  *      empty params removed, survivors SORTED bytewise and re-joined —
  *      param order never distinguishes two URLs.
  *
  * Every step is a built-in (`regexp_extract` / `regexp_replace` /
  * `split` / `sort_array` / `array_join`, plus ONE `filter` lambda
  * over the split query params — see the in-code note on why the name
  * boundary forces it) over RE2-compatible regexes, so the DuckDB
  * oracle replays the identical algebra (its only deltas are syntax:
  * `list_filter` and the explicit `'g'` flag).
  *
  * 100 TB shape: canonicalization is embarrassingly parallel and
  * narrow; the host rollup is ONE map-side-partial `groupBy(host)`
  * (the [[SourceQuality.SourceStats]] shape — a corpus-hot host
  * collapses per partition before the shuffle), and its output feeds
  * the existing [[SourceQuality.SourceFilter]] gate with
  * `sourceColumn = "host"` — host-level gating needs no new join
  * machinery.
  */
object Web {

  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Canonicalization pieces over a (non-null, scheme-bearing) url. */
  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, s"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  private def canonicalParts(u: Column): (Column, Column, Column) = {
    val rest0 = regexp_replace(u, SchemeRe, "")
    val rest = regexp_replace(rest0, "#.*$", "") // drop fragment
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val hostport = regexp_replace(authority, "^[^@]*@", "") // userinfo
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
    val scheme = schemeOf(u)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathq = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_replace(
      regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/{2,}", "/"),
      "/+$", "")
    val query0 = regexp_extract(pathq, "[?](.*)$", 1)
    // tracking-param removal by whole-param match over the split
    // array: a pure-regex removal cannot express the param-NAME
    // boundary without lookahead (which RE2 — the oracle's engine —
    // lacks: `fbclidX=5` must survive), and the delimiter-recapture
    // trick fails on ADJACENT tracking params. The `filter` lambda is
    // interpreted, but it runs over a query string's own params — a
    // tiny bounded array, not the 50M-row hot-lambda trap
    // (stress-measured); empty params drop with the same pass
    val params = filter(split(query0, "&"), p =>
      !p.rlike("^(utm_[^&=]*|fbclid|gclid)(=.*)?$") && p =!= "")
    val sortedQ = array_join(sort_array(params), "&")
    val queryPart = when(length(sortedQ) > 0, concat(lit("?"), sortedQ))
      .otherwise(lit(""))
    val canonical = concat(scheme, lit("://"), host, portPart, path,
      queryPart)
    (canonical, host, scheme)
  }

  /** Append `url_canonical` and `host` to every row (row-preserving);
    * null or scheme-less (malformed) urls yield null in both — a real
    * rollup class downstream, never a dropped row.
    */
  final case class UrlCanonicalize(urlColumn: String = "url")
      extends Wrangler {
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(urlColumn))
      Seq("url_canonical", "host").foreach { c =>
        require(!df.columns.exists(_.equalsIgnoreCase(c)),
          s"Output column `$c` already exists in the input; rename it first")
      }
      val u = trim(col(urlColumn))
      val wellFormed = col(urlColumn).isNotNull && u.rlike(SchemeRe)
      val (canonical, host, _) = canonicalParts(u)
      df.withColumn("url_canonical",
          when(wellFormed, canonical).otherwise(lit(null).cast("string")))
        .withColumn("host",
          when(wellFormed, host).otherwise(lit(null).cast("string")))
    }
  }

  /** Per-host rollup over canonicalized URLs: document count, distinct
    * canonical URLs (malformed = one class per host, the
    * [[SourceQuality.SourceStats]] null-class convention) and the
    * duplicate-URL ratio. The malformed class itself rolls up under the
    * null host. Feeds [[SourceQuality.SourceFilter]] via
    * `sourceColumn = "host"` for host-level gating.
    */
  final case class HostStats(urlColumn: String = "url")
      extends Wrangler {
    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(urlColumn))
      val canon = UrlCanonicalize(urlColumn).transform(
        df.select(col(urlColumn)))
      val classes = (count_distinct(col("url_canonical")) +
        when(count(lit(1)) > count(col("url_canonical")), lit(1L))
          .otherwise(lit(0L)))
      canon.groupBy("host")
        .agg(
          count(lit(1)).as("n_docs"),
          classes.as("distinct_urls"),
          ((count(lit(1)) - classes).cast("double") / count(lit(1)))
            .as("dup_url_ratio"))
    }
  }
}
