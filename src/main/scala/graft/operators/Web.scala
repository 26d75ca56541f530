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
  *   2. userinfo (`user:pass@`) dropped; host lowercased; the leading
  *      RUN of `www.` prefixes stripped (`www.www.ex.com` → `ex.com`,
  *      so canonical hosts are fixed points; the degenerate
  *      `http://www.com` collapses to host `com` — documented, a
  *      deliberately-simple convention); default ports dropped (`:80`
  *      for http, `:443` for https), other ports kept;
  *   3. fragment dropped;
  *   4. percent-encoding normalized bytewise (RFC 3986 §2.3/§6.2.2):
  *      each `%XX` whose octet is UNRESERVED (ALPHA / DIGIT / `-` `.`
  *      `_` `~`) decodes to the literal character; every other `%XX`
  *      keeps its escape with the hex digits UPPERCASED (`%2f` →
  *      `%2F`); a `%` not followed by two hex digits passes through
  *      untouched (malformed escapes are preserved, never corrupted).
  *      Decoding an unreserved octet can never introduce a delimiter,
  *      so this runs over the whole scheme-stripped fragment-stripped
  *      rest BEFORE parsing — host, path and query all normalize;
  *   5. path: runs of `/` collapsed, trailing slashes stripped (so the
  *      root path canonicalizes to the bare authority);
  *   6. query: tracking params removed (`utm_*`, `fbclid`, `gclid`),
  *      empty params removed, survivors SORTED bytewise and re-joined —
  *      param order never distinguishes two URLs.
  *
  * Every step is a built-in (`regexp_extract` / `regexp_replace` /
  * `split` / `sort_array` / `array_join`, plus ONE `filter` lambda
  * over the split query params — see the in-code note on why the name
  * boundary forces it — and ONE indexed `transform` lambda over the
  * split percent-escapes, same tiny-bounded-array justification) over
  * RE2-compatible regexes, so the DuckDB oracle replays the identical
  * algebra (its only deltas are syntax: `list_filter`/`list_transform`
  * with 1-based lambda indexes and the explicit `'g'` flag).
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

  /** Uppercased hex codes of the RFC 3986 unreserved set: A-Z (41-5A),
    * a-z (61-7A), 0-9 (30-39), `-` (2D), `.` (2E), `_` (5F), `~` (7E).
    * Gating the DECODE on the hex range (not on the decoded char) keeps
    * `unhex` away from non-ASCII octets — the oracle's `decode()`
    * throws on invalid UTF-8, and a `%FF` must stay `%FF` anyway.
    */
  private val UnreservedHexRe =
    "^(4[1-9A-F]|5[0-9A]|5F|6[1-9A-F]|7[0-9A]|7E|3[0-9]|2[DE])$"

  /** Contract step 4: bytewise percent-encoding normalization. Split on
    * `%` (piece 0 is the literal prefix; every later piece followed a
    * `%`), decode unreserved octets, uppercase surviving escapes, pass
    * malformed escapes through. The `transform` lambda is interpreted,
    * but it runs over one URL's own escape count — a tiny bounded
    * array, the same justification as the tracking-param `filter`
    * below. Idempotent: outputs contain no decodable escape (survivors
    * are non-unreserved by construction) and decoded chars contain no
    * `%` (`%25` is not unreserved, so `%` itself never decodes).
    */
  private def pctNormalize(s: Column): Column = {
    val pieces = split(s, "%", -1)
    val fixed = transform(pieces, (p, i) => {
      val hex = upper(substring(p, 1, 2))
      val rest = substring(p, 3, Int.MaxValue)
      when(i === 0, p)
        .when(p.rlike("^[0-9A-Fa-f]{2}") && hex.rlike(UnreservedHexRe),
          concat(decode(unhex(hex), "UTF-8"), rest))
        .when(p.rlike("^[0-9A-Fa-f]{2}"), concat(lit("%"), hex, rest))
        .otherwise(concat(lit("%"), p))
    })
    array_join(fixed, "")
  }

  private def canonicalParts(u: Column): (Column, Column, Column) = {
    val rest0 = regexp_replace(u, SchemeRe, "")
    // drop fragment, then normalize percent-escapes over the whole
    // remainder (safe pre-parse: unreserved decodes introduce no
    // delimiter — see pctNormalize)
    val rest = pctNormalize(regexp_replace(rest0, "#.*$", ""))
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val hostport = regexp_replace(authority, "^[^@]*@", "") // userinfo
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^(www\\.)+", "")
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
