package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization (p14's policy, factored so specs can property-
  * test it directly): the standard crawl-frontier normalization —
  * lowercase scheme+host, strip a leading `www.`, strip the scheme's
  * default port but keep explicit non-default ports, collapse duplicate
  * path slashes, strip the trailing slash, drop tracker params
  * (`utm_*`, `fbclid`, `gclid`), sort surviving query params, drop the
  * fragment.
  *
  * Everything is regex/array built-ins over one input column — no UDF,
  * so the projection is a stateless codegen'd pass at any scale. The
  * policy is IDEMPOTENT (canonicalize ∘ canonicalize =
  * canonicalize, property-tested in UrlCanonSpec): canonical output
  * re-parses to itself because every rule maps its own output to a
  * fixed point.
  */
object UrlOps {

  private val trackerRe = "^(utm_[a-z]+|fbclid|gclid)="

  /** The canonical form of `url`. Unparseable inputs degrade softly:
    * regexp_extract misses yield empty parts, never nulls or errors
    * (a crawl frontier cannot throw on one malformed URL). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z]+)://", 1))
    val hostport = regexp_extract(url, "^[a-zA-Z]+://([^/?#]+)", 1)
    val host = regexp_replace(lower(regexp_replace(hostport, ":[0-9]+$", "")),
      "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val path = regexp_replace(regexp_replace(
      regexp_extract(url, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1),
      "/{2,}", "/"), "/$", "")
    val kept = array_sort(filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(trackerRe)))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }
}
