"""URL-quality filtering for web-crawl pages (C4 / RefinedWeb / UT1-style
URL rules, public corpus-construction practice): a columnar expression
bank over a url column — blocklisted hosts, junk path keywords, tracking-
parameter overload, non-content file extensions, oversized URLs.

Everything is JVM-side string expressions (no UDF), so the filter fuses
into the page scan as a pure map — at 100 TB it costs one pass and
enables partition-level skipping when the corpus is laid out by host.

The banks mirror the public filtering recipes:
- host blocklist: the UT1/Blacklists-style adult/ads/malware domain cut
  (deployments broadcast the real multi-million-entry list; the bank
  here is the plumbing + representative entries)
- path keywords: auth/commerce/search chrome pages that carry no
  trainable prose (login, signup, cart, ...)
- parameter overload: >= MAX_QUERY_PARAMS '&'-separated params marks
  session/tracking URLs (C4's dedup-by-URL normalization rationale)
- extension cut: image/binary/asset extensions never feed a TEXT corpus
- length cut: > MAX_URL_LEN chars is bot/tracking noise
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOCKED_HOSTS = [
    "ads.tracker.net",
    "casino-spins.com",
    "malware.example.org",
]
BLOCKED_PATH_KEYWORDS = ["login", "signup", "cart", "checkout", "wp-admin"]
BLOCKED_EXTENSIONS = [".jpg", ".jpeg", ".png", ".gif", ".zip", ".exe", ".css", ".js"]
MAX_QUERY_PARAMS = 4
MAX_URL_LEN = 2048


def _authority_of(url: Column) -> Column:
    """Authority (host[:port]): strip scheme, cut at the first '/', '?'
    or '#' — a path-less 'https://host?q' or 'https://host#f' must still
    yield the bare host (review fix: blocklist bypass)."""
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    return F.substring_index(
        F.substring_index(F.substring_index(no_scheme, "/", 1), "?", 1), "#", 1
    )


def _host_of(url: Column) -> Column:
    """Host part: authority minus :port, lowercased."""
    return F.lower(F.substring_index(_authority_of(url), ":", 1))


def url_quality_flags(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the per-rule boolean flags + the combined ``url_keep``.

    Columns added: blocked_host, blocked_path, too_many_params, bad_ext,
    too_long, url_keep. Pure built-in expressions; the input frame is
    returned with its original columns intact.
    """
    url = F.coalesce(F.col(url_col), F.lit(""))
    low = F.lower(url)
    host = _host_of(url)

    blocked_host = host.isin([h.lower() for h in BLOCKED_HOSTS])
    # keyword matches PATH SEGMENTS (bounded by / ? # . or end), never a
    # substring of the host or a longer slug ('cartoonnetwork', the
    # '/checkout-guide' review case)
    no_scheme = F.regexp_replace(low, r"^[a-z][a-z0-9+.-]*://", "")
    pathq = F.substring(
        no_scheme, F.length(_authority_of(url)) + 1, F.lit(1 << 30)
    )
    kw_alt = "|".join(BLOCKED_PATH_KEYWORDS)
    blocked_path = pathq.rlike(rf"(^|/)({kw_alt})([/?#.]|$)")
    # '&'-separated params IN THE QUERY STRING: n_amp >= MAX-1 means
    # >= MAX params (path ampersands don't count)
    query = F.when(low.contains("?"), F.substring_index(low, "?", -1)).otherwise(
        F.lit("")
    )
    n_amp = F.length(query) - F.length(F.regexp_replace(query, r"&", ""))
    too_many_params = low.contains("?") & (n_amp >= MAX_QUERY_PARAMS - 1)
    # extension applies to the path BEFORE any query string or fragment
    pre_query = F.substring_index(F.substring_index(low, "?", 1), "#", 1)
    bad_ext = None
    for ext in BLOCKED_EXTENSIONS:
        c = pre_query.endswith(ext)
        bad_ext = c if bad_ext is None else (bad_ext | c)
    too_long = F.length(url) > MAX_URL_LEN

    return (
        df.withColumn("blocked_host", blocked_host)
        .withColumn("blocked_path", blocked_path)
        .withColumn("too_many_params", too_many_params)
        .withColumn("bad_ext", bad_ext)
        .withColumn("too_long", too_long)
        .withColumn(
            "url_keep",
            ~(blocked_host | blocked_path | too_many_params | bad_ext | too_long),
        )
    )


TRACKING_PARAMS = ["ref", "sid", "fbclid", "gclid"]  # plus any utm_* prefix


def normalize_url(url: Column) -> Column:
    """Canonical URL form (the C4 dedup-by-URL normalization, public
    practice): lowercase scheme+host, strip the #fragment, drop tracking
    query params (utm_* prefix + TRACKING_PARAMS), drop an emptied '?',
    strip default :80/:443 ports and any trailing '/'.

    Built on ``try_parse_url`` (Spark's RFC-3986 regex parser) — one parse
    per component instead of a nested substring chain; the hand-rolled
    version inlined its upstream into every derived part and produced a
    ~19 KB expression tree that ran 5x slower (round-4 profiling)."""
    u = F.coalesce(url, F.lit(""))
    # scheme presence from the PARSED protocol, not substring '://' — a
    # schemeless 'a.com/?next=https://b.com' embeds '://' in its query
    # and must still get the dummy-scheme loan (review fix)
    scheme_raw = F.try_parse_url(u, F.lit("PROTOCOL"))
    has_scheme = scheme_raw.isNotNull()
    # the parser needs a scheme; loan schemeless input a dummy one and
    # drop it again at reconstruction
    uu = F.when(has_scheme, u).otherwise(F.concat(F.lit("http://"), u))
    scheme = F.lower(F.coalesce(scheme_raw, F.lit("")))
    host_probe = F.try_parse_url(uu, F.lit("HOST"))
    authority = F.coalesce(F.try_parse_url(uu, F.lit("AUTHORITY")), F.lit(""))
    path = F.coalesce(F.try_parse_url(uu, F.lit("PATH")), F.lit(""))
    qs = F.coalesce(F.try_parse_url(uu, F.lit("QUERY")), F.lit(""))

    host = F.lower(F.substring_index(authority, ":", 1))
    port = F.when(
        authority.contains(":"), F.substring_index(authority, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = (port != "") & (port != "80") & (port != "443")
    hostport_norm = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)

    kept_params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit(""))
        & ~F.lower(p).startswith("utm_")
        & ~F.lower(F.substring_index(p, "=", 1)).isin(TRACKING_PARAMS),
    )
    qs_norm = F.array_join(kept_params, "&")
    # a single trailing '/' is dropped — including the bare-root form, so
    # 'https://a.com/' and 'https://a.com' collapse to one canonical URL
    path_norm = F.when(
        path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)

    out = F.concat(
        F.when(has_scheme, F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        hostport_norm,
        path_norm,
    )
    out = F.when(qs_norm != "", F.concat(out, F.lit("?"), qs_norm)).otherwise(out)
    # RFC-invalid input (spaces, bad escapes, '|' — ubiquitous in crawl
    # data) parses to all-NULL components; canonicalizing it to '://'
    # would collapse EVERY malformed URL onto one dedup key (review fix:
    # mass false dedup). Best effort = leave it untouched; an
    # unparseable string is already its own canonical form.
    return F.when(
        host_probe.isNull() | (host_probe == ""), u
    ).otherwise(out)
