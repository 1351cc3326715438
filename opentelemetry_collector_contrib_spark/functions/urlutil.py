"""URL canonicalization + host/domain extraction for web-crawl tables.

Web-scale training pipelines key dedup, per-site quality stats, and
domain blocklists on a CANONICAL url (C4 dedups per-URL; CCNet and
RefinedWeb aggregate per registrable domain).  The same page is crawled
as ``HTTP://Example.com:80/a/?utm_source=x&b=1#frag`` and
``http://example.com/a/?b=1`` — byte-level keys miss the equality.

Normalization applied (RFC 3986 §6 syntax-based normalization plus the
tracking-parameter strip every crawl pipeline adds):

- scheme and host lowercased (§6.2.2.1);
- default ports dropped (http:80, https:443 — §6.2.3);
- fragment removed (never sent to the server);
- tracking query parameters removed (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``ref``), remaining parameters SORTED byte-wise so
  param order never splits a key;
- trailing slashes collapsed ('' and '/' both canonicalize to '/').

Everything is JVM regexp/array expressions — one codegen'd map stage, no
UDF, no shuffle.  ``registrable_domain`` is the last-two-labels
approximation (the container has no Public Suffix List; co.uk-style
suffixes therefore collapse to the suffix — documented, acceptable for
aggregation keys, NOT for security decisions).

Reference framing: the collector's resource/attributes processors carry
``http.url`` / ``net.peer.name`` span attributes that exporters key on
(e.g. awsxray's MakeSegment URL fields) — this module is the analytics-
side canonical form of those keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page identity (analytics trackers)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)="


def _no_frag(url: Column) -> Column:
    return F.regexp_replace(url, "#.*", "")


def url_parts(url: Column) -> Column:
    """Struct column (scheme, host, port, path, query) — fragment dropped,
    scheme/host lowercased, port '' when absent.  No IPv6-literal
    support (square-bracket hosts are vanishingly rare in crawl data and
    parse as-is into ``host``)."""
    u = _no_frag(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # path+query = rest minus hostport prefix
    pq = F.substring(rest, F.length(hostport) + 1, F.lit(2147483647))
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(pq, r"^([^?]*)", 1)
    query = F.when(
        pq.contains("?"), F.regexp_replace(pq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string (see module docstring for the rules)."""
    p = url_parts(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(p["path"], "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(p["query"], "&"),
        lambda t: (t != "") & ~t.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def registrable_domain(host: Column) -> Column:
    """Last two DNS labels of the host ('example.com' from
    'a.b.example.com'); single-label hosts pass through.  PSL-free
    approximation — see module docstring."""
    return F.when(
        host.contains("."), F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    ).otherwise(host)


def canonicalize_url_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (RE2 patterns both sides)."""
    u = f"regexp_replace({url_expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pq = f"substr({rest}, length({hostport}) + 1)"
    host = f"lower(regexp_extract({hostport}, '^([^:]*)', 1))"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    default = (
        f"(({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443'))"
    )
    port_part = (
        f"CASE WHEN {port} = '' OR {default} THEN '' ELSE ':' || {port} END"
    )
    raw_path = f"regexp_extract({pq}, '^([^?]*)', 1)"
    path = (
        f"CASE WHEN regexp_replace({raw_path}, '/+$', '') = '' THEN '/'"
        f" ELSE regexp_replace({raw_path}, '/+$', '') END"
    )
    query = (
        f"CASE WHEN contains({pq}, '?')"
        f" THEN regexp_replace({pq}, '^[^?]*\\?', '') ELSE '' END"
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'),"
        f" t -> t <> '' AND NOT regexp_matches(t,"
        f" '{TRACKING_PARAM_RE}')))"
    )
    # array_to_string([]) is NULL in DuckDB (Spark's array_join gives '')
    qs = f"coalesce(array_to_string({params}, '&'), '')"
    return (
        f"{scheme} || '://' || {host} || {port_part} || {path} ||"
        f" CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END"
    )


def registrable_domain_sql(host_expr: str) -> str:
    return (
        f"CASE WHEN contains({host_expr}, '.')"
        f" THEN regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
        f" ELSE {host_expr} END"
    )


def host_sql(url_expr: str) -> str:
    """DuckDB twin of ``url_parts(url)['host']``."""
    u = f"regexp_replace({url_expr}, '#.*', '')"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    return f"lower(regexp_extract({hostport}, '^([^:]*)', 1))"
