"""URL canonicalization for web-scale text pipelines — pure JVM expressions.

Deduplicating a crawl starts with a canonical URL key: scheme/host case,
default ports, `www.` prefixes, tracking parameters and fragments all create
spurious distinct keys.  Everything here is built from `regexp_replace` /
`regexp_extract` / string builtins so the whole chain stays inside
whole-stage codegen — no UDF, no Python, safe in the 100 TB hot path.

Rules (each a small, separately testable step):
  1. strip the fragment (`#...`);
  2. lowercase the scheme and the host[:port] (path/query case preserved);
  3. drop default ports (`:80` for http, `:443` for https);
  4. drop a leading `www.` host label;
  5. remove tracking query parameters (`utm_*`, `fbclid`, `gclid`),
     removing the `?` itself when nothing is left.

The same rules are mirrored in the DuckDB oracle SQL (plans/queries.py) so
the operator is verified end-to-end, not just exercised.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a tracking parameter, as `name=value` with no  & / #  inside the value
_TRACK = r"(?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*"


def strip_fragment(url: Column) -> Column:
    return F.regexp_replace(url, r"#.*$", "")


def lower_scheme_host(url: Column) -> Column:
    """Lowercase `scheme://host[:port]`, leave the rest untouched."""
    head = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(url, F.length(head) + 1, F.length(url))
    return F.concat(F.lower(head), rest)


def drop_default_port(url: Column) -> Column:
    # no lookaheads anywhere in this module: the DuckDB oracle mirrors these
    # patterns and RE2 has no lookaround — capture the follower instead
    url = F.regexp_replace(url, r"^(http://[^/?#:]*):80($|[/?#])", r"$1$2")
    return F.regexp_replace(url, r"^(https://[^/?#:]*):443($|[/?#])", r"$1$2")


def drop_www(url: Column) -> Column:
    return F.regexp_replace(url, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")


def drop_tracking_params(url: Column) -> Column:
    # interior param (something follows): take the trailing & with it
    url = F.regexp_replace(url, _TRACK + r"&", "")
    # final param: take the preceding ? or & with it (fragment is already
    # stripped at this point in the chain, so end-of-string suffices)
    url = F.regexp_replace(url, r"[?&]" + _TRACK + r"$", "")
    # ?& left when the first (removed) param had survivors after it
    return F.regexp_replace(url, r"\?&", "?")


def normalize_url(url: Column) -> Column:
    """Full canonicalization chain — one nested codegen'd expression."""
    return drop_tracking_params(
        drop_www(drop_default_port(lower_scheme_host(strip_fragment(url))))
    )


def url_host(url_norm: Column) -> Column:
    """Host (no port) of an already-normalized URL."""
    return F.regexp_extract(url_norm, r"^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)
