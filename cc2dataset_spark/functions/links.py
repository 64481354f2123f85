"""Link-extraction operators P1-P13 (SURVEY.md §2.2) as declarative
Column expressions over exploded WAT link structs.

Reference semantics: /root/reference/cc2dataset/main.py:23-131 (predicates
and projections), main.py:104-114 (absolutization), main.py:157-164 (base
URL), main.py:166-176 (scheme filter, uid, provenance). Everything is a
JVM-side expression except RFC-3986 ``urljoin``, which has no Spark
built-in and is the pipeline's one Python (pandas/Arrow) UDF — and it is
only ever applied to the minority of rows whose URL is relative, via a
split/union plan rather than a per-row conditional (a Python UDF inside
``when()`` would still be evaluated for every row by BatchEvalPython).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

VIDEO_EXTS = (".avi", ".mp4", ".mkv", ".webm", ".mov", ".mpg", ".mpeg", ".m4v")
AUDIO_EXTS = (".ogg", ".wav", ".mp3", ".flac", ".m4a")
TEXT_EXTS = (
    "pdf", "epub", "djvu", "mobi", "doc", "docx", "rtf", "txt",
    "odt", "ppt", "pptx", "pages", "keynote", "wps", "md",
)

DOCUMENT_TYPES = ("image", "image_only", "audio", "text", "video")


def _url() -> Column:
    # reference uses link.get("url", "") — null behaves as empty string
    return F.coalesce(F.col("link.url"), F.lit(""))


def _ends_with_any(col: Column, exts: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for ext in exts:
        out = out | col.endswith(ext)
    return out


def valid_video_link() -> Column:
    """P1 — url ends with a video extension (main.py:23-27)."""
    return _ends_with_any(_url(), VIDEO_EXTS)


def valid_audio_link() -> Column:
    """P3 — url ends with an audio extension (main.py:70-72)."""
    return _ends_with_any(_url(), AUDIO_EXTS)


def valid_text_link() -> Column:
    """P2 — last '.'-segment in the text-extension set, >=2 segments
    (main.py:56-62)."""
    splits = F.split(_url(), r"\.")
    return (F.size(splits) >= 2) & F.element_at(splits, -1).isin(*TEXT_EXTS)


def valid_image_link() -> Column:
    """P4 — DOM path IMG@/src with non-empty alt (main.py:81-84)."""
    return (F.coalesce(F.col("link.path"), F.lit("")) == "IMG@/src") & (
        F.length(F.coalesce(F.col("link.alt"), F.lit(""))) > 0
    )


def valid_image_only_link() -> Column:
    """P5 — DOM path IMG@/src, empty alt allowed (main.py:93-95)."""
    return F.coalesce(F.col("link.path"), F.lit("")) == "IMG@/src"


# P8 dispatch: document_type -> (predicate, alt projection). Image types
# take link.alt; audio/video/text take link.text (main.py:31,66,77,89,100).
_DISPATCH = {
    "image": (valid_image_link, lambda: F.coalesce(F.col("link.alt"), F.lit(""))),
    "image_only": (
        valid_image_only_link,
        lambda: F.coalesce(F.col("link.alt"), F.lit("")),
    ),
    "audio": (valid_audio_link, lambda: F.coalesce(F.col("link.text"), F.lit(""))),
    "text": (valid_text_link, lambda: F.coalesce(F.col("link.text"), F.lit(""))),
    "video": (valid_video_link, lambda: F.coalesce(F.col("link.text"), F.lit(""))),
}


def link_predicate(document_type: str) -> Column:
    """P8 — predicate for a document type (main.py:117-131)."""
    if document_type not in _DISPATCH:
        raise ValueError(f"Unknown document type {document_type}")
    return _DISPATCH[document_type][0]()


def link_alt(document_type: str) -> Column:
    """P6/P7 — caption projection for a document type."""
    if document_type not in _DISPATCH:
        raise ValueError(f"Unknown document type {document_type}")
    return _DISPATCH[document_type][1]()


@pandas_udf(StringType())
def urljoin_udf(base: pd.Series, url: pd.Series) -> pd.Series:
    """P10 — RFC-3986 resolution, byte-identical to Python's urljoin
    (main.py:104-110: ValueError -> passthrough). Arrow-vectorized."""
    from urllib.parse import urljoin

    def join(b, u):
        if u is None:
            return u
        if u.startswith("http://") or u.startswith("https://"):
            return u
        try:
            return urljoin(b or "", u)
        except ValueError:
            return u

    return pd.Series([join(b, u) for b, u in zip(base, url)])


@pandas_udf(StringType())
def resolve_base_udf(page_url: pd.Series, base_raw: pd.Series) -> pd.Series:
    """Base-URL computation (main.py:157-164): base = urljoin(page_url,
    Head.Base), but a malformed <base href> (ValueError) keeps the PAGE
    url as base — the reference's `except ValueError: pass` — not the
    raw Base string. No absolute-scheme shortcut here: the reference
    calls urljoin directly for base resolution, so e.g. an invalid
    'http://[' base raises and falls back to the page url."""
    from urllib.parse import urljoin

    def resolve(page, base):
        if base is None:
            return page
        try:
            return urljoin(page or "", base)
        except ValueError:
            return page

    return pd.Series([resolve(p, b) for p, b in zip(page_url, base_raw)])


def absolutize_urls(df: DataFrame, url: str = "url", base: str = "base_url") -> DataFrame:
    """Resolve relative URLs against a base column.

    Split/union plan: rows already absolute pass through untouched
    (pure JVM filter); only relative rows cross the Python boundary.
    Narrow transformations only — no shuffle is introduced.
    """
    # coalesce(false): a NULL url makes BOTH startswith branches NULL,
    # and two complementary where()s would each drop the row — the row
    # must instead take the relative branch, whose urljoin_udf handles
    # None explicitly (passthrough), matching the reference's behavior
    is_abs = F.coalesce(
        F.col(url).startswith("http://")
        | F.col(url).startswith("https://"),
        F.lit(False),
    )
    absolute = df.where(is_abs)
    relative = df.where(~is_abs).withColumn(
        url, urljoin_udf(F.col(base), F.col(url))
    )
    return absolute.unionByName(relative)


def uid_column(alt: str = "alt", url: str = "url") -> Column:
    """P12 — uid = md5(alt || url), byte-identical to
    hashlib.md5((alt+url).encode()).hexdigest() (main.py:174)."""
    return F.md5(F.concat(F.col(alt), F.col(url)))


def normalize_url(col: Column | str) -> Column:
    """Canonicalize a URL for dedup: drop the fragment, lowercase the
    scheme+host (authority), strip default ports (:443 for https, :80
    for http), and remove utm_* tracking query parameters (cleaning up
    any dangling '?'/'&'). Path and non-tracking query params keep
    their case and order — they are semantically significant.

    utm-stripping is scoped to the query string only: the rest of the
    URL is split at the first '?' and the strip pattern anchors each
    tracking param to its own '[?&]' delimiter, so 'utm_' occurring in
    the path ('/utm_banner.png') or inside a longer param name
    ('xutm_source=1') is never touched, and a stripped leading
    '?utm_...' repairs the following '&' back to '?'.

    Pure codegen regex chain; every pattern is RE2-simple and valid
    verbatim in DuckDB (the oracle replays the identical sequence), so
    normalized-URL dedup is SQL-checkable end to end. This is the
    canonicalization the reference's md5(alt+url) uid implicitly
    skips — cc_dedup_normalized_url measures exactly how many uid
    duplicates it would have merged."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, r"#.*$", "")
    prefix = F.regexp_extract(
        no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1
    )
    rest = F.substr(no_frag, F.length(prefix) + F.lit(1))
    p = F.lower(prefix)
    p = (
        F.when(p.startswith("https://"), F.regexp_replace(p, r":443$", ""))
        .when(p.startswith("http://"), F.regexp_replace(p, r":80$", ""))
        .otherwise(p)
    )
    # Split at the first '?': utm params can only live in the query.
    path_part = F.regexp_extract(rest, r"^([^?]*)", 1)
    q = F.substr(rest, F.length(path_part) + F.lit(1))
    # Each param is anchored to its own delimiter, so consecutive
    # utm params each match (one non-overlapping pass sees both the
    # leading '?utm_' and every '&utm_') and 'xutm_source' never does.
    # Only the string-LEADING '?' is a delimiter: a literal '?' inside
    # a param value ('?a=1?utm_x=2' — the tail is part of a's value,
    # RFC 3986 allows raw '?' in queries) must not start a match, so
    # the alternation is (^\?|&), not [?&]. Inside the query slice '&'
    # is always a delimiter, so '[^&#]' safely eats a value containing
    # a literal '?'.
    q = F.regexp_replace(q, r"(^\?|&)utm_[^&#]*", "")
    q = F.regexp_replace(q, r"^&", "?")
    q = F.regexp_replace(q, r"\?&", "?")
    q = F.regexp_replace(q, r"[?&]$", "")
    return F.concat(p, path_part, q)


# Two-label public suffixes recognized by registrable_domain. A full
# Public Suffix List is ~10k entries and changes monthly — production
# swaps this tuple for a broadcast of the PSL file; the extraction
# logic (and its DuckDB twin in cc_domain_stats' oracle) is unchanged.
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.za", "co.nz",
)


def registrable_domain(col: Column | str) -> Column:
    """eTLD+1-style registrable domain of a URL — the per-domain
    aggregation key of C4/RefinedWeb-style curation (domain blocklists,
    per-domain caps, domain quality priors). Lowercased host (no port,
    no userinfo-free schemes assumed), then the last TWO labels —
    except when those two labels form a known two-label public suffix
    (co.uk, com.au, ...), where the last THREE labels are registrable.
    Hosts with fewer labels than that pass through whole; a trailing
    root dot is stripped. A relative URL (no authority) yields '';
    NULL propagates (standard SQL null semantics).

    Pure codegen: one regexp_extract for the host, array slicing from
    the end for the label take — no UDF, and every step has a verbatim
    DuckDB twin (string_split + negative list_slice), so per-domain
    stats are SQL-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#@]*@)?([^/:?#]+)", 2)
    )
    host = F.regexp_replace(host, r"\.$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_2suffix = last2.isin(*TWO_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_2suffix & (n >= 3), last3)
        .otherwise(last2)
    )
