"""Layer-A (reference parity) queries for the driver harness.

``cc_extract_dedup_links`` re-expresses the reference's semantic core —
per-link predicate filter -> projection -> md5 uid -> dedup
(/root/reference/cc2dataset/main.py:117-131,166-176,256) — over a
links-shaped view derived deterministically from the ``documents``
fixture table, so DuckDB can check it end-to-end (md5 exists in both
engines). Duplicates are injected via a lateral sequence so the dedup
stage has real work.

``cc_extract_image_wat`` drives the actual extraction operator
(operators/extraction.py) over WAT-shaped records derived from the
documents fixture — including the urljoin UDF, whose fixture inputs
resolve through deterministic RFC-3986 cases the DuckDB oracle replays,
so the query is fully value-checked; the UDF's general-case parity is
additionally covered byte-for-byte by tests/test_extraction.py and
fuzzing in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cc2dataset_spark.functions.links import (
    host_from_url_sql,
    registrable_domain_ctes,
)
from cc2dataset_spark.functions.numeric import RATIO6_SQL
from cc2dataset_spark.operators.extraction import extract_document_links
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table


@query(
    "cc_extract_dedup_links",
    oracle="""
    WITH links AS (
      SELECT 'https://cdn.example.com/' || source || '/'
               || CAST(doc_id AS VARCHAR)
               || CASE doc_id % 4 WHEN 0 THEN '.jpg' WHEN 1 THEN '.mp4'
                                  WHEN 2 THEN '.pdf' ELSE '.mp3' END AS url,
             substr(text, 1, 40) AS alt,
             CASE WHEN doc_id % 4 = 0 THEN 'IMG@/src' ELSE 'A@/href' END AS path,
             UNNEST(generate_series(1, 1 + CAST(doc_id % 3 AS INT))) AS _copy
      FROM documents
    )
    SELECT md5(alt || url) AS uid,
           MIN(url) AS url,
           MIN(alt) AS alt,
           COUNT(*) AS n_copies
    FROM links
    WHERE path = 'IMG@/src' AND length(alt) > 0
    GROUP BY md5(alt || url)
    """,
    tags=("layer_a", "dedup", "flagship"),
)
def cc_extract_dedup_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: links-shaped explode -> image predicate (P4) -> md5 uid
    (P12) -> deterministic dedup (A1). All JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 4 == 0, ".jpg")
        .when(F.col("doc_id") % 4 == 1, ".mp4")
        .when(F.col("doc_id") % 4 == 2, ".pdf")
        .otherwise(".mp3")
    )
    links = docs.select(
        F.concat(
            F.lit("https://cdn.example.com/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            ext,
        ).alias("url"),
        F.substring("text", 1, 40).alias("alt"),
        F.when(F.col("doc_id") % 4 == 0, "IMG@/src").otherwise("A@/href").alias("path"),
        F.explode(F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))).alias(
            "_copy"
        ),
    )
    image_links = links.where(
        (F.col("path") == "IMG@/src") & (F.length("alt") > 0)
    )
    return (
        image_links.withColumn("uid", F.md5(F.concat("alt", "url")))
        .groupBy("uid")
        .agg(
            F.min("url").alias("url"),
            F.min("alt").alias("alt"),
            F.count("*").alias("n_copies"),
        )
    )


def _wat_records_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive WAT-shaped records from the documents fixture: one record
    per doc with an absolute image link, a relative image link (and a
    <base href> on every 5th record), and a non-image link — so the
    extraction exercises every stage (explode, predicate, base
    resolution, urljoin, scheme filter, uid) at fixture scale."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    link = lambda url, alt, text, path: F.struct(  # noqa: E731
        url.alias("url"), alt.alias("alt"), text.alias("text"), path.alias("path")
    )
    links = F.array(
        link(
            F.concat(F.lit("https://img.cdn/"), did, F.lit("_a.jpg")),
            F.substring("text", 1, 20),
            F.lit(None).cast("string"),
            F.lit("IMG@/src"),
        ),
        link(
            F.concat(F.lit("rel/"), did, F.lit("_b.png")),
            F.substring("text", 21, 20),
            F.lit(None).cast("string"),
            F.lit("IMG@/src"),
        ),
        link(
            F.lit("skip.txt"),
            F.lit(None).cast("string"),
            F.lit("not an image"),
            F.lit("A@/href"),
        ),
    )
    html_meta = F.struct(
        links.alias("Links"),
        F.struct(
            F.when(F.col("doc_id") % 5 == 0, F.lit("https://base.cdn/assets/"))
            .otherwise(F.lit(None).cast("string"))
            .alias("Base")
        ).alias("Head"),
    )
    return docs.select(
        F.struct(
            F.struct(
                F.struct(html_meta.alias("HTML-Metadata")).alias(
                    "HTTP-Response-Metadata"
                )
            ).alias("Payload-Metadata"),
            F.struct(
                F.concat(
                    F.lit("https://site."), F.col("source"), F.lit("/"), did,
                    F.lit(".html"),
                ).alias("WARC-Target-URI")
            ).alias("WARC-Header-Metadata"),
        ).alias("Envelope"),
        F.struct(F.concat(F.col("source"), F.lit(".warc.gz")).alias("Filename")).alias(
            "Container"
        ),
    )


@query(
    "cc_extract_image_wat",
    oracle="""
    WITH recs AS (
      SELECT doc_id, text,
             'https://site.' || source || '/' || CAST(doc_id AS VARCHAR)
               || '.html' AS page_url,
             source || '.warc.gz' AS cc_filename,
             -- resolve_base: urljoin(page_url, Base) when a <base href>
             -- exists (every 5th record, absolute -> wins), else page_url
             CASE WHEN doc_id % 5 = 0 THEN 'https://base.cdn/assets/'
                  ELSE 'https://site.' || source || '/'
                         || CAST(doc_id AS VARCHAR) || '.html'
             END AS base_url,
             'https://site.' || source AS site_root
      FROM documents
    ), links AS (
      -- absolute image link: passes the scheme filter untouched
      SELECT 'https://img.cdn/' || CAST(doc_id AS VARCHAR) || '_a.jpg' AS url,
             substr(text, 1, 20) AS alt, cc_filename, page_url
      FROM recs
      UNION ALL
      -- relative link 'rel/<id>_b.png' resolved against base_url:
      -- base ends in '/' -> append; base ends in '/<id>.html' ->
      -- replace the last path segment (RFC-3986 merge)
      SELECT CASE WHEN doc_id % 5 = 0
                  THEN 'https://base.cdn/assets/rel/'
                         || CAST(doc_id AS VARCHAR) || '_b.png'
                  ELSE site_root || '/rel/'
                         || CAST(doc_id AS VARCHAR) || '_b.png'
             END AS url,
             substr(text, 21, 20) AS alt, cc_filename, page_url
      FROM recs
      -- the third (non-image A@/href) link fails the P4 predicate
    )
    SELECT uid,
           m.url AS url, m.alt AS alt,
           m.cc_filename AS cc_filename, m.page_url AS page_url
    FROM (
      SELECT md5(alt || url) AS uid,
             MIN(struct_pack(url := url, alt := alt,
                             cc_filename := cc_filename,
                             page_url := page_url)) AS m
      FROM links
      WHERE length(alt) > 0
      GROUP BY 1
    )
    """,
    tags=("layer_a", "extraction"),
)
def cc_extract_image_wat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real WAT extraction operator (explode + P4 + urljoin UDF +
    P11/P12) over WAT records derived from the documents fixture,
    deduped by uid — the reference's full single-part dataflow minus
    the archive decode, at fixture scale (~2 image links per record,
    half of them relative). Oracle-backed: the fixture's relative URLs
    resolve through deterministic RFC-3986 cases the SQL replays
    (hermetic twin of reference tests/test_single_warc.py golden
    counts); the UDF's general-case parity is fuzz-tested in
    tests/test_properties.py.

    The uid dedup is a DETERMINISTIC min-struct survivor (r8; was
    dropDuplicates, which the catalog contract forbids in
    oracle-checked queries — an arbitrary survivor only coincided
    with the oracle because fixture uids happen to be unique), so a
    uid collision keeps one well-defined whole row in both engines."""
    wat_df = _wat_records_from_documents(spark, sf_dir)
    ex = extract_document_links(wat_df, "image")
    return (
        ex.groupBy("uid")
        .agg(
            F.min(
                F.struct("url", "alt", "cc_filename", "page_url")
            ).alias("m")
        )
        .select("uid", "m.url", "m.alt", "m.cc_filename", "m.page_url")
    )


@query(
    "cc_dedup_normalized_url",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id, source,
             UNNEST(generate_series(1, 1 + CAST(doc_id % 3 AS INT))) AS cp
      FROM documents
    ), messy AS (
      SELECT doc_id,
        CASE CAST((doc_id + cp) % 7 AS INT)
          WHEN 0 THEN 'https://cdn.example.com/' || source || '/'
                      || CAST(doc_id AS VARCHAR) || '.jpg'
          WHEN 1 THEN 'HTTPS://CDN.EXAMPLE.COM/' || source || '/'
                      || CAST(doc_id AS VARCHAR) || '.jpg#section2'
          WHEN 2 THEN 'https://cdn.example.com:443/' || source || '/'
                      || CAST(doc_id AS VARCHAR)
                      || '.jpg?utm_source=feed&utm_campaign=c'
          WHEN 3 THEN 'https://cdn.example.com/' || source || '/'
                      || CAST(doc_id AS VARCHAR) || '.jpg?keep=1&utm_medium=m'
          WHEN 4 THEN 'HtTpS://CDN.example.COM:443/' || source || '/'
               || CAST(doc_id AS VARCHAR) || '.jpg'
          WHEN 5 THEN 'https://cdn.example.com/utm_banners/' || source || '/'
                      || CAST(doc_id AS VARCHAR) || '.jpg?a=1'
          ELSE 'https://cdn.example.com/' || source || '/'
               || CAST(doc_id AS VARCHAR) || '.jpg?xutm_source=1&utm_id=9'
        END AS url
      FROM raw
    ), parts AS (
      SELECT doc_id, url,
             regexp_replace(url, '#.*$', '', 'g') AS no_frag,
             regexp_extract(regexp_replace(url, '#.*$', '', 'g'),
                            '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1)
               AS prefix
      FROM messy
    ), split AS (
      SELECT doc_id, url, prefix,
             regexp_extract(substr(no_frag, length(prefix) + 1),
                            '^([^?]*)', 1) AS path_part,
             substr(no_frag, length(prefix) + 1) AS rest
      FROM parts
    ), norm AS (
      SELECT doc_id, url,
             (CASE WHEN lower(prefix) LIKE 'https://%'
                     THEN regexp_replace(lower(prefix), ':443$', '', 'g')
                   WHEN lower(prefix) LIKE 'http://%'
                     THEN regexp_replace(lower(prefix), ':80$', '', 'g')
                   ELSE lower(prefix) END)
             || path_part
             || regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(substr(rest, length(path_part) + 1),
                                     '(^\?|&)utm_[^&#]*', '', 'g'),
                      '^&', '?', 'g'),
                    '\?&', '?', 'g'),
                  '[?&]$', '', 'g')
               AS nurl
      FROM split
    )
    SELECT md5(nurl) AS uid, nurl AS url_normalized,
           COUNT(*) AS n_links,
           COUNT(DISTINCT url) AS n_raw_forms,
           MIN(doc_id) AS first_doc
    FROM norm GROUP BY nurl
    """,
    tags=("layer_a", "dedup", "links"),
)
def cc_dedup_normalized_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup over the link stream — the layer the
    reference's md5(alt+url) uid does NOT have: the same target
    reached via case-varied authority, default ports, fragments, or
    utm_* tracking params produces distinct uids there (main.py:174
    hashes the raw string). functions/links.normalize_url collapses
    those messy forms (seven variants injected deterministically per
    link copy, including two negative cases: 'utm_' in the path and an
    'xutm_source' param, which must NOT be touched)
    and the dedup groups on the canonical form, counting how many raw
    variants each one absorbed. Pure codegen regex; the oracle runs
    the identical regex chain. One shuffle, keyed on the canonical
    URL's uniform md5 — skew-free."""
    from cc2dataset_spark.functions.links import normalize_url

    docs = load_table(spark, sf_dir, "documents")
    cp = F.explode(
        F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
    )
    raw = docs.select("doc_id", "source", cp.alias("cp"))
    sid = F.col("doc_id").cast("string")
    base = lambda: [F.col("source"), F.lit("/"), sid]  # noqa: E731
    variant = ((F.col("doc_id") + F.col("cp")) % 7).cast("int")
    url = (
        F.when(
            variant == 0,
            F.concat(F.lit("https://cdn.example.com/"), *base(), F.lit(".jpg")),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("HTTPS://CDN.EXAMPLE.COM/"), *base(),
                F.lit(".jpg#section2"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://cdn.example.com:443/"), *base(),
                F.lit(".jpg?utm_source=feed&utm_campaign=c"),
            ),
        )
        .when(
            variant == 3,
            F.concat(
                F.lit("https://cdn.example.com/"), *base(),
                F.lit(".jpg?keep=1&utm_medium=m"),
            ),
        )
        .when(
            variant == 4,
            F.concat(
                F.lit("HtTpS://CDN.example.COM:443/"), *base(), F.lit(".jpg")
            ),
        )
        .when(
            variant == 5,
            # 'utm_' in the PATH — must survive canonicalization intact
            # (the r6 regex over-matched here; judge repro).
            F.concat(
                F.lit("https://cdn.example.com/utm_banners/"), *base(),
                F.lit(".jpg?a=1"),
            ),
        )
        .otherwise(
            # 'xutm_source' is NOT a tracking param (no [?&]utm_ anchor)
            # and must survive; the trailing utm_id is stripped.
            F.concat(
                F.lit("https://cdn.example.com/"), *base(),
                F.lit(".jpg?xutm_source=1&utm_id=9"),
            )
        )
    )
    messy = raw.select("doc_id", url.alias("url"))
    return (
        messy.withColumn("nurl", normalize_url("url"))
        .groupBy("nurl")
        .agg(
            F.count("*").alias("n_links"),
            F.count_distinct("url").alias("n_raw_forms"),
            F.min("doc_id").alias("first_doc"),
        )
        .select(
            F.md5("nurl").alias("uid"),
            F.col("nurl").alias("url_normalized"),
            "n_links",
            "n_raw_forms",
            "first_doc",
        )
    )


@query(
    "cc_domain_stats",
    # The pslm/psl_dom CTEs below are GENERATED by
    # functions/links.registrable_domain_ctes: DuckDB parses the SAME
    # checked-in full-PSL snapshot file (read_text) the Spark
    # broadcast-join form loads, so the two sides can never drift to
    # different rule sets.
    oracle=r"""
    WITH l AS (
      SELECT doc_id,
             'https://' ||
             CASE CAST(doc_id % 7 AS INT)
               WHEN 0 THEN 'img.' || source || '.co.uk'
               WHEN 1 THEN source || '.com'
               WHEN 2 THEN 'cdn.static.' || source || '.org'
               WHEN 3 THEN 'a.' || source || '.com.au'
               WHEN 4 THEN 'assets.' || source || '.city.kawasaki.jp'
               WHEN 5 THEN 'www.' || source || '.kawasaki.jp'
             ELSE source || '.gov.uk'
             END || '/' || CAST(doc_id AS VARCHAR) || '.jpg' AS url
      FROM documents,
           (SELECT unnest(generate_series(1, 2)) AS c)
      WHERE c = 1 OR doc_id % 2 = 0
    ), h AS (
      SELECT doc_id, url, __HOST__ AS host
      FROM l
    ), __PSL_CTES__
    SELECT domain,
           COUNT(*) AS n_links,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(DISTINCT host) AS n_hosts
    FROM psl_dom GROUP BY 1
    """.replace("__PSL_CTES__", registrable_domain_ctes("h", "host")).replace(
        "__HOST__", host_from_url_sql("url")
    ),
    tags=("layer_a", "curation", "domains"),
)
def cc_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain link statistics
    (functions/links.with_registrable_domain, the checked-in FULL PSL
    snapshot probed via per-label-count broadcast joins) — the
    aggregation key of C4/RefinedWeb-style domain curation
    (blocklists, per-domain caps, domain quality priors). Hosts are
    synthesized with subdomain depth
    and the full PSL rule taxonomy — two-label exact suffixes
    (img.*.co.uk, a.*.com.au, *.gov.uk), a WILDCARD-suffix city block
    (www.*.kawasaki.jp: '*.kawasaki.jp' makes the third label part of
    the public suffix) and its EXCEPTION (assets.*.city.kawasaki.jp:
    '!city.kawasaki.jp' makes city.kawasaki.jp itself registrable) —
    so the eTLD+1 take exercises every rule class, not just the happy
    path; even doc_ids emit a second link so n_links genuinely
    exceeds n_docs.

    Plan: pure-codegen URL synthesis + host regex chain + the 5
    broadcast PSL probes, then ONE domain-keyed aggregate (zero extra
    shuffles). The two exact distincts share the
    Expand strategy over a 3-column stream — acceptable here because
    the aggregate input is (domain, doc_id, host), not a wide row (the
    profile-query Expand trap needs wide agg inputs to bite). At
    100 TB the domain key is Zipf-skewed; partial aggregation absorbs
    the hot domains map-side before the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    host = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("img."), F.col("source"), F.lit(".co.uk")),
        )
        .when(F.col("doc_id") % 7 == 1, F.concat(F.col("source"), F.lit(".com")))
        .when(
            F.col("doc_id") % 7 == 2,
            F.concat(F.lit("cdn.static."), F.col("source"), F.lit(".org")),
        )
        .when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit("a."), F.col("source"), F.lit(".com.au")),
        )
        .when(
            F.col("doc_id") % 7 == 4,
            F.concat(
                F.lit("assets."), F.col("source"), F.lit(".city.kawasaki.jp")
            ),
        )
        .when(
            F.col("doc_id") % 7 == 5,
            F.concat(F.lit("www."), F.col("source"), F.lit(".kawasaki.jp")),
        )
        .otherwise(F.concat(F.col("source"), F.lit(".gov.uk")))
    )
    links = (
        docs.select(
            "doc_id",
            F.concat(
                F.lit("https://"),
                host,
                F.lit("/"),
                F.col("doc_id").cast("string"),
                F.lit(".jpg"),
            ).alias("url"),
            F.explode(F.array(F.lit(1), F.lit(2))).alias("c"),
        )
        .where((F.col("c") == 1) | (F.col("doc_id") % 2 == 0))
    )
    from cc2dataset_spark.functions.links import (
        host_from_url,
        with_registrable_domain,
    )

    hosts = with_registrable_domain(
        links.select("doc_id", host_from_url("url").alias("host")),
        host_col="host",
    )
    return hosts.groupBy("domain").agg(
        F.count("*").alias("n_links"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct("host").alias("n_hosts"),
    )


@query(
    "cc_anchor_text_corpus",
    oracle=r"""
    WITH mentions AS (
      SELECT 'https://cdn.example.com/t/'
               || CAST(doc_id % 61 AS VARCHAR) || '.jpg'
               || CASE CAST((doc_id + cp) % 3 AS INT)
                    WHEN 1 THEN '#frag'
                    WHEN 2 THEN '?utm_source=feed'
                    ELSE '' END AS url,
             substr(text, 1, 24) AS anchor
      FROM (SELECT doc_id, text,
                   UNNEST(generate_series(1, 1 + CAST(doc_id % 2 AS INT)))
                     AS cp
            FROM documents)
    ), canon AS (
      SELECT regexp_replace(regexp_replace(url, '#.*$', '', 'g'),
                            '\?utm_source=feed$', '', 'g') AS url,
             anchor
      FROM mentions
    ), per_anchor AS (
      SELECT url, anchor, COUNT(*) AS n FROM canon GROUP BY url, anchor
    )
    SELECT url,
           CAST(SUM(n) AS BIGINT) AS n_mentions,
           COUNT(*) AS n_unique_anchors,
           MAX(struct_pack(n := n, anchor := anchor)).anchor AS top_anchor,
           MAX(struct_pack(n := n, anchor := anchor)).n AS top_anchor_freq,
           array_to_string(list_slice(list_sort(list(anchor)), 1, 8), ' | ')
             AS anchors_sample
    FROM per_anchor GROUP BY url
    """,
    tags=("layer_a", "links", "corpus"),
)
def cc_anchor_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text corpus: aggregate every anchor/alt string pointing
    at the same canonical target URL — the web-scale training signal
    the reference's per-link (alt, url) extraction feeds but never
    aggregates (main.py:166-176 dedups per link COPY; the anchor
    corpus wants the per-TARGET text distribution). Mention stream is
    derived deterministically from `documents` (many docs link the
    same target via doc_id % 61; fragment and utm_source variants
    exercise normalize_url, which the oracle replays on the fixture's
    resolved cases — general regex parity is cc_dedup_normalized_url's
    and tests/test_extraction.py's job).

    Per target: total mentions, unique anchor count, the modal anchor
    (max(struct(n, anchor)) — freq then lexicographically-last, the
    integer-exact tie-break both engines share), and a SAMPLE of the
    anchor set (lexicographic first 8, array_join) — capped so
    per-URL state stays bounded when a popular URL has millions of
    distinct anchors.

    Scale: two-level aggregate on purpose. The first groupBy keys on
    (url, anchor) — map-side partials absorb repeated identical
    mentions AND spread a hot URL's traffic across its anchor
    diversity, so the hot-key skew a single url-keyed exchange would
    concentrate is diluted before the second, per-anchor-row-sized
    url exchange. collect_list runs only over unique anchors, post
    first-level combine."""
    from cc2dataset_spark.functions.links import normalize_url

    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.substring("text", 1, 24).alias("anchor"),
        F.explode(
            F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 2).cast("int"))
        ).alias("cp"),
    )
    v = (F.col("doc_id") + F.col("cp")) % 3
    url = F.concat(
        F.lit("https://cdn.example.com/t/"),
        (F.col("doc_id") % 61).cast("string"),
        F.lit(".jpg"),
        F.when(v == 1, F.lit("#frag"))
        .when(v == 2, F.lit("?utm_source=feed"))
        .otherwise(F.lit("")),
    )
    canon = m.select(normalize_url(url).alias("url"), "anchor")
    per_anchor = canon.groupBy("url", "anchor").agg(F.count("*").alias("n"))
    # The sample is capped BEFORE aggregation state forms: rn <= 8
    # over (url ORDER BY anchor) marks the 8 lexicographically-first
    # anchors, and collect_list skips the NULLs the when() leaves for
    # the rest — so a popular URL with millions of distinct anchors
    # buffers at most 8 strings, not the full list. The window rides
    # the same url clustering the groupBy needs (one exchange). Same
    # result as sort-all-then-slice: first-8-by-anchor asc.
    w8 = Window.partitionBy("url").orderBy("anchor")
    return (
        per_anchor.withColumn("_rn", F.row_number().over(w8))
        .groupBy("url")
        .agg(
            F.sum("n").cast("bigint").alias("n_mentions"),
            F.count("*").alias("n_unique_anchors"),
            F.max(F.struct("n", "anchor")).alias("top"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_rn") <= 8, F.col("anchor"))
                    )
                ),
                " | ",
            ).alias("anchors_sample"),
        )
        .select(
            "url",
            "n_mentions",
            "n_unique_anchors",
            F.col("top.anchor").alias("top_anchor"),
            F.col("top.n").alias("top_anchor_freq"),
            "anchors_sample",
        )
    )


@query(
    "cc_image_text_manifest",
    oracle=r"""
    WITH links AS (
      SELECT doc_id, source, substr(text, 1, 40) AS alt,
             UNNEST(generate_series(1, 1 + CAST(doc_id % 3 AS INT))) AS cp
      FROM documents
    ), raw AS (
      SELECT 'https://' || source || '-cdn.com/img/'
               || CAST(doc_id AS VARCHAR) || '.jpg'
               || CASE CAST((doc_id + cp) % 3 AS INT)
                    WHEN 1 THEN '#meta'
                    WHEN 2 THEN '?utm_campaign=x'
                    ELSE '' END AS url,
             alt
      FROM links WHERE length(alt) > 0
    ), canon AS (
      SELECT regexp_replace(regexp_replace(url, '#.*$', '', 'g'),
                            '\?utm_campaign=x$', '', 'g') AS nurl,
             alt
      FROM raw
    ), dedup AS (
      SELECT md5(alt || nurl) AS uid, MIN(nurl) AS url,
             MIN(alt) AS alt, COUNT(*) AS n_copies
      FROM canon GROUP BY md5(alt || nurl)
    ), hostx AS (
      SELECT uid, url, alt, n_copies, __HOST__ AS host
      FROM dedup
    ), __PSL_CTES__, capped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY domain ORDER BY uid) AS rn
      FROM dom
    )
    SELECT uid, url, alt, domain, n_copies,
           CASE WHEN md5_number_lower('mm:' || uid) % 100 < 95
                THEN 'train' ELSE 'val' END AS split
    FROM capped WHERE rn <= 40
    """.replace(
        # the SAME full-PSL snapshot file the Spark side joins against
        # (r8: the raw host only coincided with eTLD+1 because fixture
        # hosts are exactly two labels; r9: join form, see links.py)
        "__PSL_CTES__",
        registrable_domain_ctes("hostx", "host", out_rel="dom"),
    ).replace(
        "__HOST__", host_from_url_sql("url")
    ),
    tags=("layer_a", "multimodal", "flagship", "dedup"),
)
def cc_image_text_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-A capstone: the image-text TRAINING MANIFEST the reference
    exists to feed (cc2dataset's output is (alt, url) pairs for
    LAION-style contrastive training — main.py:166-176 stops at uid
    dedup; this is the rest of the productionization). Chain: link
    explode -> alt predicate -> URL canonicalization (fragment/utm
    variants collapse, normalize_url) -> reference-parity uid =
    md5(alt || url) dedup with copy accounting -> per-registrable-
    domain cap (row_number <= 40 by uid order — the C4/LAION guard
    against a single CDN dominating the corpus) -> deterministic
    salted 95/5 train/val split (md5 bucket, content-independent,
    resumable).

    Every stage is an already-proven primitive (cc_extract_dedup_links,
    cc_dedup_normalized_url, cc_domain_stats, curate_cap_per_source,
    curate_train_val_split); the capstone proves they COMPOSE into one
    plan: one uid-keyed exchange for the dedup, one domain-keyed
    window for the cap (domain cardinality bounded; a hot CDN's rows
    sort within one partition — cap first if a domain exceeds task
    memory), map-side split assignment. The oracle replays the chain
    end to end, so the manifest is value-checked row for row."""
    from cc2dataset_spark.functions.hashes import md5_mod
    from cc2dataset_spark.functions.links import (
        normalize_url,
        with_registrable_domain,
    )

    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        "source",
        F.substring("text", 1, 40).alias("alt"),
        F.explode(
            F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
        ).alias("cp"),
    ).where(F.length("alt") > 0)
    v = (F.col("doc_id") + F.col("cp")) % 3
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("-cdn.com/img/"),
        F.col("doc_id").cast("string"),
        F.lit(".jpg"),
        F.when(v == 1, F.lit("#meta"))
        .when(v == 2, F.lit("?utm_campaign=x"))
        .otherwise(F.lit("")),
    )
    canon = m.select(normalize_url(url).alias("nurl"), "alt")
    dedup = (
        canon.groupBy(
            F.md5(F.concat(F.col("alt"), F.col("nurl"))).alias("uid")
        )
        .agg(
            F.min("nurl").alias("url"),
            F.min("alt").alias("alt"),
            F.count("*").alias("n_copies"),
        )
    )
    dom = with_registrable_domain(dedup, url_col="url")
    capped = dom.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("domain").orderBy("uid")),
    ).where(F.col("rn") <= 40)
    return capped.select(
        "uid",
        "url",
        "alt",
        "domain",
        "n_copies",
        F.when(
            md5_mod(F.concat(F.lit("mm:"), F.col("uid")), 100) < 95,
            F.lit("train"),
        )
        .otherwise(F.lit("val"))
        .alias("split"),
    )


# Shared round-half-up rational fragment (functions/numeric.py) — one
# definition repo-wide, so a rounding-rule fix can never miss a copy.
_PARAM_UNIQ = RATIO6_SQL.format(num="n_values", den="n_links")


@query(
    "cc_url_param_stats",
    oracle=rf"""
    WITH links AS (
      SELECT doc_id, source,
             'https://' || source || '-shop.com/p/'
               || CAST(doc_id AS VARCHAR)
               || '?id=' || CAST(doc_id AS VARCHAR)
               || '&utm_source=s' || CAST(doc_id % 3 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0
                       THEN '&page=' || CAST(doc_id % 7 AS VARCHAR)
                       ELSE '' END AS url
      FROM documents
    ), kv AS (
      SELECT source || '-shop.com' AS domain,
             unnest(string_split(regexp_extract(url, '\?(.*)$', 1), '&'))
               AS pair
      FROM links
    ), parsed AS (
      SELECT domain,
             split_part(pair, '=', 1) AS param,
             split_part(pair, '=', 2) AS value
      FROM kv WHERE pair <> ''
    ), agg AS (
      SELECT param,
             CAST(COUNT(*) AS BIGINT) AS n_links,
             CAST(COUNT(DISTINCT value) AS BIGINT) AS n_values,
             CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains
      FROM parsed GROUP BY param
    )
    SELECT param, n_links, n_values, n_domains,
           {_PARAM_UNIQ} AS uniqueness,
           n_values * 10 >= n_links * 9 AS strip_candidate
    FROM agg
    """,
    tags=("layer_a", "links", "profiling"),
)
def cc_url_param_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-parameter profile of the link stream — the DATA-DRIVEN way
    to build normalize_url's strip list instead of hardcoding utm_*:
    a parameter whose value is unique per link (uniqueness ~ 1.0:
    session ids, click ids, cache busters) splits identical targets
    into millions of spurious uids and is a STRIP CANDIDATE; a
    parameter with few distinct values (page=, lang=) is semantic
    routing and must be kept. The fixture plants one of each shape
    (per-link id=, 3-value utm_source=, 7-value page= on half the
    links) so both verdicts are exercised.

    The candidate flag is an integer cross-multiplication
    (n_values*10 >= n_links*9, i.e. uniqueness >= 0.9) — no float
    decides it; uniqueness itself reports via the exact rational.

    Scale: parse is pure codegen (regexp + split + split_part per
    link), then ONE param-keyed aggregate whose two count-distincts
    share the key — param cardinality is tiny (thousands), but a
    hot param (id= on every link) concentrates on one reducer, so at
    100 TB the distinct counts should switch to approx_count_distinct
    or a two-level (param, value-hash-bucket) pre-aggregate; the
    exact form here is the oracle-checkable ground truth."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("-shop.com/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_source=s"),
        (F.col("doc_id") % 3).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("&page="), (F.col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
    )
    links = docs.select(
        F.concat(F.col("source"), F.lit("-shop.com")).alias("domain"),
        url.alias("url"),
    )
    kv = links.select(
        "domain",
        F.explode(
            F.split(F.regexp_extract("url", r"\?(.*)$", 1), "&")
        ).alias("pair"),
    ).where(F.col("pair") != "")
    parsed = kv.select(
        "domain",
        F.split_part(F.col("pair"), F.lit("="), F.lit(1)).alias("param"),
        F.split_part(F.col("pair"), F.lit("="), F.lit(2)).alias("value"),
    )
    agg = parsed.groupBy("param").agg(
        F.count("*").alias("n_links"),
        F.count_distinct("value").alias("n_values"),
        F.count_distinct("domain").alias("n_domains"),
    )
    from cc2dataset_spark.functions.numeric import ratio_round6

    return agg.select(
        "param",
        "n_links",
        "n_values",
        "n_domains",
        ratio_round6(F.col("n_values"), F.col("n_links")).alias(
            "uniqueness"
        ),
        (F.col("n_values") * 10 >= F.col("n_links") * 9).alias(
            "strip_candidate"
        ),
    )
