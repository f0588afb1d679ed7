"""URL canonicalization and domain-level corpus operators — the
crawl-side twin of the content dedup family (a web corpus is deduped
by URL before anything touches the text: mirrors, tracking-tagged
relinks and fragment anchors all point at one page).

Everything here is pure codegen'd string/array expressions (regexes
kept to the Java∩RE2 subset — no lookaround, no backreferences — so
the DuckDB oracles evaluate the LITERAL same patterns):

- :func:`canonical_url` — lowercase scheme/host, strip userinfo,
  ``www.`` and default ports, drop the fragment, drop tracking query
  parameters (utm_* and the common click ids), sort the surviving
  parameters, normalize empty paths to ``/`` and strip trailing
  slashes. A non-URL (no ``scheme://`` match) canonicalizes to NULL —
  callers treat those rows as uncanonicalizable, never silently
  grouped together.
- :func:`registrable_domain` — the grouping key for per-site caps and
  stats. Without bundling the full Mozilla Public Suffix List, the
  rule is: last two host labels, or last three when the 2-label tail
  is a common multi-part public suffix (``co.uk``-style; the built-in
  set covers the high-traffic ccTLD patterns and callers pass
  ``extra_suffixes`` for the long tail).
- :func:`url_dedup` — one survivor per canonical URL (smallest id, or
  ``max_by(quality, -id)`` with ``quality_col``): the same single
  digest-keyed shuffle shape as ``dedup_exact``; URL-less rows are
  kept unconditionally.
- :func:`domain_stats` — per-registrable-domain doc/char totals and
  share-of-corpus permille: the table a crawl curator caps dominant
  sites from (compose with ``sampling.balanced_cap_sample`` on
  ``domain`` to enforce the cap).

Scale shape: canonicalization and domain extraction are map-only
projections; ``url_dedup`` shuffles (canonical-url, id[, quality])
longs/strings once — page text never moves; ``domain_stats`` is one
map-combined aggregate over domain keys.
"""

from __future__ import annotations
from energy_pandas_spark.util import track_cache

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "canonical_url",
    "registrable_domain",
    "url_domain",
    "url_dedup",
    "survivor_expr",
    "domain_stats",
    "extract_links",
    "domain_links",
    "link_degree_stats",
    "plan_fetch_waves",
    "TRACKING_PARAM_RE",
    "MULTIPART_SUFFIXES",
    "HREF_DQ_RE",
    "HREF_SQ_RE",
    "ANCHOR_DQ_RE",
    "ANCHOR_SQ_RE",
    "extract_anchor_texts",
    "anchor_text_summary",
]

# tracking / click-id query parameters dropped by canonicalization
# (the set every major crawler strips; anchored prefix match on the
# `name=` head of each parameter)
TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|gclid|fbclid|msclkid|yclid|igshid|mc_cid|mc_eid"
    r"|ref|ref_src|spm|_ga|_gl)="
)

# common multi-part public suffixes (a compact high-traffic subset of
# the Mozilla PSL; extend per-call with extra_suffixes)
MULTIPART_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "go.kr",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.in", "co.za", "co.nz", "co.id", "co.th",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#]*\?([^#]*)"
_HOST_OF_AUTH_RE = r"^(?:[^@]*@)?([^:]*)"
_PORT_OF_AUTH_RE = r":([0-9]+)$"


def canonical_url(url) -> Column:
    """Canonical form of ``url`` (see module docstring for the rules);
    NULL when the value does not parse as ``scheme://...``."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(auth, _HOST_OF_AUTH_RE, 1)),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(auth, _PORT_OF_AUTH_RE, 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )
    return F.when(
        (scheme == "") | (host == ""), F.lit(None).cast("string")
    ).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    )


def registrable_domain(
    host, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable (site-owner) domain of a hostname column: the last
    two labels, or three when the 2-label tail is a multi-part public
    suffix. Single-label hosts (``localhost``) pass through."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    last4 = F.concat_ws(
        ".",
        F.element_at(parts, -4),
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    suffixes = tuple(MULTIPART_SUFFIXES) + tuple(extra_suffixes)
    two_label = tuple(s for s in suffixes if s.count(".") == 1)
    three_label = tuple(s for s in suffixes if s.count(".") == 2)
    out = F.when(n <= 1, h)
    if three_label:
        out = out.when((n >= 4) & last3.isin(*three_label), last4)
    return out.when((n >= 3) & last2.isin(*two_label), last3).otherwise(
        last2
    )


def url_domain(url, extra_suffixes: tuple[str, ...] = ()) -> Column:
    """Registrable domain straight from a URL column (NULL for
    non-URLs)."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    # the SAME www-stripped host canonical_url builds — otherwise
    # url_dedup and domain_stats would group a www.<suffix> page
    # under different sites
    host = F.regexp_replace(
        F.lower(F.regexp_extract(auth, _HOST_OF_AUTH_RE, 1)),
        r"^www\.",
        "",
    )
    # isNull first: a NULL url must yield NULL, not the "" that
    # concat_ws over null parts would otherwise manufacture
    return F.when(
        host.isNull() | (host == ""), F.lit(None).cast("string")
    ).otherwise(registrable_domain(host, extra_suffixes))


def survivor_expr(id_col: str, quality_col: str | None = None) -> Column:
    """The dedup survivor aggregate: smallest id, or with
    ``quality_col`` the ``max_by((quality, -id))`` best-copy argmax
    (quality desc, id asc — total-order deterministic). Shared by the
    batch :func:`url_dedup` and the streaming URL ingest so the two
    paths cannot drift."""
    if quality_col:
        return F.max_by(
            F.col(id_col),
            F.struct(
                F.col(quality_col).alias("q"),
                (-F.col(id_col)).alias("ni"),
            ),
        ).alias(id_col)
    return F.min(id_col).alias(id_col)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One survivor per canonical URL: ``(canonical_url, survivor id,
    n_copies)``. Default survivor is the smallest id; with
    ``quality_col`` it is ``max_by((quality, -id))`` — keep the best
    mirror. Rows whose URL does not canonicalize (NULL) are all kept
    (one output row each, ``n_copies`` 1): an unparseable URL is not
    evidence of duplication.

    One digest-keyed shuffle over (canonical, id[, quality]) — text
    never moves; join the result back on ``id_col`` to materialize
    surviving documents."""
    canon = canonical_url(F.col(url_col)).alias("canonical_url")
    slim = df.select(canon, F.col(id_col), *(
        [F.col(quality_col)] if quality_col else []
    ))
    with_url = slim.filter(F.col("canonical_url").isNotNull())
    kept = with_url.groupBy("canonical_url").agg(
        survivor_expr(id_col, quality_col),
        F.count(F.lit(1)).alias("n_copies"),
    )
    no_url = slim.filter(F.col("canonical_url").isNull()).select(
        "canonical_url", F.col(id_col), F.lit(1).cast("long").alias("n_copies")
    )
    return kept.unionByName(no_url)


# href extraction (double- and single-quoted attribute values); both
# patterns are in the Java∩RE2 subset so oracles replay them literally
HREF_DQ_RE = r'href\s*=\s*"([^"]*)"'
HREF_SQ_RE = r"href\s*=\s*'([^']*)'"

# full <a> elements with their inner markup: group 1 = the href value,
# group 2 = the anchor markup (non-greedy up to the closing tag). Both
# live in the Java∩RE2 shared subset (no backreferences, no
# lookaround) so the DuckDB oracles replay them verbatim.
ANCHOR_DQ_RE = r'(?is)<a\b[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>'
ANCHOR_SQ_RE = r"(?is)<a\b[^>]*href\s*=\s*'([^']*)'[^>]*>(.*?)</a\s*>"


def _resolved_href(href: Column, base_url_col: str | None) -> Column:
    """Resolve an href against the row's base URL (shared by
    :func:`extract_links` and :func:`extract_anchor_texts`): absolute
    passes through, ``//host`` takes the base scheme, ``/path`` takes
    the base origin, everything else is NULL."""
    absolute = href.rlike(_SCHEME_RE)
    if base_url_col is None:
        return F.when(absolute, href).otherwise(F.lit(None).cast("string"))
    base = F.col(base_url_col)
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    auth = F.regexp_extract(base, _AUTH_RE, 1)
    origin_ok = (scheme != "") & (auth != "")
    return (
        F.when(absolute, href)
        .when(
            href.startswith("//") & origin_ok,
            F.concat(scheme, F.lit(":"), href),
        )
        .when(
            href.startswith("/") & ~href.startswith("//") & origin_ok,
            F.concat(scheme, F.lit("://"), auth, href),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def extract_links(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    base_url_col: str | None = None,
    keep_base: bool = False,
) -> DataFrame:
    """Outlink harvesting — the crawl-frontier feed: one row per
    ``href`` found in ``html_col`` as ``(id, href, url)`` where ``url``
    is the resolved absolute link.

    Resolution against ``base_url_col`` (when given): absolute
    ``scheme://`` hrefs pass through; protocol-relative ``//host/...``
    take the base's (lowercased) scheme; root-relative ``/path`` take
    the base's ``scheme://authority`` origin. Everything else —
    relative paths, ``mailto:``, ``javascript:``, empty — resolves to
    NULL (callers filter; an unresolvable href is not a frontier
    entry). Without a base column, only absolute hrefs resolve.

    Map-only: regex extract + explode, zero shuffle. Downstream
    canonicalization (:func:`canonical_url`) and per-domain grouping
    are where the crawl loop dedups the frontier.

    ``keep_base`` retains the base URL in the output as ``base_url``
    (aliased so it can never collide with the resolved ``url``
    column) — callers deriving per-source columns (e.g.
    :func:`domain_links`'s ``src_domain``) read it from the same row
    instead of joining back to the corpus.
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    hrefs = F.concat(
        F.regexp_extract_all(h, F.lit(HREF_DQ_RE), F.lit(1)),
        F.regexp_extract_all(h, F.lit(HREF_SQ_RE), F.lit(1)),
    )
    base_cols = [F.col(base_url_col)] if base_url_col else []
    out = df.select(F.col(id_col), *base_cols, F.explode(hrefs).alias("href"))
    resolved = _resolved_href(F.col("href"), base_url_col)
    keep = (
        [F.col(base_url_col).alias("base_url")]
        if (keep_base and base_url_col)
        else []
    )
    return out.select(F.col(id_col), *keep, "href", resolved.alias("url"))


def extract_anchor_texts(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    base_url_col: str | None = None,
) -> DataFrame:
    """Anchor-text harvesting: one row per ``<a href=...>...</a>``
    element as ``(id, url, anchor)`` — the text OTHER pages use to
    describe a target, the classic relevance signal behind web-search
    training corpora (anchor "documents") and link-context features.

    ``url`` resolves like :func:`extract_links` (absolute / protocol-
    relative / root-relative against ``base_url_col``; everything else
    NULL). ``anchor`` is the element's inner markup with tags stripped
    and whitespace collapsed; empty anchors (image links, spacer
    markup) come back NULL so callers can filter without guessing.

    Map-only: two regexp_extract_all passes (double-/single-quoted
    href) zipped into (href, markup) structs, one explode, a
    tag-strip/collapse projection — zero shuffle, no Python, and both
    regexes live in the Java∩RE2 shared subset the oracles replay.
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    pairs = F.concat(
        *[
            F.arrays_zip(
                F.regexp_extract_all(h, F.lit(pat), F.lit(1)).alias("href"),
                F.regexp_extract_all(h, F.lit(pat), F.lit(2)).alias("raw"),
            )
            for pat in (ANCHOR_DQ_RE, ANCHOR_SQ_RE)
        ]
    )
    base_cols = [F.col(base_url_col)] if base_url_col else []
    out = df.select(F.col(id_col), *base_cols, F.explode(pairs).alias("__a"))
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("__a.raw"), r"<[^>]*>", " "),
            r"\s+",
            " ",
        )
    )
    return out.select(
        F.col(id_col),
        _resolved_href(F.col("__a.href"), base_url_col).alias("url"),
        F.when(cleaned != "", cleaned).alias("anchor"),
    )


def anchor_text_summary(
    links: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Per-target anchor profile over :func:`extract_anchor_texts`
    output: ``(url, n_links, n_unique_anchors, top_anchors)`` with the
    target canonicalized (:func:`canonical_url`) so tracking-param /
    fragment variants of one page pool their anchors, and
    ``top_anchors`` = the k most frequent anchor strings (count desc,
    anchor asc) joined with ``" | "`` — the "anchor document".

    Shape at scale: one map-combined (url, anchor) aggregate, then the
    bounded two-stage top-k per url (local row_number per partition
    first, never a whole-URL window task — a hub page with 10^9
    inlinks stays splittable); the per-url rollup joins counts from
    the SAME aggregate, so the link table is read once.

    Cache ownership: the (url, anchor) count table is persisted
    (two consumers) and the LAZY result pins it — the caller owns
    release after materializing in long-lived sessions."""
    if k < 1:
        raise ValueError("k must be >= 1")
    counts = (
        links.filter(F.col("url").isNotNull() & F.col("anchor").isNotNull())
        .select(canonical_url(F.col("url")).alias("url"), "anchor")
        .groupBy("url", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
        # two consumers (top-k windows + the totals rollup) behind a
        # join: the left join's IsNotNull pushdown makes the subtrees
        # unequal, so ReuseExchange won't fire — persist spill-safe
        # (the repo's recurring exchange-reuse rule)
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    track_cache(counts)
    local = (
        counts.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy("url", "__pid").orderBy(
                    F.desc("n"), F.asc("anchor")
                )
            ),
        )
        .filter(F.col("__lr") <= k)
    )
    top = (
        local.withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.desc("n"), F.asc("anchor"))
            ),
        )
        .filter(F.col("__r") <= k)
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__r", "anchor"))
                    ),
                    lambda s: s["anchor"],
                ),
                " | ",
            ).alias("top_anchors")
        )
    )
    totals = counts.groupBy("url").agg(
        F.sum("n").alias("n_links"),
        F.count(F.lit(1)).alias("n_unique_anchors"),
    )
    out = totals.join(top, "url", "left").select(
        "url", "n_links", "n_unique_anchors", "top_anchors"
    )
    return out


def domain_links(
    df: DataFrame,
    html_col: str = "text",
    url_col: str = "url",
    id_col: str = "doc_id",
    extra_suffixes: tuple[str, ...] = (),
    keep_self_loops: bool = True,
) -> DataFrame:
    """The domain-level link graph: ``(src_domain, dst_domain,
    n_links)`` edges from every resolvable href — the input to site
    authority ranks (compose with ``graph.pagerank``), spam-cluster
    detection, and crawl prioritization.

    Shape at scale: href extraction is a map-only explode (text is
    read once and never shuffled — ``src_domain`` derives from the
    base URL carried on the SAME row, so there is no join back to the
    corpus and no second scan); only ``(src_domain, dst_domain)``
    string pairs enter the single map-combined aggregate — the edge
    table is domain²-bounded, orders of magnitude smaller than the
    corpus."""
    links = extract_links(
        df.select(F.col(id_col), F.col(url_col), F.col(html_col)),
        html_col=html_col,
        id_col=id_col,
        base_url_col=url_col,
        keep_base=True,
    )
    edges = (
        links.filter(F.col("url").isNotNull())
        .select(
            url_domain(F.col("base_url"), extra_suffixes).alias("src_domain"),
            url_domain(F.col("url"), extra_suffixes).alias("dst_domain"),
        )
        .filter(F.col("src_domain").isNotNull() & F.col("dst_domain").isNotNull())
    )
    if not keep_self_loops:
        edges = edges.filter(F.col("src_domain") != F.col("dst_domain"))
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def link_degree_stats(edges: DataFrame) -> DataFrame:
    """Per-domain degree card over a :func:`domain_links` edge table:
    ``(domain, n_out_links, n_out_domains, n_in_links, n_in_domains)``
    with zeros for pure sources/sinks. Two aggregates + one outer join
    over the (already domain²-bounded) edge table — never touches the
    corpus."""
    out = edges.groupBy(F.col("src_domain").alias("domain")).agg(
        F.sum("n_links").alias("n_out_links"),
        F.count(F.lit(1)).alias("n_out_domains"),
    )
    inn = edges.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.sum("n_links").alias("n_in_links"),
        F.count(F.lit(1)).alias("n_in_domains"),
    )
    return (
        out.join(inn, "domain", "full_outer")
        .select(
            "domain",
            F.coalesce("n_out_links", F.lit(0)).cast("long").alias("n_out_links"),
            F.coalesce("n_out_domains", F.lit(0)).cast("long").alias("n_out_domains"),
            F.coalesce("n_in_links", F.lit(0)).cast("long").alias("n_in_links"),
            F.coalesce("n_in_domains", F.lit(0)).cast("long").alias("n_in_domains"),
        )
    )


def plan_fetch_waves(
    frontier: DataFrame,
    url_col: str = "url",
    priority_col: str = "n_refs",
    n_workers: int = 64,
    max_waves: int = 10_000,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Politeness-aware fetch schedule over a frontier: ``(url, domain,
    priority, worker, wave)`` where wave ``w`` holds at most ONE URL
    per registrable domain (rank within the domain by priority desc,
    url asc) and ``worker`` pins every domain to one fetcher slot
    (stable md5 bucket — connection reuse and per-host rate limiting
    live on one worker; domains spread uniformly across slots). URLs
    whose domain does not parse are dropped — an unaddressable target
    is not schedulable.

    ``max_waves`` caps each domain's queue: with any realistic crawl
    delay, wave numbers beyond ~10k are beyond the fetch horizon, and
    the cap is what makes the per-domain ranking scale-safe — the
    rank runs as the engine's two-stage bounded top-k (a local rank
    per (domain, input partition) prunes to ``max_waves`` survivors
    per partition before the global per-domain rank), so a
    mega-domain's queue never piles into one unbounded task."""
    if n_workers <= 0:
        raise ValueError(f"n_workers must be positive, got {n_workers}")
    if max_waves <= 0:
        raise ValueError(f"max_waves must be positive, got {max_waves}")
    from pyspark.sql import Window

    from .sampling import hash_bucket

    dom = url_domain(F.col(url_col), extra_suffixes)
    slim = (
        frontier.select(
            F.col(url_col).alias("url"),
            dom.alias("domain"),
            F.coalesce(F.col(priority_col), F.lit(0)).cast("long").alias(
                "priority"
            ),
        )
        .filter(F.col("domain").isNotNull())
    )
    order = [F.desc("priority"), F.asc("url")]
    local = (
        slim.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy("domain", "__pid").orderBy(*order)
            ),
        )
        .filter(F.col("__lr") <= max_waves)
        .drop("__lr", "__pid")
    )
    return (
        local.withColumn(
            "wave",
            F.row_number().over(Window.partitionBy("domain").orderBy(*order)),
        )
        .filter(F.col("wave") <= max_waves)
        .withColumn(
            "worker",
            hash_bucket(
                F.concat(F.lit("crawl-v1:"), F.col("domain")), n_workers
            ),
        )
        .select("url", "domain", "priority", "worker", "wave")
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Per-registrable-domain corpus card: ``(domain, n_docs, n_chars,
    docs_permille)`` — the dominance table a curator caps crawl sites
    from. NULL-URL rows aggregate under domain ``(none)`` so the
    totals stay honest. One map-combined aggregate + a 1-row corpus
    total broadcast for the permille share (integer div)."""
    dom = F.coalesce(
        url_domain(F.col(url_col), extra_suffixes), F.lit("(none)")
    ).alias("domain")
    per = (
        df.select(
            dom,
            F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__len"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").alias("n_chars"),
        )
    )
    total = per.agg(F.sum("n_docs").alias("__total"))
    return (
        per.join(F.broadcast(total))
        .withColumn("docs_permille", F.expr("(1000 * n_docs) div __total"))
        .drop("__total")
    )
