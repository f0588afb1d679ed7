"""robots.txt parsing and crawl-permission gating — the politeness
half of the crawl stack (the URL layer dedups and caps what was
fetched; this module decides what MAY be fetched).

Semantics follow the public Robots Exclusion Protocol (RFC 9309 /
the Google specification):

- ``parse_robots`` — robots.txt documents -> one rule row per
  applicable ``Allow``/``Disallow`` line. Group structure is the
  spec's: consecutive ``User-agent`` lines open ONE group whose rules
  apply to all of them; a ``User-agent`` line after rules starts a new
  group; rules before any ``User-agent`` line belong to no group and
  are ignored. Agent selection is most-specific-wins: when any group
  names the requested agent exactly, only those groups apply and the
  ``*`` groups are ignored; otherwise the ``*`` groups apply.
- ``robots_like_pattern`` — a rule path compiled to an engine-portable
  SQL ``LIKE`` pattern: ``*`` -> ``%``, a trailing ``$`` anchors the
  end (no trailing ``%``), and the LIKE metacharacters ``%`` ``_``
  ``\\`` in the rule are escaped. This covers the full wildcard
  semantics of the spec (mid-pattern ``$`` is literal, per Google).
- ``apply_robots`` — pages x rules -> per-page ``allowed`` verdict via
  longest-match precedence: the rule with the longest raw path wins;
  on a length tie ``Allow`` wins; a page with no matching rule (or no
  rules at all for its key) is allowed. Matching runs against the
  URL's path plus ``?query`` (the spec's match target).

Everything is codegen'd string/window expressions in the Java∩RE2
regex subset plus standard ``LIKE ... ESCAPE`` — the DuckDB oracles
replay the literal same patterns.

Scale shape: ``parse_robots`` windows partition by robots-document
key (one robots.txt per site — thousands of tiny partitions, never a
skewed window); ``apply_robots`` joins the corpus to the rule table
on the site key — rules-per-site is spec-bounded small, so the join
output stays corpus-sized, and a rule table that fits in memory
should be passed through ``F.broadcast`` by the caller.

Production note: the protocol scopes robots.txt per HOST (scheme +
authority); this module keys rules by whatever column the caller
groups them under. The driver queries and the rest of the URL layer
use the registrable domain for consistency; swap the key expression
for a host extraction when per-host fidelity matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .urls import _PATH_RE, _QUERY_RE, url_domain

__all__ = [
    "parse_robots",
    "robots_like_pattern",
    "apply_robots",
    "robots_link_filter",
    "sitemap_urls",
    "UA_RE",
    "RULE_RE",
    "SITEMAP_RE",
]

# directive heads (inline (?i) — supported by both Java and RE2)
UA_RE = r"(?i)^user-agent\s*:(.*)$"
RULE_RE = r"(?i)^(dis)?allow\s*:(.*)$"
SITEMAP_RE = r"(?i)^sitemap\s*:(.*)$"


def sitemap_urls(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "domain",
) -> DataFrame:
    """``Sitemap:`` directives from robots.txt documents as ``(key_col,
    sitemap_url)`` — the seed feed for the crawl frontier (per RFC
    9309 the directive is group-independent, so no agent scoping
    applies). Comment strip, CRLF fold, case-insensitive head;
    non-URL values (no ``scheme://``) are dropped. Map-only regex
    explode — zero shuffle."""
    lines = F.split(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), "\r", ""),
        "\n",
    )
    ln = df.select(
        F.col(key_col), F.explode(lines).alias("__raw")
    ).select(
        key_col,
        F.trim(F.regexp_replace(F.col("__raw"), "#.*$", "")).alias("__line"),
    )
    url = F.trim(F.regexp_extract(F.col("__line"), SITEMAP_RE, 1))
    return (
        ln.filter(F.col("__line").rlike(r"(?i)^sitemap\s*:"))
        .select(F.col(key_col), url.alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"))
    )


def parse_robots(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "domain",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt documents into the rule table for ``agent``:
    ``(key_col, allow, path, rule_len)`` — one row per Allow/Disallow
    line in the groups that apply to ``agent`` (most-specific-wins
    agent selection, see module docstring). Empty-path rules are
    dropped (``Disallow:`` with no value means "no restriction" — the
    same verdict as having no rule).

    One posexplode + per-document windows (robots files are KB-sized;
    the window partitions by document key). No shuffle touches page
    text — this runs over the robots corpus only."""
    agent_lc = agent.lower()
    key = F.col(key_col)
    # comment strip, CR fold, line split
    lines = F.split(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), "\r", ""),
        "\n",
    )
    ln = (
        df.select(key.alias("__key"), F.posexplode(lines).alias("__idx", "__raw"))
        .select(
            "__key",
            "__idx",
            F.trim(F.regexp_replace(F.col("__raw"), "#.*$", "")).alias("__line"),
        )
    )
    is_ua = F.col("__line").rlike(r"(?i)^user-agent\s*:")
    ua_val = F.lower(F.trim(F.regexp_extract(F.col("__line"), UA_RE, 1)))
    is_rule = F.col("__line").rlike(r"(?i)^(dis)?allow\s*:")
    is_allow = F.col("__line").rlike(r"(?i)^allow\s*:")
    path = F.trim(F.regexp_extract(F.col("__line"), RULE_RE, 2))

    w_seq = Window.partitionBy("__key").orderBy("__idx")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ua = F.lag(F.col("__is_ua"), 1, False).over(w_seq)
    tagged = ln.select(
        "__key",
        "__idx",
        is_ua.alias("__is_ua"),
        ua_val.alias("__ua"),
        is_rule.alias("__is_rule"),
        is_allow.alias("__allow"),
        path.alias("__path"),
    ).withColumn(
        "__grp",
        F.sum((F.col("__is_ua") & ~prev_ua).cast("int")).over(w_run),
    )
    w_grp = Window.partitionBy("__key", "__grp")
    w_key = Window.partitionBy("__key")
    scoped = tagged.select(
        "*",
        F.max((F.col("__is_ua") & (F.col("__ua") == "*")).cast("int"))
        .over(w_grp)
        .alias("__has_star"),
        F.max((F.col("__is_ua") & (F.col("__ua") == agent_lc)).cast("int"))
        .over(w_grp)
        .alias("__has_agent"),
        F.max((F.col("__is_ua") & (F.col("__ua") == agent_lc)).cast("int"))
        .over(w_key)
        .alias("__any_specific"),
    )
    applies = (F.col("__has_agent") == 1) | (
        (F.col("__has_star") == 1) & (F.col("__any_specific") == 0)
    )
    return (
        scoped.filter(
            F.col("__is_rule")
            & (F.col("__grp") >= 1)
            & applies
            & (F.col("__path") != "")
        )
        .select(
            F.col("__key").alias(key_col),
            F.col("__allow").alias("allow"),
            F.col("__path").alias("path"),
            F.length("__path").alias("rule_len"),
        )
    )


def robots_like_pattern(path) -> Column:
    """Compile a robots rule path to a SQL ``LIKE`` pattern (escape
    character ``\\``): LIKE metacharacters escaped, ``*`` -> ``%``, a
    trailing ``$`` anchors the end, otherwise the pattern gets a
    trailing ``%`` (prefix semantics)."""
    p = F.col(path) if isinstance(path, str) else path
    anchored = p.endswith("$")
    body = F.when(anchored, F.substring(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.replace(
        F.replace(
            F.replace(body, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    wild = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, wild).otherwise(F.concat(wild, F.lit("%")))


def apply_robots(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    key_col: str = "domain",
    key_expr: Column | None = None,
    out_col: str = "allowed",
) -> DataFrame:
    """Gate pages against a :func:`parse_robots` rule table: adds
    ``out_col`` (boolean) and ``matched_rule`` (the winning rule's
    path, NULL when no rule matched). Longest-raw-path rule wins; on a
    tie ``Allow`` beats ``Disallow``; no match (or unparseable URL)
    -> allowed.

    Shape: one equi-join corpus x rules on the site key (rule fan-out
    is spec-bounded per site), a LIKE filter, one map-combined argmax
    aggregate over (page, winning rule) longs, and a left join back
    onto the input — page text never enters the rule join (only id,
    key and the URL path travel)."""
    u = F.col(url_col)
    page_key = key_expr if key_expr is not None else url_domain(u)
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    qry = F.regexp_extract(u, _QUERY_RE, 1)
    match_target = F.concat(
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path),
        F.when(qry == "", F.lit("")).otherwise(F.concat(F.lit("?"), qry)),
    )
    slim = df.select(
        F.col(id_col),
        page_key.alias("__pkey"),
        match_target.alias("__target"),
    )
    rt = rules.select(
        F.col(key_col).alias("__pkey"),
        F.col("allow"),
        F.col("path"),
        F.col("rule_len"),
        robots_like_pattern(F.col("path")).alias("__pat"),
    )
    matched = (
        slim.join(rt, "__pkey")
        .filter(F.expr("__target LIKE __pat ESCAPE '\\\\'"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("rule_len").alias("l"),
                    F.col("allow").cast("int").alias("a"),
                    F.col("path").alias("p"),
                )
            ).alias("__win")
        )
        .select(
            F.col(id_col),
            (F.col("__win.a") == 1).alias("__allowed"),
            F.col("__win.p").alias("matched_rule"),
        )
    )
    return (
        df.join(matched, id_col, "left")
        .withColumn(out_col, F.coalesce(F.col("__allowed"), F.lit(True)))
        .drop("__allowed")
    )


def robots_link_filter(
    rules: DataFrame,
    key_col: str = "domain",
    key_expr: Column | None = None,
):
    """A politeness gate shaped for the streaming frontier's
    ``link_filter`` hook (streaming/frontier.py): keeps only link rows
    whose resolved ``url`` the rule table allows. Disallowed targets
    leave NO seen-store entry — exactly the frontier's scope-gate
    semantic, so relaxing robots policy later re-discovers them.

    Per batch: the link frame reduces to its distinct URLs (links may
    repeat per page), those gate through :func:`apply_robots` grouped
    by the URL string itself, and the allowed set semi-joins back —
    page HTML never enters the rule join."""
    def gate(links: DataFrame) -> DataFrame:
        urls = links.select("url").distinct()
        gated = apply_robots(
            urls,
            rules,
            url_col="url",
            id_col="url",
            key_col=key_col,
            key_expr=key_expr,
        )
        allowed = gated.filter(F.col("allowed")).select("url")
        return links.join(allowed, "url", "left_semi")

    return gate
