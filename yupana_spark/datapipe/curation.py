"""URL / domain curation operators — the RefinedWeb §3.1 front of a web
pipeline (Penedo et al. 2023, public: URL filtering against a blocklist,
registered-domain extraction, per-domain contribution caps so no single
site dominates the corpus).

Everything is row-local string algebra or a broadcast/semi join on the
derived registered domain — no UDF, no corpus shuffle except the one the
per-domain cap's quota rank needs (a window partitioned BY DOMAIN over
md5 ranks, the ``cluster_balanced_sample`` machinery).  At 100 TB the
extraction rides the scan; the blocklist is tiny by definition and
broadcasts like the decontamination eval set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: country-code second-level domains where the REGISTERED domain spans
#: three labels (a deliberately small, documented subset of the public
#: suffix list — the full PSL is a deployment-provided artifact; this
#: covers the high-volume cc-SLDs so the heuristic is right where it
#: matters and conservatively two-label elsewhere)
CC_SLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def url_host(url: Column) -> Column:
    """The lowercased host of a URL string — row-local regexp algebra:
    strip scheme and userinfo, cut at the first ``/``, ``?`` or ``#``,
    drop a ``:port`` suffix and any trailing dot.  NULL/empty input
    yields the empty string (never NULL — composable in keys)."""
    c = F.coalesce(url, F.lit(""))
    c = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    c = F.regexp_replace(c, r"^[^/@?#]*@", "")       # userinfo@
    c = F.regexp_extract(c, r"^([^/?#]*)", 1)        # authority
    c = F.regexp_replace(c, r":\d*$", "")            # :port
    c = F.regexp_replace(c, r"\.$", "")              # trailing dot
    return F.lower(c)


def registered_domain(url: Column) -> Column:
    """The registered (eTLD+1-style) domain of a URL — the per-site
    grouping key for blocklists and contribution caps.

    Heuristic, documented: the last TWO host labels, or three when the
    last two form a known cc-SLD (``CC_SLDS``); hosts with fewer than
    two labels (``localhost``) and IPv4 literals pass through verbatim.
    Pure row-local split/slice — reproducible by any SQL engine, which
    is what lets the oracle recompute every value."""
    h = url_host(url)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (F.when(is_ip | (n < 2), h)
            .when((n >= 3) & last2.isin(*CC_SLDS), last3)
            .otherwise(last2))


def _require_no_domain_col(df: DataFrame, op: str) -> None:
    """The curation operators emit a ``domain`` output column derived
    from the URL; a pre-existing ``domain`` column on the input would be
    silently overwritten by ``withColumn`` (review r12) — fail loudly at
    plan time instead, like the dedup id contract does."""
    if "domain" in df.columns:
        raise ValueError(
            f"{op}: input already carries a 'domain' column; it would be "
            "silently overwritten by the derived registered domain — "
            "rename or drop it first")


def url_blocklist_flags(df: DataFrame, blocked: DataFrame,
                        url_col: str = "url") -> DataFrame:
    """Input plus ``domain`` / ``url_blocked``: flag every row whose
    registered domain appears in ``blocked`` (a one-column ``domain``
    frame — the curated blocklist).  The blocklist is tiny by
    definition, so membership is a broadcast LEFT join on the derived
    domain (the decontamination eval-set posture): the corpus rows
    never shuffle.  Blocklist domains are normalized through the same
    ``registered_domain`` so ``www.``/scheme noise in a handed-in list
    cannot cause misses."""
    _require_no_domain_col(df, "url_blocklist_flags")
    # a NULL/garbage blocklist row normalizes to the EMPTY domain, which
    # is also what URL-less documents carry — without the filter one bad
    # list row would silently block every such doc (review r12)
    b = (blocked.select(registered_domain(F.col("domain"))
                        .alias("domain"))
         .filter(F.col("domain") != "")
         .dropDuplicates()
         .withColumn("__blk", F.lit(True)))
    out = df.withColumn("domain", registered_domain(F.col(url_col)))
    return (out.join(F.broadcast(b), "domain", "left")
            .withColumn("url_blocked",
                        F.coalesce(F.col("__blk"), F.lit(False)))
            .drop("__blk"))


def domain_capped_sample(df: DataFrame, per_domain: int,
                         url_col: str = "url",
                         id_col: str = "doc_id",
                         salt_partitions: int = 64) -> DataFrame:
    """Keep at most ``per_domain`` rows per registered domain, chosen by
    the deterministic ``(md5(id), id)`` rank — RefinedWeb-style
    contribution capping so one viral site cannot dominate the corpus.
    A thin, deliberate composition: derive the domain row-locally, then
    ``sample.cluster_balanced_sample`` with the domain as the cell (the
    DataComp per-cluster quota — a window partitioned BY DOMAIN, never
    a global sort).

    Unlike IVF cells, domain sizes are UNBOUNDED (one site can be half a
    crawl), so the salt-decomposed exact-rank path is ON by default:
    phase 1 ranks inside (domain, salt) partitions and keeps
    ``per_domain`` per salt, the true rank runs over the bounded
    survivors — identical selection, no viral-domain hot task.  Pass
    ``salt_partitions=None`` for the plain single-window form."""
    from .sample import cluster_balanced_sample

    _require_no_domain_col(df, "domain_capped_sample")
    assigned = df.withColumn("domain", registered_domain(F.col(url_col)))
    return cluster_balanced_sample(assigned, per_domain,
                                   id_col=id_col, cell_col="domain",
                                   salt_partitions=salt_partitions)
