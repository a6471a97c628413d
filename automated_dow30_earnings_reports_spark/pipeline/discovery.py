"""IR-page discovery: candidate-URL generation (the bootstrap fan-out).

The reference's IR finder probes a generated candidate list per company
(/root/reference/src/scrapers/find_IR_pgs_v1.py:248-340 and :395-456):

  1. known alternative-IR-domain map (``:293-295``, e.g. pg ->
     pginvestor.com) x {https, http};
  2. subdomain prefixes investors|investor|ir|stock|stocks (``:283-289``)
     x protocols, where the three investor-prefixes additionally expand
     eight common subpaths (``:326-335``, root last);
  3. a 31-entry common-path list on the base domain (``:399-436``),
     probed for the bare domain and — when the company website lacks
     ``www.`` — the ``www.`` variant too (``:438-440``).

The probe ORDER is the discovery priority: the reference returns the
first hit, so our operator materializes the full candidate list with
that order as an explicit ``priority`` rank — the distributed form of
"try in order until one answers" is "generate all, probe in parallel,
keep the lowest-priority success".

Scale shape: companies x a few static dims. Every dim is a literal
broadcast (52 subdomain rows, 31 paths, a handful of alt domains);
the only per-company state is the URL strings themselves. At 100 TB of
companies this is a pure map-side cross product — no shuffle until the
per-company priority window, which partitions on the company key the
downstream probe stage partitions on anyway.

The dims are rendered from ONE set of Python literals into both the
Spark plan and the DuckDB oracle's VALUES lists, so cross-engine parity
is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_dow30_earnings_reports_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


PROTOCOLS = ["https://", "http://"]

# find_IR_pgs_v1.py:283-289 — most-common-first probe order.
SUBDOMAIN_PREFIXES = ["investors", "investor", "ir", "stock", "stocks"]
INVESTOR_PREFIXES = {"investors", "investor", "ir"}

# find_IR_pgs_v1.py:326-335 — proactive subpaths on investor subdomains
# (root probed last).
IR_SUBPATHS = [
    "/investor-home/default.aspx",
    "/investor-home/",
    "/investors/overview/default.aspx",
    "/overview/default.aspx",
    "/home/default.aspx",
    "/investor-relations/default.aspx",
    "/default.aspx",
    "",
]

# find_IR_pgs_v1.py:399-436 — the comprehensive main-domain path list.
COMMON_PATHS = [
    "/investors",
    "/investor",
    "/investor-relations",
    "/investor_relations",
    "/investorrelations",
    "/ir",
    "/IR",
    "/investor-center",
    "/investor_center",
    "/investorcenter",
    "/shareholder",
    "/shareholders",
    "/investors.html",
    "/investor.html",
    "/investors.htm",
    "/investor.htm",
    "/investor-relations.html",
    "/investor_relations.html",
    "/ir.html",
    "/investors.aspx",
    "/investor.aspx",
    "/investor-home/default.aspx",
    "/about/investors",
    "/about-us/investors",
    "/company/investors",
    "/corporate/investors",
    "/en/investors",
    "/en-us/investors",
    "/investors/",
    "/investor/",
    "/ir/",
]

# find_IR_pgs_v1.py:293-295 — companies whose IR lives on a separate
# domain entirely (reference: pg -> pginvestor.com). Keyed by the
# company-name label of the corporate domain.
ALT_IR_DOMAINS: dict[str, list[str]] = {
    "nation3": ["nation3investor.com", "www.nation3investor.com"],
    "nation7": ["nation7ir.com"],
}


def _subdomain_dim() -> list[tuple[str, str, str, int, int, int]]:
    """(prefix, proto, subpath, pseq, prseq, sseq) in exact probe order."""
    rows = []
    for pseq, prefix in enumerate(SUBDOMAIN_PREFIXES):
        for prseq, proto in enumerate(PROTOCOLS):
            subpaths = IR_SUBPATHS if prefix in INVESTOR_PREFIXES else [""]
            for sseq, sp in enumerate(subpaths):
                rows.append((prefix, proto, sp, pseq, prseq, sseq))
    return rows


def _alt_dim() -> list[tuple[str, str, str, int, int]]:
    """(company_name, proto, alt_domain, aseq, prseq)."""
    rows = []
    for cname, domains in sorted(ALT_IR_DOMAINS.items()):
        for aseq, dom in enumerate(domains):
            for prseq, proto in enumerate(PROTOCOLS):
                rows.append((cname, proto, dom, aseq, prseq))
    return rows


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(rows, alias: str, cols: str) -> str:
    body = ", ".join(
        "(" + ", ".join(_sql_str(v) if isinstance(v, str) else str(v) for v in r) + ")"
        for r in rows
    )
    return f"(VALUES {body}) AS {alias}({cols})"


def _ir_candidates_oracle() -> str:
    sub = _values(_subdomain_dim(), "s", "prefix, proto, subpath, pseq, prseq, sseq")
    alt = _values(_alt_dim(), "a", "cname, proto, alt_domain, aseq, prseq")
    paths = _values(list(enumerate(COMMON_PATHS)), "p", "qseq, path")
    return f"""
    WITH co AS (
      SELECT n_name AS company,
             lower(regexp_replace(n_name, '[^A-Za-z0-9]', '', 'g')) AS cname,
             n_nationkey % 2 = 0 AS has_www
      FROM nation
    ),
    base AS (
      SELECT company, cname, has_www,
             cname || '.com' AS domain_no_www,
             CASE WHEN has_www THEN 'www.' || cname || '.com'
                  ELSE cname || '.com' END AS website
      FROM co
    ),
    alt_c AS (
      SELECT b.company, 'alt_domain' AS method,
             a.proto || a.alt_domain AS candidate_url,
             0 AS m, a.aseq AS k1, a.prseq AS k2, 0 AS k3
      FROM base b JOIN {alt} ON a.cname = b.cname
    ),
    sub_c AS (
      SELECT b.company, 'subdomain' AS method,
             s.proto || s.prefix || '.' || b.domain_no_www || s.subpath
               AS candidate_url,
             1 AS m, s.pseq AS k1, s.prseq AS k2, s.sseq AS k3
      FROM base b CROSS JOIN {sub}
    ),
    bases AS (
      SELECT company, 0 AS bseq, 'https://' || website AS base_url FROM base
      UNION ALL
      SELECT company, 1, 'https://www.' || domain_no_www
      FROM base WHERE NOT has_www
    ),
    path_c AS (
      SELECT bs.company, 'path' AS method,
             bs.base_url || p.path AS candidate_url,
             2 AS m, bs.bseq AS k1, p.qseq AS k2, 0 AS k3
      FROM bases bs CROSS JOIN {paths}
    ),
    allc AS (
      SELECT * FROM alt_c UNION ALL SELECT * FROM sub_c
      UNION ALL SELECT * FROM path_c
    )
    SELECT company, method, candidate_url,
           CAST(ROW_NUMBER() OVER (PARTITION BY company
                                   ORDER BY m, k1, k2, k3) AS INT) AS priority
    FROM allc
    ORDER BY company, priority
    """


@_register("ir_candidate_urls", _ir_candidates_oracle())
def ir_candidate_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-URL fan-out for IR-page discovery over the nation dim
    (stand-in for the companies table; even nation keys get a ``www.``
    corporate site so both base-URL branches are exercised). Output:
    (company, method, candidate_url, priority) — priority is the
    reference's exact probe order. Downstream, the P7 skip gate and A7
    keyword scoring consume this list (see ir_candidate_probe)."""
    nation = load_table(spark, sf_dir, "nation")
    cname = F.lower(F.regexp_replace("n_name", "[^A-Za-z0-9]", ""))
    base = nation.select(
        F.col("n_name").alias("company"),
        cname.alias("cname"),
        (F.col("n_nationkey") % 2 == 0).alias("has_www"),
        F.concat(cname, F.lit(".com")).alias("domain_no_www"),
        F.when(F.col("n_nationkey") % 2 == 0,
               F.concat(F.lit("www."), cname, F.lit(".com")))
        .otherwise(F.concat(cname, F.lit(".com")))
        .alias("website"),
    )

    alt_dim = spark.createDataFrame(
        _alt_dim(), ["a_cname", "proto", "alt_domain", "aseq", "prseq"]
    )
    alt_c = base.join(
        F.broadcast(alt_dim), base.cname == alt_dim.a_cname
    ).select(
        "company",
        F.lit("alt_domain").alias("method"),
        F.concat("proto", "alt_domain").alias("candidate_url"),
        F.lit(0).alias("m"),
        F.col("aseq").alias("k1"),
        F.col("prseq").alias("k2"),
        F.lit(0).alias("k3"),
    )

    sub_dim = spark.createDataFrame(
        _subdomain_dim(), ["prefix", "proto", "subpath", "pseq", "prseq", "sseq"]
    )
    sub_c = base.crossJoin(F.broadcast(sub_dim)).select(
        "company",
        F.lit("subdomain").alias("method"),
        F.concat("proto", "prefix", F.lit("."), "domain_no_www", "subpath")
        .alias("candidate_url"),
        F.lit(1).alias("m"),
        F.col("pseq").alias("k1"),
        F.col("prseq").alias("k2"),
        F.col("sseq").alias("k3"),
    )

    bases = base.select(
        "company",
        F.when(
            F.col("has_www"),
            F.array(F.struct(F.lit(0).alias("bseq"),
                             F.concat(F.lit("https://"), "website").alias("base_url"))),
        )
        .otherwise(
            F.array(
                F.struct(F.lit(0).alias("bseq"),
                         F.concat(F.lit("https://"), "website").alias("base_url")),
                F.struct(F.lit(1).alias("bseq"),
                         F.concat(F.lit("https://www."), "domain_no_www").alias("base_url")),
            )
        )
        .alias("bs"),
    ).select("company", F.explode("bs").alias("b"))
    paths_dim = spark.createDataFrame(
        list(enumerate(COMMON_PATHS)), ["qseq", "path"]
    )
    path_c = bases.crossJoin(F.broadcast(paths_dim)).select(
        "company",
        F.lit("path").alias("method"),
        F.concat(F.col("b.base_url"), "path").alias("candidate_url"),
        F.lit(2).alias("m"),
        F.col("b.bseq").alias("k1"),
        F.col("qseq").alias("k2"),
        F.lit(0).alias("k3"),
    )

    allc = alt_c.unionByName(sub_c).unionByName(path_c)
    w = Window.partitionBy("company").orderBy("m", "k1", "k2", "k3")
    return (
        allc.withColumn("priority", F.row_number().over(w).cast("int"))
        .select("company", "method", "candidate_url", "priority")
        .orderBy("company", "priority")
    )


# ---------------------------------------------------------------------------
# Discovery selection: probe the candidate list and pick, per company,
# the first (lowest-priority) candidate that "answers" with IR content —
# the distributed form of the reference's return-on-first-hit loop
# (find_IR_pgs_v1.py:341-378 content gate; :538-544 output schema
# Ticker/Company/IR_URL/Status). The probe is deterministic:
# availability is a pure function of the URL string (stand-in for the
# HTTP 200 + text/html check) and the content score is the reference's
# indicator-count over the URL text (A7 keyword scoring; the real
# deployment swaps in the fetched page body via pipeline/fetch.py).
# ---------------------------------------------------------------------------

IR_INDICATORS = ["investor", "relations", "overview", "default", "stock", "home"]
MIN_INDICATORS = 2
# THE P7 skip gate — one pattern shared with url_skip_filter, so adding
# a dead-URL marker there cannot leave the probe gating on a stale copy
from automated_dow30_earnings_reports_spark.pipeline.queries import (  # noqa: E402
    SKIP_URL_PATTERN as _SKIP_PATTERN,
)


def _probe_oracle() -> str:
    score = " + ".join(
        f"(CASE WHEN contains(lower(candidate_url), '{k}') THEN 1 ELSE 0 END)"
        for k in IR_INDICATORS
    )
    return f"""
    WITH cand AS ({_ir_candidates_oracle().replace(';', '')}),
    probed AS (
      SELECT company, candidate_url, priority,
             regexp_extract(candidate_url, '{_SKIP_PATTERN}', 0) = ''
               AND length(candidate_url) % 7 <> 0 AS reachable,
             {score} AS indicator_count
      FROM cand
    ),
    hits AS (
      SELECT company, candidate_url, priority,
             ROW_NUMBER() OVER (PARTITION BY company ORDER BY priority) AS rn
      FROM probed
      WHERE reachable AND indicator_count >= {MIN_INDICATORS}
    ),
    co AS (SELECT DISTINCT company FROM cand)
    SELECT co.company,
           h.candidate_url                                   AS ir_url,
           CASE WHEN h.candidate_url IS NULL
                THEN 'Not Found' ELSE 'Found' END            AS status,
           CAST(COALESCE(h.priority, 0) AS INT)              AS probes_rank
    FROM co LEFT JOIN hits h ON h.company = co.company AND h.rn = 1
    ORDER BY co.company
    """


@_register("ir_candidate_probe", _probe_oracle())
def ir_candidate_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-success selection over the candidate fan-out: gate by the
    P7 skip pattern + a deterministic availability bit, score by the
    reference's IR indicator-count (>= 2), keep the lowest-priority
    hit per company; companies with no hit report 'Not Found'
    (find_IR_pgs_v1.py:668-678 partition-split semantics). One window
    over the company key — the probe itself is map-side."""
    cand = ir_candidate_urls(spark, sf_dir)
    lower_url = F.lower(F.col("candidate_url"))
    score = sum(
        F.when(lower_url.contains(k), 1).otherwise(0) for k in IR_INDICATORS
    )
    reachable = (
        (F.regexp_extract("candidate_url", _SKIP_PATTERN, 0) == "")
        & (F.length("candidate_url") % 7 != 0)
    )
    probed = cand.select(
        "company", "candidate_url", "priority",
        reachable.alias("reachable"), score.alias("indicator_count"),
    )
    w = Window.partitionBy("company").orderBy("priority")
    hits = (
        probed.where(F.col("reachable") & (F.col("indicator_count") >= MIN_INDICATORS))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("company", F.col("candidate_url").alias("hit_url"), "priority")
    )
    # company universe straight off the dim table — deriving it from
    # `cand` would re-run the whole candidate fan-out (incl. its
    # priority window shuffle) a second time just to list names
    co = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("company"))
    return (
        co.join(hits, "company", "left")
        .select(
            "company",
            F.col("hit_url").alias("ir_url"),
            F.when(F.col("hit_url").isNull(), "Not Found")
            .otherwise("Found")
            .alias("status"),
            F.coalesce(F.col("priority"), F.lit(0)).cast("int").alias("probes_rank"),
        )
        .orderBy("company")
    )
