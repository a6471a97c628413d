"""IR candidate-URL generation + probe selection (pipeline/discovery.py,
mirroring /root/reference/src/scrapers/find_IR_pgs_v1.py:248-340,395-456)."""

from __future__ import annotations

from automated_dow30_earnings_reports_spark.pipeline.discovery import (
    ALT_IR_DOMAINS,
    COMMON_PATHS,
    IR_SUBPATHS,
    ir_candidate_probe,
    ir_candidate_urls,
)


def test_candidate_counts_and_priority(spark, sf_smoke):
    rows = ir_candidate_urls(spark, sf_smoke).collect()
    by_co: dict[str, list] = {}
    for r in rows:
        by_co.setdefault(r.company, []).append(r)
    assert len(by_co) == 25
    for co, cand in by_co.items():
        # priority is a dense 1..n rank in list order
        assert [r.priority for r in cand] == list(range(1, len(cand) + 1))
        # subdomain block: 3 investor prefixes x 2 protocols x 8 subpaths
        # + 2 plain prefixes x 2 protocols
        n_sub = sum(1 for r in cand if r.method == "subdomain")
        assert n_sub == 3 * 2 * len(IR_SUBPATHS) + 2 * 2
        # path block: 31 paths x (1 base for www sites, 2 otherwise)
        n_path = sum(1 for r in cand if r.method == "path")
        assert n_path in (len(COMMON_PATHS), 2 * len(COMMON_PATHS))

    # alt-domain block exists exactly for mapped companies, ordered first
    alt_cos = {co for co, cand in by_co.items() if cand[0].method == "alt_domain"}
    assert len(alt_cos) == len(ALT_IR_DOMAINS)
    for co in alt_cos:
        cand = by_co[co]
        n_alt = sum(1 for r in cand if r.method == "alt_domain")
        assert cand[0].candidate_url.startswith("https://")
        assert n_alt in (2, 4)  # domains x protocols


def test_candidate_order_matches_reference_probe_order(spark, sf_smoke):
    rows = [
        r
        for r in ir_candidate_urls(spark, sf_smoke).collect()
        if r.company == "NATION_0"
    ]
    urls = [r.candidate_url for r in rows]
    # NATION_0 has www site and no alt domain: subdomains first,
    # https before http, investors prefix first, root subpath last.
    assert urls[0] == "https://investors.nation0.com/investor-home/default.aspx"
    assert urls[len(IR_SUBPATHS) - 1] == "https://investors.nation0.com"
    assert urls[len(IR_SUBPATHS)] == "http://investors.nation0.com/investor-home/default.aspx"
    # path block probes the site base (www form) with the path list
    first_path = next(r for r in rows if r.method == "path")
    assert first_path.candidate_url == "https://www.nation0.com/investors"


def test_probe_selects_lowest_priority_hit(spark, sf_smoke):
    out = {r.company: r for r in ir_candidate_probe(spark, sf_smoke).collect()}
    assert len(out) == 25
    cand = {
        (r.company, r.priority): r.candidate_url
        for r in ir_candidate_urls(spark, sf_smoke).collect()
    }
    for co, r in out.items():
        if r.status == "Found":
            assert cand[(co, r.probes_rank)] == r.ir_url
        else:
            assert r.ir_url is None and r.probes_rank == 0
