"""Batch-V: sitemap source, robots rules, crawl-frontier pipeline."""

import os

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_parse_robots_rfc_semantics():
    from text_extraction_ray.core.robots import parse_robots

    r = parse_robots(
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public/\n"
        "Disallow: /tmp*.bak$\n"
        "Disallow:\n"            # empty value: no-op
        "Crawl-delay: 2.5\n"
        "# comment\n"
        "User-agent: other\n"
        "Disallow: /\n")
    assert r.allowed("/anything")
    assert not r.allowed("/private/x")
    assert r.allowed("/private/public/x")     # longer Allow wins
    assert not r.allowed("/tmp123.bak")       # * wildcard + $ anchor
    assert r.allowed("/tmp123.bak.old")       # $ means end
    assert r.crawl_delay == 2.5
    # the 'other' group's Disallow: / must not leak into *
    assert r.allowed("/")


def test_parse_robots_group_merging_and_ties():
    from text_extraction_ray.core.robots import parse_robots

    # consecutive UA lines share one group; * anywhere in the run counts
    r = parse_robots(
        "User-agent: foo\nUser-agent: *\nDisallow: /a\n"
        "User-agent: bar\nDisallow: /b\n")
    assert not r.allowed("/a")
    assert r.allowed("/b")
    # equal specificity: Allow wins
    r2 = parse_robots(
        "User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert r2.allowed("/dir/x")
    # block-all
    r3 = parse_robots("User-agent: *\nDisallow: /\n")
    assert not r3.allowed("/")
    assert not r3.allowed("/x/y")


def test_parse_sitemap_fixtures():
    from text_extraction_ray.sources.sitemap import parse_sitemap

    urlset = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://h/x</loc><lastmod>2026-01-02</lastmod>
<priority>0.8</priority></url>
<url><loc>https://h/y</loc></url>
</urlset>"""
    rows = parse_sitemap(urlset, "s.xml")
    assert [(r["url"], r["lastmod"], r["priority"], r["kind"])
            for r in rows] == [
        ("https://h/x", "2026-01-02", 0.8, "url"),
        ("https://h/y", "", 0.5, "url")]
    index = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>https://h/s1.xml</loc></sitemap></sitemapindex>"""
    assert [r["kind"] for r in parse_sitemap(index)] == ["sitemap"]
    assert parse_sitemap(b"<not-xml") == []


def test_frontier_new_urls_exact_vs_local_set_difference():
    """The bloom-routed anti-join result equals a single-process
    canonical set difference — the bloom only routes, never changes
    the answer."""
    from text_extraction_ray.core.links import canonicalize_url
    from text_extraction_ray.pipelines.queries_r3v import (_corpus_urls,
                                                           _sitemap_dir,
                                                           q_frontier_new_urls)
    from text_extraction_ray.sources.sitemap import parse_sitemap

    got = (q_frontier_new_urls(SF_DIR).to_pandas()
           .sort_values("host").reset_index(drop=True))

    urls_ds, _ = _corpus_urls(SF_DIR)
    crawled = {canonicalize_url(r["url"]) for r in urls_ds.iter_rows()}
    smdir = _sitemap_dir(SF_DIR)
    per_host_all, per_host_new = {}, {}
    for fn in sorted(os.listdir(smdir)):
        if not fn.endswith(".xml") or fn == "sitemap-index.xml":
            continue
        seen = set()
        for r in parse_sitemap(open(os.path.join(smdir, fn), "rb").read()):
            cu = canonicalize_url(r["url"])
            host = cu.split("/", 3)[2]
            if cu in seen:
                continue
            seen.add(cu)
            per_host_all[host] = per_host_all.get(host, 0) + 1
            if cu not in crawled:
                per_host_new[host] = per_host_new.get(host, 0) + 1
    want = (pd.DataFrame(
        [(h, per_host_all[h], per_host_new.get(h, 0))
         for h in sorted(per_host_all)],
        columns=["host", "n_sitemap", "n_new"]))
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False)
    assert got.n_new.sum() > 0
    assert got.n_new.sum() < got.n_sitemap.sum()  # re-announced filtered


def test_frontier_schedule_robots_composition():
    from text_extraction_ray.pipelines.queries_r3v import (
        q_frontier_schedule)

    s = (q_frontier_schedule(SF_DIR).to_pandas()
         .sort_values("host").reset_index(drop=True))
    hosts = list(s.host)
    # gen rule: every 7th host (sorted order) blocks everything
    blocked_all = [h for i, h in enumerate(hosts) if i % 7 == 3]
    sub = s[s.host.isin(blocked_all)]
    assert (sub.n_allowed == 0).all()
    assert (sub.n_blocked > 0).all()
    assert (sub.first_url == "").all()
    # every 5th host allows exactly /private/doc-0 back in
    allowed_private = s[s.host.isin(
        [h for i, h in enumerate(hosts) if i % 5 == 0 and i % 7 != 3])]
    assert (allowed_private.n_blocked ==
            [max(0, (i % 3) + 1 - 1) for i, h in enumerate(hosts)
             if i % 5 == 0 and i % 7 != 3]).all()
    # politeness: est = (n_allowed-1) * delay, first_url is priority-top
    ok = s[s.n_allowed > 0]
    assert (ok.est_seconds ==
            (ok.n_allowed - 1).clip(lower=0) * ok.crawl_delay).all()
    assert ok.first_url.str.contains("/new/page-").all()
