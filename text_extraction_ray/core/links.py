"""Link extraction + host-graph PageRank (the web-graph surface).

``extract_hrefs`` scans start-tag attributes with the SAME tag regex
and rawtext discipline as the DOM tokenizer (core/dom.py) — a
``<script>var s = "<a href=x>"</script>`` body must not contribute
edges — and decodes entity references in attribute values
(``&amp;`` → ``&``) before URL resolution.  Resolution itself is
stdlib ``urljoin`` (RFC 3986) with fragments dropped.

``pagerank`` runs power iteration over an edge Dataset with the
small-node-table discipline: raw edges collapse ONCE into the
weighted host-pair table (hosts are ~10⁸ where pages are ~10¹²),
then iterations run driver-side below a pair cap or distributed with
the rank vector broadcast per iteration — see the function docstring.
Dangling mass is redistributed uniformly (standard PageRank).
"""

from __future__ import annotations

import re
from urllib.parse import urldefrag, urljoin, urlsplit

import numpy as np
import pyarrow as pa

from .dom import (_END_TAG_RE, _RAWTEXT_CLOSE_RE, _TAG_RE, RAWTEXT_TAGS,
                  collapse_ws, decode_entities)

_HREF_RE = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.IGNORECASE)


def extract_hrefs(html: str) -> list[str]:
    """All <a href> values in document order (raw attribute values,
    entity-decoded, not resolved).  Total: malformed HTML yields
    whatever well-formed anchors exist."""
    out: list[str] = []
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            break
        name = m.group(1).lower()
        if name == "a":
            hm = _HREF_RE.search(m.group(2))
            if hm:
                val = next(g for g in hm.groups() if g is not None)
                out.append(decode_entities(val.strip()))
        pos = m.end()
        if name in RAWTEXT_TAGS and not m.group(3):
            cm = _RAWTEXT_CLOSE_RE[name].search(html, pos)
            pos = n if cm is None else cm.end()
    return out


def resolve_url(base: str, href: str) -> str | None:
    """Absolute URL for an href seen on ``base``; None for non-http(s)
    schemes (mailto:, javascript:, data:) and empty/self-fragment links."""
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.split(":", 1)[0].lower() if ":" in href.split("/", 1)[0] \
        else ""
    if low and low not in ("http", "https"):
        return None
    absu = urldefrag(urljoin(base, href)).url
    return absu or None


def host_of(url: str) -> str:
    return urlsplit(url).netloc.lower()


def page_links_batch(b: pa.Table, html_col: str = "html",
                     url_col: str = "url") -> pa.Table:
    """(src_url, src_host, dst_url, dst_host, internal) edge rows for
    every resolvable anchor; html bytes are decoded with the engine's
    total decoder so the edge set matches what extraction saw."""
    from .encoding import decode_html

    urls = b.column(url_col).to_pylist()
    payloads = b.column(html_col).to_pylist()
    su, sh, du, dh, internal = [], [], [], [], []
    for url, payload in zip(urls, payloads):
        if payload is None:
            continue
        text = decode_html(payload)[0] if isinstance(payload, bytes) \
            else str(payload)
        base_host = host_of(url)
        for href in extract_hrefs(text):
            absu = resolve_url(url, href)
            if absu is None:
                continue
            h = host_of(absu)
            su.append(url)
            sh.append(base_host)
            du.append(absu)
            dh.append(h)
            internal.append(h == base_host)
    return pa.table({
        "src_url": pa.array(su, pa.string()),
        "src_host": pa.array(sh, pa.string()),
        "dst_url": pa.array(du, pa.string()),
        "dst_host": pa.array(dh, pa.string()),
        "internal": pa.array(internal, pa.bool_()),
    })


PAIR_DRIVER_CAP = 4_000_000  # host-pair rows iterated driver-side below this


def pagerank(edges, damping: float = 0.85, iters: int = 20,
             src_col: str = "src_host", dst_col: str = "dst_host",
             pair_cap: int = PAIR_DRIVER_CAP):
    """Host-level PageRank over an edge Dataset (rows may repeat: edge
    multiplicity weights the walk, matching the random-surfer model
    over raw link counts).  Returns a pyarrow Table (host, rank)
    summing to 1.

    Raw edges (~10 per page, unbounded) are first collapsed to the
    WEIGHTED HOST-PAIR table with one distributed groupby — the only
    pass that ever touches per-edge rows.  Real host graphs are sparse
    (~10¹ outlink hosts per host), so the pair table is host-bounded:
    below ``pair_cap`` the 20 power iterations run driver-side on
    sparse numpy arrays (microseconds per iteration — never pay 20
    cluster round trips for a vector that fits in one machine); above
    it, the iterations run distributed over the MATERIALIZED pair
    table with the rank vector broadcast per iteration (ray.put) and
    dense per-batch partial contributions tree-summed — pairs never
    reshuffle after the initial aggregate.
    """
    import ray
    import ray.data  # noqa: F401
    from ray.data.aggregate import Count, Sum

    pairs = (edges.groupby([src_col, dst_col])
             .aggregate(Count(alias_name="w"))
             .materialize())
    n_pairs = pairs.count()

    if n_pairs <= pair_cap:
        df = pairs.to_pandas()
        hosts = sorted(set(df[src_col]) | set(df[dst_col]))
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        s = df[src_col].map(idx).to_numpy(dtype=np.int64)
        d = df[dst_col].map(idx).to_numpy(dtype=np.int64)
        w = df["w"].to_numpy(dtype=np.float64)
        out_deg = np.zeros(n)
        np.add.at(out_deg, s, w)
        share = w / out_deg[s]
        rank = np.full(n, 1.0 / n)
        for _ in range(iters):
            acc = np.zeros(n)
            np.add.at(acc, d, share * rank[s])
            dangling = rank[out_deg == 0].sum()
            rank = (1.0 - damping) / n + damping * (acc + dangling / n)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "rank": pa.array(rank)})

    # distributed branch: host index from tiny per-side aggregates
    deg_rows = pairs.groupby(src_col).aggregate(
        Sum("w", alias_name="out_deg")).take_all()
    hosts = sorted({r[src_col] for r in deg_rows}
                   | {r[dst_col] for r in pairs.groupby(dst_col)
                      .aggregate(Count(alias_name="_c")).take_all()})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    out_deg = np.zeros(n)
    for r in deg_rows:
        out_deg[idx[r[src_col]]] = float(r["out_deg"])
    idx_ref = ray.put(idx)
    deg_ref = ray.put(out_deg)

    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        rank_ref = ray.put(rank)

        def contrib(b: pa.Table) -> pa.Table:
            ix = ray.get(idx_ref)
            rk = ray.get(rank_ref)
            dg = ray.get(deg_ref)
            s = np.array([ix[h] for h in b.column(src_col).to_pylist()],
                         dtype=np.int64)
            d = np.array([ix[h] for h in b.column(dst_col).to_pylist()],
                         dtype=np.int64)
            w = b.column("w").to_numpy(zero_copy_only=False).astype(
                np.float64)
            part = np.zeros(len(rk))
            np.add.at(part, d, w * rk[s] / dg[s])
            return pa.table({"part": pa.array([part.tobytes()])})

        parts = pairs.map_batches(contrib,
                                  batch_format="pyarrow").take_all()
        acc = np.zeros(n)
        for p in parts:
            acc += np.frombuffer(p["part"], dtype=np.float64)
        dangling = rank[out_deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (acc + dangling / n)
    return pa.table({"host": pa.array(hosts, pa.string()),
                     "rank": pa.array(rank)})


# --- URL canonicalization ---------------------------------------------------

_TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "referrer",
})
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str:
    """Crawl-frontier canonical form (the dedup key two syntactically
    different URLs of the same resource collapse to):

    - scheme + host lowercased; default port stripped
    - fragment stripped; dot-segments resolved (via urljoin identity)
    - query params sorted by (key, value); tracking params dropped;
      empty query '?' stripped
    - duplicate slashes in the path collapsed; empty path -> '/'

    Deliberately NOT applied (they change the resource on real sites):
    trailing-slash stripping, www-prefix stripping, %-escape decoding.
    """
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    u = urlsplit(urldefrag(url).url)
    scheme = u.scheme.lower()
    netloc = u.netloc.lower()
    if scheme in _DEFAULT_PORTS and netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    path = u.path or "/"
    while "//" in path:
        path = path.replace("//", "/")
    # RFC 3986 §5.2.4 remove_dot_segments
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    path = "/".join(out) or "/"
    if not path.startswith("/"):
        path = "/" + path
    pairs = [(k, v) for k, v in parse_qsl(u.query, keep_blank_values=True)
             if k.lower() not in _TRACKING_PARAMS]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_batch(b: pa.Table, url_col: str = "url",
                       out_col: str = "canonical_url") -> pa.Table:
    """map_batches stage: append the canonical form of ``url_col`` —
    the dedup / frontier key column (group on it + first to collapse
    syntactic variants; the exact-dedup min-id rule applies unchanged).
    """
    urls = b.column(url_col).to_pylist()
    return b.append_column(
        out_col, pa.array([canonicalize_url(u) for u in urls],
                          pa.string()))


# --- anchor text + meta robots -----------------------------------------------

_A_CLOSE_RE = re.compile(r"</a\s*>", re.IGNORECASE)


def _strip_markup(fragment: str) -> str:
    """Inter-tag text of an HTML fragment with the rawtext discipline —
    a ``<script>`` body inside an anchor contributes no anchor text."""
    parts: list[str] = []
    pos = 0
    n = len(fragment)
    while pos < n:
        m = _TAG_RE.search(fragment, pos)
        e = _END_TAG_RE.search(fragment, pos)
        if m is None and e is None:
            parts.append(fragment[pos:])
            break
        if e is not None and (m is None or e.start() < m.start()):
            parts.append(fragment[pos:e.start()])
            pos = e.end()
            continue
        parts.append(fragment[pos:m.start()])
        pos = m.end()
        name = m.group(1).lower()
        if name in RAWTEXT_TAGS and not m.group(3):
            cm = _RAWTEXT_CLOSE_RE[name].search(fragment, pos)
            if cm is None:
                pos = n
            else:
                # consume through the close tag's '>' (tokenizer rule,
                # dom.py:148-150) so it doesn't leak into anchor text
                gt = fragment.find(">", cm.start())
                pos = n if gt < 0 else gt + 1
    return "".join(parts)


def extract_anchors(html: str) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs in document order.  href is the raw
    entity-decoded attribute value (as ``extract_hrefs``); anchor_text
    is the whitespace-collapsed inter-tag text up to the first ``</a>``
    (or the next ``<a`` for unclosed anchors — they don't nest).  Total
    on malformed HTML."""
    out: list[tuple[str, str]] = []
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            break
        name = m.group(1).lower()
        if name == "a":
            hm = _HREF_RE.search(m.group(2))
            if hm:
                val = next(g for g in hm.groups() if g is not None)
                start = m.end()
                cm = _A_CLOSE_RE.search(html, start)
                nxt = html.find("<a", start)
                end = n
                if cm is not None:
                    end = cm.start()
                if 0 <= nxt < end:
                    end = nxt
                txt = collapse_ws(
                    decode_entities(_strip_markup(html[start:end]))).strip()
                out.append((decode_entities(val.strip()), txt))
                pos = end if (cm is None or end < cm.start()) else cm.end()
                continue
        pos = m.end()
        if name in RAWTEXT_TAGS and not m.group(3):
            cm = _RAWTEXT_CLOSE_RE[name].search(html, pos)
            pos = n if cm is None else cm.end()
    return out


_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9_\-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""")


def meta_robots_flags(html: str) -> tuple[bool, bool, int]:
    """(noindex, nofollow, n_meta) from ``<meta name=robots>`` directives.

    Scans start tags with the tokenizer's tag regex (rawtext bodies
    skipped, so a script echoing a meta string contributes nothing);
    directives are the comma-separated ``content`` tokens, case-folded.
    ``none`` means ``noindex, nofollow`` (robots exclusion de-facto
    standard).  n_meta counts ALL meta tags (charset etc.)."""
    noindex = nofollow = False
    n_meta = 0
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            break
        name = m.group(1).lower()
        if name == "meta":
            n_meta += 1
            attrs = {k.lower(): decode_entities(v1 or v2 or v3 or "")
                     for k, v1, v2, v3 in _ATTR_RE.findall(m.group(2))}
            if attrs.get("name", "").strip().lower() == "robots":
                toks = {t.strip().lower()
                        for t in attrs.get("content", "").split(",")}
                noindex |= bool(toks & {"noindex", "none"})
                nofollow |= bool(toks & {"nofollow", "none"})
        pos = m.end()
        if name in RAWTEXT_TAGS and not m.group(3):
            cm = _RAWTEXT_CLOSE_RE[name].search(html, pos)
            pos = n if cm is None else cm.end()
    return noindex, nofollow, n_meta
