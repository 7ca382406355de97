"""Block segmentation, features, jusText classification, assembly.

SURVEY.md SS2.2 M4, M6-M9 and SS2.3(a).  Pure Python, no Ray, no Arrow —
this exact module runs inside the single-process oracle AND inside the Ray
actor pools, which is what makes "byte-identical extracted text per url"
(BASELINE.json north_rule) hold by construction.

Classifier: jusText two-phase algorithm per Pomikalek's 2011 thesis
(context-free threshold classification, then context-sensitive revision of
short/near-good blocks by their good/bad neighbours, with heading
promotion).  Constants live in params.py and are hashed into the goldens.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..params import (
    BLOCK_TAGS,
    HEADING_TAGS,
    JOINER,
    LENGTH_HIGH,
    LENGTH_LOW,
    MAX_HEADING_DISTANCE,
    MAX_LINK_DENSITY,
    P_CLOSERS,
    SKIP_SUBTREES,
    STOPWORDS_HIGH,
    STOPWORDS_LOW,
    VOID_TAGS,
    WRAP_COLS,
)
from .dom import RAWTEXT_TAGS, collapse_ws, decode_entities, tokenize
from .stopwords import STOPWORDS, stoplist_for, vote_lang


@dataclass(slots=True)
class Block:
    block_id: int
    tag_path: str
    text: str = ""
    n_chars: int = 0
    n_words: int = 0
    n_link_chars: int = 0
    link_density: float = 0.0
    text_density: float = 0.0
    stop_density: float = 0.0
    heading: bool = False
    cf_class: str = "bad"   # context-free class
    cls: str = "bad"        # final class after revision


def segment_blocks_reference(doc: str) -> list[Block]:
    """Reference implementation over dom.tokenize — kept as the equivalence
    oracle for the fused fast path below (tests/test_fused_equivalence)."""
    blocks: list[Block] = []
    stack: list[str] = []
    skip_depth = 0
    a_depth = 0
    parts: list[str] = []
    link_chars = 0
    br_run = 0
    path_at_open = ""
    next_id = 0

    def flush() -> None:
        nonlocal parts, link_chars, next_id, path_at_open
        if parts:
            text = collapse_ws("".join(parts)).strip()
            if text:
                b = Block(block_id=next_id, tag_path=path_at_open)
                b.text = text
                b.n_link_chars = min(link_chars, len(text))
                blocks.append(b)
                next_id += 1
        parts = []
        link_chars = 0
        path_at_open = ""

    for tok in tokenize(doc):
        kind = tok[0]
        if kind == "text":
            if skip_depth:
                continue
            raw = decode_entities(tok[1])
            if not raw:
                continue
            # collapse happens ONCE at flush; the br-run reset and the
            # link-char accounting preserve the collapsed-per-piece
            # semantics exactly (ASCII-ws strip, unicode strip for links)
            if raw.strip(" \t\n\r\f\x0b"):
                br_run = 0
            if not parts:
                path_at_open = "/".join(stack)
            parts.append(raw)
            if a_depth:
                piece = collapse_ws(raw)
                link_chars += len(piece.strip() or piece)
        elif kind == "start":
            name, self_closing = tok[1], tok[2]
            if name == "br":
                br_run += 1
                if br_run >= 2:
                    flush()
                    br_run = 0
                else:
                    parts.append(" ")
                continue
            br_run = 0
            if name in SKIP_SUBTREES:
                flush()
                if not self_closing:
                    skip_depth += 1
                    stack.append(name)
                continue
            if name in BLOCK_TAGS:
                flush()
            if name == "a" and tok[3]:
                a_depth += 1
                stack.append(name)
                continue
            if not self_closing and name not in VOID_TAGS:
                # implied </p> before block-level openers (HTML5 subset)
                if name in P_CLOSERS and stack and stack[-1] == "p":
                    stack.pop()
                stack.append(name)
            if name in VOID_TAGS and name != "br" and parts:
                parts.append(" ")
        elif kind == "end":
            name = tok[1]
            br_run = 0
            if name in SKIP_SUBTREES:
                if name in stack:
                    while stack:
                        popped = stack.pop()
                        if popped in SKIP_SUBTREES:
                            skip_depth = max(0, skip_depth - 1)
                        if popped == name:
                            break
                continue
            if name in BLOCK_TAGS:
                flush()
            if name == "a":
                if a_depth:
                    a_depth -= 1
                if "a" in stack:
                    while stack and stack.pop() != "a":
                        pass
                continue
            if name in stack:
                while stack and stack.pop() != name:
                    pass
            if name in ("td", "th", "li") and parts:
                parts.append(" ")
    flush()
    return blocks


def segment_blocks(doc: str) -> list[Block]:
    """Fold markup into normalized text blocks (M3+M4+M5+M6, fused).

    Single pass with fully inlined tokenizer dispatch: extraction is
    memory-bandwidth-bound at high parallelism (BASELINE.md), so the
    tokenizer from dom.py is inlined here and per-token closures/tuples are
    eliminated.  Byte-equivalence with the tokenize()-based reference
    implementation above is asserted by tests/test_fused_equivalence.py and
    the golden suite.  Mirrors the reference's contour→cell-box extraction
    step [RECON]: markup in, ordered candidate regions out.
    """
    from .dom import _END_TAG_RE, _RAWTEXT_CLOSE_RE, _TAG_RE, _attr_has_href

    blocks: list[Block] = []
    stack: list[str] = []
    skip_depth = 0
    a_depth = 0
    parts: list[str] = []
    link_chars = 0
    br_run = 0
    path_at_open = ""
    next_id = 0
    n = len(doc)
    i = 0
    find = doc.find
    _ws = " \t\n\r\f\x0b"

    def flush() -> None:
        nonlocal parts, link_chars, next_id, path_at_open
        if parts:
            text = collapse_ws("".join(parts)).strip()
            if text:
                b = Block(block_id=next_id, tag_path=path_at_open)
                b.text = text
                b.n_link_chars = min(link_chars, len(text))
                blocks.append(b)
                next_id += 1
            parts = []
        link_chars = 0
        path_at_open = ""

    while i < n:
        lt = find("<", i)
        # ---- text run before the next '<' (or to EOF) ----
        if lt != i:
            seg = doc[i:lt] if lt >= 0 else doc[i:]
            if not skip_depth and seg:
                raw = decode_entities(seg)
                if raw:
                    if raw.strip(_ws):
                        br_run = 0
                    if not parts:
                        path_at_open = "/".join(stack)
                    parts.append(raw)
                    if a_depth:
                        piece = collapse_ws(raw)
                        link_chars += len(piece.strip() or piece)
            if lt < 0:
                break
        if lt + 1 >= n:
            # trailing bare '<' — non-whitespace text, so it resets the
            # br run exactly like the reference's text-token branch
            if not skip_depth:
                br_run = 0
                if not parts:
                    path_at_open = "/".join(stack)
                parts.append("<")
                if a_depth:
                    link_chars += 1
            break
        c = doc[lt + 1]
        if c.isalpha():
            m = _TAG_RE.match(doc, lt)
            if m:
                g, attrs, slash = m.groups()  # one C call, not three
                name = g if g.islower() else g.lower()
                self_closing = slash == "/"
                i = m.end()
                # ---- start-tag state transitions ----
                if name == "br":
                    br_run += 1
                    if br_run >= 2:
                        if parts:
                            flush()
                        br_run = 0
                    else:
                        parts.append(" ")
                    continue
                br_run = 0
                if name in SKIP_SUBTREES:
                    if parts:
                        flush()
                    if not self_closing:
                        skip_depth += 1
                        stack.append(name)
                else:
                    if name in BLOCK_TAGS:
                        if parts:
                            flush()
                    if name == "a" and _attr_has_href(attrs):
                        a_depth += 1
                        stack.append(name)
                        continue
                    if not self_closing and name not in VOID_TAGS:
                        if name in P_CLOSERS and stack and stack[-1] == "p":
                            stack.pop()
                        stack.append(name)
                    elif name in VOID_TAGS and parts:
                        parts.append(" ")
                if name in RAWTEXT_TAGS and not self_closing:
                    cm = _RAWTEXT_CLOSE_RE[name].search(doc, i)
                    if cm is None:
                        break
                    gt = find(">", cm.start())
                    # ---- end-tag transitions for the rawtext close ----
                    br_run = 0
                    if name in stack:
                        while stack:
                            popped = stack.pop()
                            if popped in SKIP_SUBTREES:
                                skip_depth = max(0, skip_depth - 1)
                            if popped == name:
                                break
                    i = n if gt < 0 else gt + 1
                continue
            end = find(">", lt)
            if end < 0:
                if not skip_depth:
                    raw = decode_entities(doc[lt:])
                    if raw:
                        if raw.strip(_ws):
                            br_run = 0
                        if not parts:
                            path_at_open = "/".join(stack)
                        parts.append(raw)
                        if a_depth:
                            piece = collapse_ws(raw)
                            link_chars += len(piece.strip() or piece)
                break
            i = end + 1
            continue
        if c == "/":
            m = _END_TAG_RE.match(doc, lt)
            if m:
                g = m.group(1)
                name = g if g.islower() else g.lower()
                i = m.end()
                # ---- end-tag state transitions ----
                br_run = 0
                if name in SKIP_SUBTREES:
                    if name in stack:
                        while stack:
                            popped = stack.pop()
                            if popped in SKIP_SUBTREES:
                                skip_depth = max(0, skip_depth - 1)
                            if popped == name:
                                break
                    continue
                if name in BLOCK_TAGS:
                    if parts:
                        flush()
                if name == "a":
                    if a_depth:
                        a_depth -= 1
                    if "a" in stack:
                        while stack and stack.pop() != "a":
                            pass
                    continue
                if name in stack:
                    while stack and stack.pop() != name:
                        pass
                if parts and name in ("td", "th", "li"):
                    parts.append(" ")
            else:
                end = find(">", lt)
                i = n if end < 0 else end + 1
            continue
        if c == "!":
            if doc.startswith("<!--", lt):
                end = find("-->", lt + 4)
                i = n if end < 0 else end + 3
                continue
            if doc.startswith("<![CDATA[", lt):
                end = find("]]>", lt + 9)
                seg = doc[lt + 9 : (end if end >= 0 else n)]
                if not skip_depth and seg:
                    raw = decode_entities(seg)
                    if raw:
                        if raw.strip(_ws):
                            br_run = 0
                        if not parts:
                            path_at_open = "/".join(stack)
                        parts.append(raw)
                        if a_depth:
                            piece = collapse_ws(raw)
                            link_chars += len(piece.strip() or piece)
                i = n if end < 0 else end + 3
                continue
            end = find(">", lt)
            i = n if end < 0 else end + 1
            continue
        if c == "?":
            end = find(">", lt)
            i = n if end < 0 else end + 1
            continue
        # '<' followed by junk → literal text; non-whitespace, so it
        # resets the br run exactly like the reference's text-token branch
        # (regression: '<br><<br>< ' must stay ONE block, not two)
        if not skip_depth:
            br_run = 0
            if not parts:
                path_at_open = "/".join(stack)
            parts.append("<")
            if a_depth:
                link_chars += 1
        i = lt + 1

    flush()
    return blocks


def featurize(blocks: list[Block], stoplist: frozenset[str]) -> None:
    """Compute per-block features (M7): link/stop density + Boilerpipe-style
    text density (words per WRAP_COLS-wrapped line, Kohlschuetter WSDM'10)."""
    contains = stoplist.__contains__
    for b in blocks:
        # ONE split, on the lowered text: str.lower never creates/removes
        # spaces, so the word count and per-word membership are identical
        # to splitting the original and lowering word-by-word
        lower_words = b.text.lower().split(" ")
        b.n_chars = len(b.text)
        b.n_words = len(lower_words)
        b.link_density = b.n_link_chars / max(b.n_chars, 1)
        n_lines = max(1, -(-b.n_chars // WRAP_COLS))  # ceil division
        b.text_density = b.n_words / n_lines
        stops = sum(map(contains, lower_words))
        b.stop_density = stops / max(b.n_words, 1)
        b.heading = any(seg in HEADING_TAGS for seg in b.tag_path.split("/"))


import re as _re

_HEADING_PATH_RE = _re.compile(r"(?:^|/)h[1-6](?:/|$)")


def featurize_classify(blocks: list[Block], stoplist: frozenset[str]) -> None:
    """Fused M7+M8 phase 1: features computed lazily — a block that the
    link-density / copyright / length rules already classify never pays for
    the stopword count (most boilerplate blocks are short).  Identical
    classification to featurize()+classify_context_free() (golden-checked);
    only the debug-only fields (text_density, n_words on early-classified
    blocks) are left at 0 on this fast path."""
    contains = stoplist.__contains__
    for b in blocks:
        text = b.text
        n = len(text)
        b.n_chars = n
        b.link_density = b.n_link_chars / max(n, 1)
        b.heading = _HEADING_PATH_RE.search(b.tag_path) is not None
        if b.link_density > MAX_LINK_DENSITY:
            cls = "bad"
        elif "\xa9" in text or "&copy" in text:
            cls = "bad"
        elif n < LENGTH_LOW:
            cls = "bad" if b.n_link_chars > 0 else "short"
        else:
            lower_words = text.lower().split(" ")
            b.n_words = len(lower_words)
            stops = sum(map(contains, lower_words))
            b.stop_density = sd = stops / max(b.n_words, 1)
            if sd >= STOPWORDS_HIGH:
                cls = "good" if n > LENGTH_HIGH else "neargood"
            elif sd >= STOPWORDS_LOW:
                cls = "neargood"
            else:
                cls = "bad"
        b.cf_class = cls
        b.cls = cls


def classify_context_free(blocks: list[Block]) -> None:
    """jusText phase 1 (M8): threshold classification into
    bad / short / near-good / good."""
    for b in blocks:
        if b.link_density > MAX_LINK_DENSITY:
            b.cf_class = "bad"
        elif "\xa9" in b.text or "&copy" in b.text:
            b.cf_class = "bad"
        elif b.n_chars < LENGTH_LOW:
            b.cf_class = "bad" if b.n_link_chars > 0 else "short"
        elif b.stop_density >= STOPWORDS_HIGH:
            b.cf_class = "good" if b.n_chars > LENGTH_HIGH else "neargood"
        elif b.stop_density >= STOPWORDS_LOW:
            b.cf_class = "neargood"
        else:
            b.cf_class = "bad"
        b.cls = b.cf_class


def _neighbour(blocks: list[Block], i: int, inc: int, ignore_neargood: bool) -> str:
    boundary = -1 if inc < 0 else len(blocks)
    j = i + inc
    while j != boundary:
        c = blocks[j].cls
        if c in ("good", "bad"):
            return c
        if c == "neargood" and not ignore_neargood:
            return c
        j += inc
    return "bad"


def classify_context_sensitive(blocks: list[Block]) -> None:
    """jusText phase 2 (M8): revise short/near-good by neighbourhood."""
    # promote short headings within MAX_HEADING_DISTANCE of a good block
    for i, b in enumerate(blocks):
        if not (b.heading and b.cls == "short"):
            continue
        dist = 0
        for j in range(i + 1, len(blocks)):
            if dist > MAX_HEADING_DISTANCE:
                break
            if blocks[j].cls == "good":
                b.cls = "neargood"
                break
            dist += blocks[j].n_chars

    new_classes: dict[int, str] = {}
    for i, b in enumerate(blocks):
        if b.cls != "short":
            continue
        prev_n = _neighbour(blocks, i, -1, True)
        next_n = _neighbour(blocks, i, +1, True)
        pair = {prev_n, next_n}
        if pair == {"good"}:
            new_classes[i] = "good"
        elif pair == {"bad"}:
            new_classes[i] = "bad"
        elif (prev_n == "bad" and _neighbour(blocks, i, -1, False) == "neargood") or (
            next_n == "bad" and _neighbour(blocks, i, +1, False) == "neargood"
        ):
            new_classes[i] = "good"
        else:
            new_classes[i] = "bad"
    for i, c in new_classes.items():
        blocks[i].cls = c

    for i, b in enumerate(blocks):
        if b.cls != "neargood":
            continue
        prev_n = _neighbour(blocks, i, -1, True)
        next_n = _neighbour(blocks, i, +1, True)
        b.cls = "bad" if (prev_n, next_n) == ("bad", "bad") else "good"

    # final heading rescue: heading demoted to bad by context but not
    # context-free bad, with a good block within distance → good
    for i, b in enumerate(blocks):
        if not (b.heading and b.cls == "bad" and b.cf_class != "bad"):
            continue
        dist = 0
        for j in range(i + 1, len(blocks)):
            if dist > MAX_HEADING_DISTANCE:
                break
            if blocks[j].cls == "good":
                b.cls = "good"
                break
            dist += blocks[j].n_chars


def assemble(blocks: list[Block]) -> tuple[str, list[tuple[int, int]], int, int]:
    """Join good blocks (M9). Returns (text, spans, kept, dropped).

    The returned string's bytes ARE the invariant (BASELINE.json [B:6]);
    mirrors the reference's row-major cell→CSV assembly [RECON].
    """
    spans: list[tuple[int, int]] = []
    pieces: list[str] = []
    pos = 0
    kept = 0
    for b in blocks:
        if b.cls != "good":
            continue
        if pieces:
            pos += len(JOINER)
        pieces.append(b.text)
        spans.append((pos, pos + len(b.text)))
        pos += len(b.text)
        kept += 1
    return JOINER.join(pieces), spans, kept, len(blocks) - kept


def extract_html(doc: str, crawl_lang: str = "") -> dict:
    """Full HTML path M3→M9 over decoded text. Returns result dict."""
    blocks = segment_blocks(doc)
    lang = crawl_lang if crawl_lang in STOPWORDS else ""
    if not lang:
        all_words: list[str] = []
        for b in blocks:
            all_words.extend(b.text.split(" "))
        lang = vote_lang(all_words)
    featurize_classify(blocks, stoplist_for(lang))
    classify_context_sensitive(blocks)
    text, spans, kept, dropped = assemble(blocks)
    return {
        "lang": lang,
        "extracted_text": text,
        "spans": spans,
        "n_blocks_kept": kept,
        "n_blocks_dropped": dropped,
        "blocks": blocks,
    }
