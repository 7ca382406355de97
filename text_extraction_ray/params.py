"""Frozen extraction parameters (SURVEY.md SS2.3).

Every constant that influences the bytes of ``extracted_text`` lives here and
is folded into ``params_hash()``.  Golden fixtures under ``tests/golden/``
record the hash they were frozen with; any drift fails the test suite loudly
instead of silently shifting bytes.

These are the published jusText defaults (Pomikalek 2011) plus the Boilerpipe
wrap width (Kohlschuetter et al., WSDM 2010) used for the text-density
feature.  No reference file:line citations exist — /root/reference is an
empty checkout (SURVEY.md SS0); semantics are pinned by BASELINE.json and the
published papers.
"""

from __future__ import annotations

import hashlib
import json

# --- jusText classifier thresholds [PAPER jusText defaults] ---------------
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32
MAX_LINK_DENSITY = 0.2
MAX_HEADING_DISTANCE = 200

# --- Boilerpipe-style text-density feature --------------------------------
WRAP_COLS = 80  # words-per-wrapped-line wrap width

# --- block segmentation policy --------------------------------------------
BLOCK_TAGS = frozenset(
    {
        "p", "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "dd", "dt", "td", "th",
        "div", "pre", "blockquote",
        "article", "section", "figcaption", "caption",
        "table", "tr", "ul", "ol", "dl",
        "form", "fieldset", "main", "aside", "header", "footer", "nav",
        "address", "hr",
    }
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
SKIP_SUBTREES = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe",
     "select", "option", "textarea"}
)
# Void elements never enter the open-tag stack.
VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)
# Starting one of these implicitly closes an open <p> (HTML5 spec subset).
P_CLOSERS = frozenset(
    {"p", "div", "ul", "ol", "dl", "li", "table", "blockquote", "pre",
     "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "aside",
     "header", "footer", "nav", "form", "main", "address", "fieldset"}
)

JOINER = "\n\n"  # block joiner inside extracted_text

# --- routing / skew --------------------------------------------------------
GIANT_BYTES = 1 << 20  # pages above this go to the batch_size=1 branch

# --- PDF path --------------------------------------------------------------
PDF_MAGIC = b"%PDF-"
PDF_CELL_JOIN = "\t"   # cells inside a table row
PDF_ROW_JOIN = "\n"    # rows inside a table region
PDF_LINE_MAX_THICKNESS = 2.5  # `re` rects thinner than this are ruling lines
PDF_Y_CLUSTER_TOL = 2.0       # text runs within this y-delta share a line
PDF_PARA_GAP = 20.0           # line gaps larger than this start a new paragraph
PDF_COLUMN_GAP = 40.0         # x-gap that splits a page into two columns

SUPPORTED_LANGS = ("en", "de", "es", "zh")


def params_hash() -> str:
    """Stable hash of every byte-affecting constant (FIXTURES.md SS2)."""
    blob = json.dumps(
        {
            "LENGTH_LOW": LENGTH_LOW,
            "LENGTH_HIGH": LENGTH_HIGH,
            "STOPWORDS_LOW": STOPWORDS_LOW,
            "STOPWORDS_HIGH": STOPWORDS_HIGH,
            "MAX_LINK_DENSITY": MAX_LINK_DENSITY,
            "MAX_HEADING_DISTANCE": MAX_HEADING_DISTANCE,
            "WRAP_COLS": WRAP_COLS,
            "BLOCK_TAGS": sorted(BLOCK_TAGS),
            "HEADING_TAGS": sorted(HEADING_TAGS),
            "SKIP_SUBTREES": sorted(SKIP_SUBTREES),
            "VOID_TAGS": sorted(VOID_TAGS),
            "P_CLOSERS": sorted(P_CLOSERS),
            "JOINER": JOINER,
            "GIANT_BYTES": GIANT_BYTES,
            "PDF_CELL_JOIN": PDF_CELL_JOIN,
            "PDF_ROW_JOIN": PDF_ROW_JOIN,
            "PDF_LINE_MAX_THICKNESS": PDF_LINE_MAX_THICKNESS,
            "PDF_Y_CLUSTER_TOL": PDF_Y_CLUSTER_TOL,
            "PDF_PARA_GAP": PDF_PARA_GAP,
            "PDF_COLUMN_GAP": PDF_COLUMN_GAP,
            "SUPPORTED_LANGS": list(SUPPORTED_LANGS),
        },
        sort_keys=True,
    ).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def engine_hash() -> str:
    """params_hash extended with a digest of the byte-affecting core
    sources (core/*.py): checkpoint manifests carry THIS, so a resumed
    run never mixes outputs from two engine versions — a code change (not
    just a constant change) forces recompute of undone partitions."""
    import pathlib

    h = hashlib.sha256(params_hash().encode())
    core = pathlib.Path(__file__).parent / "core"
    for p in sorted(core.glob("*.py")):
        h.update(p.name.encode())
        h.update(p.read_bytes())
    return h.hexdigest()[:16]
