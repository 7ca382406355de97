"""Tokenizer + entity decoder unit tests (SURVEY SS5.2)."""

from text_extraction_ray.core.dom import collapse_ws, decode_entities, tokenize


def toks(s):
    return list(tokenize(s))


def test_basic_tags_and_text():
    assert toks("<p>hi</p>") == [
        ("start", "p", False, False), ("text", "hi"), ("end", "p")]


def test_case_and_attrs():
    t = toks('<DIV CLASS="x" data-y=\'1\'>a</DIV>')
    assert t[0] == ("start", "div", False, False)
    assert t[-1] == ("end", "div")


def test_href_detection():
    assert toks('<a href="/x">l</a>')[0] == ("start", "a", False, True)
    assert toks('<a name="x">l</a>')[0] == ("start", "a", False, False)


def test_self_closing_and_void():
    assert toks("<br/>")[0] == ("start", "br", True, False)
    assert toks("<img src='x.png'>")[0] == ("start", "img", False, False)


def test_comment_dropped():
    assert toks("a<!-- <p>no</p> -->b") == [("text", "a"), ("text", "b")]


def test_unterminated_comment_swallows():
    assert toks("a<!-- no end") == [("text", "a")]


def test_cdata_is_raw_text():
    assert toks("<![CDATA[x < y & z]]>") == [("text", "x < y & z")]


def test_doctype_and_pi_dropped():
    assert toks("<!DOCTYPE html><?xml version='1'?>t") == [("text", "t")]


def test_script_raw_mode():
    t = toks("<script>if(a<b){x='</div>'}</script>after")
    # content of script is consumed up to its close tag; no spurious tags
    names = [x for x in t if x[0] == "start"]
    assert names == [("start", "script", False, False)]
    assert t[-1] == ("text", "after")


def test_script_unterminated():
    t = toks("<script>var x=1; // no close")
    assert t == [("start", "script", False, False)]


def test_stray_lt_is_text():
    assert toks("a < b") == [("text", "a "), ("text", "<"), ("text", " b")]


def test_quoted_gt_in_attr():
    t = toks('<a href="x>y">z</a>')
    assert t[0][1] == "a"
    assert ("text", "z") in t


def test_entities_named_numeric_hex():
    assert decode_entities("&amp; &#65; &#x42; &lt;") == "& A B <"


def test_entity_no_semicolon_legacy():
    assert decode_entities("&amp x") == "& x"
    assert decode_entities("&copy 2024") == "\xa9 2024"


def test_entity_unknown_passthrough():
    assert decode_entities("&unknown; &;") == "&unknown; &;"


def test_entity_invalid_numeric():
    assert decode_entities("&#xD800; &#0;") == "� �"


def test_nbsp():
    assert decode_entities("a&nbsp;b") == "a\xa0b"


def test_collapse_ws():
    assert collapse_ws("a \t\n b\r\nc") == "a b c"
    # unicode spaces are NOT collapsed (byte-stability invariant)
    assert collapse_ws("a b") == "a b"
