"""Frozen per-language stopword sets (SURVEY.md SS2.3).

Hand-committed minimal lists — generated once, NOT imported from any library,
so the jusText stop-density feature is byte-stable forever.  The synthetic
corpus generator draws from the same lists, giving the classifier real
signal.  Chinese entries are function words treated as space-separated tokens
(the synthetic zh corpus is tokenized; see sources/synth.py).
"""

from __future__ import annotations

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """a about above after again all also am an and any are as at be because
        been before being below between both but by could did do does doing down
        during each few for from further had has have having he her here hers
        him his how i if in into is it its just me more most my no nor not of
        off on once only or other our out over own same she should so some such
        than that the their them then there these they this those through to
        too under until up very was we were what when where which while who why
        will with would you your""".split()
    ),
    "de": frozenset(
        """aber alle als also am an auch auf aus bei bin bis bist da damit dann
        das dass dein den denn der des dich die dies diese doch dort du durch
        ein eine einem einen einer eines er es fuer hab habe haben hat hatte
        hier ich ihr im in ist ja jede jedem jeden jeder jedes kann kein
        koennen machen man mehr mein mit muss nach nicht noch nun nur ob oder
        schon sein seine sich sie sind so ueber um und uns unser vom von vor
        war waren was weil wenn werden wie wieder wir wird wo zu zum zur""".split()
    ),
    "es": frozenset(
        """a al algo antes aqui como con cual cuando de del desde donde dos el
        ella ellas ellos en entre era eran es esa ese eso esta estas este esto
        estos fue ha han hasta hay la las le les lo los mas me mi mis mucho muy
        nada ni no nos nosotros o os otra otro para pero poco por porque que
        quien se ser si sin sobre son su sus tambien te tiene todo todos tu un
        una uno unos y ya yo""".split()
    ),
    "zh": frozenset(
        """的 了 在 是 我 有 和 就 不 人 都 一 一个 上 也 很 到 说 要 去 你
        会 着 没有 看 好 自己 这 那 他 她 它 们 与 或 而 被 把 让 向 从 对
        于 为 以 之 其 此 但 并 等 因为 所以 如果 虽然 可以 这个 那个 什么
        怎么 多少 以及 还是 已经 正在""".split()
    ),
}

DEFAULT_LANG = "en"


def stoplist_for(lang: str) -> frozenset[str]:
    return STOPWORDS.get(lang, STOPWORDS[DEFAULT_LANG])


def vote_lang(words: list[str]) -> str:
    """Pick the language whose stoplist covers the most words.

    Deterministic: ties break by lang-code sort order.  Used when the crawl's
    ``lang`` column is empty or not one of the supported tags (CCNet-style
    re-identification, SURVEY.md SS2.4 A3).
    """
    if not words:
        return DEFAULT_LANG
    lowered = [w.lower() for w in words]
    best_lang = DEFAULT_LANG
    best_hits = -1
    for lang in sorted(STOPWORDS):
        sl = STOPWORDS[lang]
        hits = sum(1 for w in lowered if w in sl)
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    return best_lang
