"""robots.txt parsing + path matching (Robots Exclusion Protocol,
RFC 9309 subset).

From-scratch parser for the crawl-frontier pipeline: ``User-agent``
groups (only ``*`` groups are retained — the engine crawls as a
generic agent), ``Allow`` / ``Disallow`` path rules with ``*``
wildcards and the ``$`` end anchor, and ``Crawl-delay``.  Matching
follows RFC 9309 / Google semantics: the most specific rule wins
(longest pattern, wildcards excluded from the length), with ``Allow``
beating ``Disallow`` on ties; no matching rule means allowed; an
empty ``Disallow:`` value is a no-op.  Unknown directives and
comments are skipped — the parser is total on arbitrary bytes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    # (allow, specificity, compiled matcher, raw pattern)
    rules: list[tuple[bool, int, "re.Pattern", str]] = field(
        default_factory=list)
    crawl_delay: float = 1.0

    def allowed(self, path: str) -> bool:
        best: tuple[int, bool] | None = None
        for allow, spec, rx, _raw in self.rules:
            if rx.match(path) and (
                    best is None or spec > best[0]
                    or (spec == best[0] and allow and not best[1])):
                best = (spec, allow)
        return True if best is None else best[1]


def _compile_rule(pattern: str) -> tuple[int, "re.Pattern"]:
    """Specificity = literal length (wildcards don't count); matcher
    anchors at the path start, ``*`` spans anything, ``$`` pins the
    end."""
    spec = len(pattern.replace("*", "").rstrip("$"))
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(re.escape(c) if c != "*" else ".*" for c in body)
    if anchored:
        rx += "$"
    return spec, re.compile(rx)


def parse_robots(body: str) -> RobotsRules:
    """Rules of every ``User-agent: *`` group (multiple groups merge,
    per RFC 9309 §2.2.1)."""
    out = RobotsRules()
    in_star = False
    seen_agent_line = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # a UA line after rules starts a NEW group; consecutive UA
            # lines share the group being opened
            if seen_agent_line:
                in_star = in_star or val == "*"
            else:
                in_star = val == "*"
                seen_agent_line = True
            continue
        seen_agent_line = False
        if not in_star:
            continue
        if key in ("allow", "disallow"):
            if not val:          # empty Disallow == allow everything
                continue
            spec, rx = _compile_rule(val)
            out.rules.append((key == "allow", spec, rx, val))
        elif key == "crawl-delay":
            try:
                out.crawl_delay = float(val)
            except ValueError:
                pass
    return out
