"""robots.txt parsing and path matching — the RFC 9309 subset a crawl
pipeline needs for politeness filtering (the reference has no crawl
layer; this is web-curation surface).

Group selection: the group whose ``User-agent`` token equals the
requested agent (case-insensitive) wins; otherwise the ``*`` group;
otherwise no rules (everything allowed).  Consecutive ``User-agent``
lines share the rule block that follows.  ``Allow``/``Disallow`` values
support the RFC's ``*`` wildcard and ``$`` end anchor; an empty
``Disallow:`` means allow-all and contributes no rule.  Matching is
most-specific-wins: the rule with the LONGEST pattern that matches the
path decides, and on a length tie ``Allow`` wins (RFC 9309 §2.2.2).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

Rule = tuple[bool, str, "re.Pattern[str]"]


def _rule_regex(pattern: str) -> re.Pattern[str]:
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
    return re.compile("^" + rx + ("$" if anchored else ""))


def parse_robots(text: str, agent: str = "*") -> list[Rule]:
    """Parse a robots.txt body and return the selected group's rules as
    ``(allow, pattern, compiled_regex)`` triples."""
    agent = agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if last_was_agent:
                current.append(value.lower())
            else:
                current = [value.lower()]
            for a in current:
                groups.setdefault(a, [])
            last_was_agent = True
        elif field in ("allow", "disallow"):
            last_was_agent = False
            if not value:  # empty Disallow: == allow all, no rule
                continue
            for a in current:
                groups.setdefault(a, []).append(
                    (field == "allow", value))
        else:
            last_was_agent = False
    rules = groups.get(agent)
    if rules is None:
        rules = groups.get("*", [])
    return [(allow, pat, _rule_regex(pat)) for allow, pat in rules]


def robots_allowed(paths, rules: list[Rule]) -> np.ndarray:
    """Vectorized-per-rule longest-match verdict for an array of URL
    paths: bool array, True = fetch allowed.  No rules → all True."""
    n = len(paths)
    best_len = np.full(n, -1, np.int64)
    best_allow = np.ones(n, bool)
    if not rules:
        return best_allow
    s = pd.Series(paths, dtype="object")
    for allow, pattern, rx in rules:
        m = s.str.match(rx).fillna(False).to_numpy(bool)
        plen = len(pattern)
        longer = m & (plen > best_len)
        tie_allow = m & (plen == best_len) & allow
        best_allow = np.where(longer | tie_allow, allow, best_allow)
        best_len = np.where(longer, plen, best_len)
    return best_allow
