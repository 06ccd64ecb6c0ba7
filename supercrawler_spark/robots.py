"""Pure-Python robots.txt parser with `robots-parser` (npm) semantics.

The reference consults robots via the npm ``robots-parser`` package:
``robots.isAllowed(url, userAgent)`` (/root/reference/lib/Crawler.js:421-436)
and ``robots.getSitemaps()`` (/root/reference/lib/handlers/robotsParser.js:31).

Semantics implemented (Google REP draft, which robots-parser follows):
- groups of one or more ``User-agent:`` lines share the following rules
  (multi-UA groups exercised by /root/reference/test/Crawler.spec.js:506-523)
- agent match: the group whose UA token is the longest case-insensitive
  substring-prefix match of the requesting agent wins; ``*`` is fallback
- rule match: longest-pattern wins; ``Allow`` wins length ties
- patterns support ``*`` wildcard and ``$`` end-anchor
- empty ``Disallow:`` means allow-all
- ``Sitemap:`` directives are global (any position), order-preserved

No Spark imports: usable inside vectorized pandas UDFs and by the oracle.
"""

from __future__ import annotations

import re


class RobotsTxt:
    def __init__(self, robots_txt: str):
        self.groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        self.sitemaps: list[str] = []
        self._parse(robots_txt or "")

    def _parse(self, text: str) -> None:
        cur_agents: list[str] = []
        cur_rules: list[tuple[bool, str]] = []
        agents_open = False  # collecting consecutive User-agent lines
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if not agents_open:
                    if cur_agents:
                        self.groups.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                    agents_open = True
                cur_agents.append(value.lower())
            elif field in ("allow", "disallow"):
                agents_open = False
                if cur_agents:
                    cur_rules.append((field == "allow", value))
            elif field == "sitemap":
                agents_open = False
                if value:
                    self.sitemaps.append(value)
            else:
                agents_open = False
        if cur_agents:
            self.groups.append((cur_agents, cur_rules))

    def _rules_for(self, user_agent: str) -> list[tuple[bool, str]]:
        ua = (user_agent or "").lower()
        best_len, best_rules = -1, None
        star_rules = None
        for agents, rules in self.groups:
            for agent in agents:
                if agent == "*":
                    if star_rules is None:
                        star_rules = rules
                elif agent and agent in ua and len(agent) > best_len:
                    best_len, best_rules = len(agent), rules
        if best_rules is not None:
            return best_rules
        if star_rules is not None:
            return star_rules
        return []

    def is_allowed(self, url: str, user_agent: str) -> bool:
        from .urls import parse

        p = parse(url)
        path = p.path or "/"
        if p.query:
            path += "?" + p.query
        best: tuple[int, bool] | None = None  # (pattern_len, allow)
        for allow, pattern in self._rules_for(user_agent):
            if pattern == "":
                if allow:
                    continue  # empty Disallow → allow all (no-op rule)
                continue  # empty Allow is also a no-op
            if _pattern_matches(pattern, path):
                key = (len(pattern), allow)
                if best is None or key[0] > best[0] or (key[0] == best[0] and allow and not best[1]):
                    best = key
        if best is None:
            return True
        return best[1]

    def get_sitemaps(self) -> list[str]:
        return list(self.sitemaps)


def _pattern_matches(pattern: str, path: str) -> bool:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    regex = "^" + ".*".join(parts) + ("$" if anchored else "")
    return re.match(regex, path) is not None


def is_allowed(robots_txt: str, url: str, user_agent: str) -> bool:
    return RobotsTxt(robots_txt).is_allowed(url, user_agent)


def extract_sitemaps(robots_txt: str) -> list[str]:
    return RobotsTxt(robots_txt).get_sitemaps()
