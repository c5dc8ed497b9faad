"""robots.txt cache (politeness, ST5).

Walk delegates robots handling to fetchbot
(``/root/reference/lib/worker.go:81-83``: ``DisablePoliteness = !Polite``);
here a single cache actor resolves ``http://host/robots.txt`` from the
page store the first time a host is seen and answers batched
allow/deny checks (``User-agent: *`` groups, prefix ``Disallow`` /
``Allow`` rules, longest-match-wins per RFC 9309).
"""

from __future__ import annotations

from urllib.parse import urlsplit

__all__ = ["RobotsCache", "parse_robots", "parse_robots_full"]


def parse_robots(body: bytes) -> list[tuple[str, bool]]:
    """Rules for ``User-agent: *`` as ``(path_prefix, allowed)``."""
    return parse_robots_full(body)[0]


def parse_robots_full(body: bytes) -> tuple[list[tuple[str, bool]], float | None]:
    """Rules + ``Crawl-delay`` (seconds) for the ``*`` group —
    fetchbot honors robots Crawl-delay in the reference's polite mode
    (lib/worker.go:81-83 delegates politeness wholesale)."""
    rules: list[tuple[str, bool]] = []
    crawl_delay: float | None = None
    in_star = False
    in_agent_run = False  # inside a run of consecutive User-agent lines
    for raw in body.decode("utf-8", errors="replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            # a group is a run of consecutive User-agent lines followed
            # by rules (RFC 9309 §2.1); the group applies to * iff ANY
            # agent line in the run is *. A new run resets the flag.
            if not in_agent_run:
                in_star = False
                in_agent_run = True
            in_star = in_star or value == "*"
        elif field in ("disallow", "allow"):
            in_agent_run = False
            if not in_star:
                continue
            if value:
                rules.append((value, field == "allow"))
            elif field == "disallow":
                pass  # empty Disallow = allow all (no rule)
        elif field == "crawl-delay":
            in_agent_run = False
            if in_star:
                try:
                    crawl_delay = float(value)
                except ValueError:
                    pass
        else:
            in_agent_run = False  # any other directive ends the run
    return rules, crawl_delay


class RobotsCache:
    def __init__(self, store_handles: list | None = None):
        self.stores = store_handles or []
        self.rules: dict[str, list[tuple[str, bool]]] = {}
        self.delays: dict[str, float | None] = {}

    def _load(self, hosts: list[str]) -> None:
        from ..sources.pages import partition_of, request_key  # noqa: F401

        missing = [h for h in hosts if h not in self.rules]
        if not missing or not self.stores:
            for h in missing:
                self.rules[h] = []
                self.delays[h] = None
            return
        import ray

        urls = [f"http://{h}/robots.txt" for h in missing]
        parts = partition_of(urls, len(self.stores))
        keys = [request_key(u) for u in urls]
        by_part: dict[int, list[int]] = {}
        for i, p in enumerate(parts):
            by_part.setdefault(int(p), []).append(i)
        for p, idxs in by_part.items():
            rows = ray.get(self.stores[p].lookup.remote([keys[i] for i in idxs]))
            for i, (found, status, _r, body, _ts, _ct, _h) in zip(idxs, rows):
                host = missing[i]
                if found and status == 200:
                    self.rules[host], self.delays[host] = parse_robots_full(bytes(body))
                else:
                    self.rules[host] = []
                    self.delays[host] = None

    def crawl_delays(self, hosts: list[str]) -> list:
        """Crawl-delay seconds per host (None = none declared)."""
        self._load(sorted(set(hosts)))
        return [self.delays.get(h) for h in hosts]

    def allowed(self, urls: list[str]) -> list[bool]:
        hosts = []
        paths = []
        for u in urls:
            try:
                p = urlsplit(u)
                hosts.append(p.netloc.lower().rsplit("@", 1)[-1])
                paths.append(p.path or "/")
            except ValueError:
                hosts.append("")
                paths.append("/")
        self._load(sorted(set(hosts)))
        out = []
        for h, path in zip(hosts, paths):
            rules = self.rules.get(h, [])
            verdict = True
            best = -1
            for prefix, allow in rules:
                if path.startswith(prefix) and len(prefix) > best:
                    best = len(prefix)
                    verdict = allow
            out.append(verdict)
        return out
