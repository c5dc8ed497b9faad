"""Candidate URL filtering and response-status predicates.

Re-derivation of walk's job-level gates:

- :func:`is_candidate` — ``Job.urlStringIsCandidate``
  (``/root/reference/lib/job.go:250-271``): reject when any ignore
  pattern occurs as a substring; accept only when the URL's host
  equals a configured domain's host AND (when the URL has a path) the
  path has that domain's path as prefix.
- :func:`ok_status` — ``Job.okResponseStatus``
  (``/root/reference/lib/job.go:273-275``): ``200 <= s <= 308``.
"""

from __future__ import annotations

from urllib.parse import urlsplit

__all__ = ["CandidateFilter", "candidate_mask", "ok_status", "ok_status_mask"]


class CandidateFilter:
    """Precompiled candidate gate for one job config.

    ``domains`` are parsed once; call sites apply :meth:`__call__`
    per URL or :meth:`mask` per batch.
    """

    def __init__(self, domains: list[str], ignore_patterns: list[str] | None = None):
        self.ignore_patterns = tuple(ignore_patterns or ())
        # The reference scans the domain list and the FIRST entry with
        # a matching host decides (lib/job.go:257-270); a host → path
        # dict of first entries is semantically identical and O(1) per
        # URL instead of O(domains) — load-bearing when a job crawls
        # hundreds of domains.
        self.by_host: dict[str, str] = {}
        for raw in domains:
            try:
                p = urlsplit(raw)
            except ValueError:
                continue
            self.by_host.setdefault(p.netloc.lower(), p.path)

    def __call__(self, rawurl: str) -> bool:
        for pat in self.ignore_patterns:
            if pat in rawurl:
                return False
        try:
            u = urlsplit(rawurl)
        except ValueError:
            return False
        d_path = self.by_host.get(u.netloc.lower())
        if d_path is None:
            return False
        # Reference quirk kept intact (lib/job.go:261-266): an empty
        # path passes the prefix check; a non-empty path must start
        # with the domain's configured path.
        if u.path != "" and not u.path.startswith(d_path):
            return False
        return True

    def mask(self, urls) -> list[bool]:
        f = self.__call__
        return [f(u) for u in urls]


def candidate_mask(urls, domains, ignore_patterns=None) -> list[bool]:
    return CandidateFilter(domains, ignore_patterns).mask(urls)


def ok_status(status: int) -> bool:
    return 200 <= status <= 308


def ok_status_mask(statuses) -> list[bool]:
    return [200 <= int(s) <= 308 for s in statuses]
