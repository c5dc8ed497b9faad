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

# netloc/path split of an absolute URL: identical to urlsplit's
# netloc (up to the first of ``/?#`` after ``://``, userinfo kept)
# and path (up to ``?`` or ``#``) for scheme-prefixed URLs
_URL_RX = r"^[^:/?#]+://(?P<h>[^/?#]*)(?P<p>[^?#]*)"


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

    def mask_array(self, urls: list[str]):
        """Vectorized gate: same decision as :meth:`__call__` per URL,
        computed with Arrow kernels (regex host/path split + set
        membership) instead of 7M ``urlsplit`` calls — the candidate
        filter was the single hottest function in the crawl profile.
        Rows the regex cannot split (no ``scheme://``) fall back to
        the scalar path. Returns a numpy bool array."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = urls if isinstance(urls, pa.Array) else pa.array(urls, pa.string())
        ext = pc.extract_regex(arr, _URL_RX)
        hosts = pc.utf8_lower(pc.struct_field(ext, "h"))
        ok = pc.is_in(hosts, value_set=pa.array(list(self.by_host), pa.string()))
        ok = pc.fill_null(ok, False).to_numpy(zero_copy_only=False)

        # non-trivial configured paths: prefix-check the rows that
        # passed the host gate (path "" always passes, reference quirk)
        if any(p not in ("", "/") for p in self.by_host.values()):
            paths = pc.struct_field(ext, "p").to_numpy(zero_copy_only=False)
            hosts_np = hosts.to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(ok):
                p = paths[i]
                if p and not p.startswith(self.by_host[hosts_np[i]]):
                    ok[i] = False

        # regex misses (scheme-less and other odd URLs): scalar path
        missed = pc.is_null(ext).to_numpy(zero_copy_only=False)
        if missed.any():
            f = self.__call__
            for i in np.flatnonzero(missed):
                ok[i] = f(arr[i].as_py())

        if self.ignore_patterns:
            for pat in self.ignore_patterns:
                hit = pc.match_substring(arr, pat).to_numpy(zero_copy_only=False)
                ok &= ~hit
        return ok


def candidate_mask(urls, domains, ignore_patterns=None) -> list[bool]:
    return CandidateFilter(domains, ignore_patterns).mask(urls)


def ok_status(status: int) -> bool:
    return 200 <= status <= 308


def ok_status_mask(statuses) -> list[bool]:
    return [200 <= int(s) <= 308 for s in statuses]
