"""Deterministic synthetic pages-table generator.

Produces the crawl input table (schema ``walk_ray.schema.PAGES``:
``url, warc_ts, html, text, lang``) plus a ``pages_meta`` sidecar
(``status, redirect_to, content_type``) and a job config, mirroring the
site shapes walk's own tests serve over httptest
(``/root/reference/lib/lib_test.go:13-81``, ``lib/testdata/``).

Topologies:

- ``self_linking`` — mirror of ``lib/testdata/self_linking/site/``:
  4 pages, each linking to ``./``, ``a.html``, ``b.html``, ``c.html``.
- ``qri_io_shaped`` — proportions of ``lib/testdata/qri_io/site/``
  (32 HTML pages + ~100 non-HTML assets), with domain/path filtering
  and HTML-sniff gating exercised.
- ``redirect_chain`` — mirror of the commented redirect test server
  (``lib/worker_test.go:40-79``): a 5-hop chain ending in 200 plus a
  12-hop chain exceeding the 10-redirect cap (``lib/worker.go:222-224``).
- ``docs_graph`` — pages derived 1:1 from a testdata ``documents``
  table: ``doc i`` links to ``(2i+1) mod N`` and ``(3i+7) mod N``.
  Reachability/sitemap over this graph is SQL-expressible with a
  recursive CTE, giving the crawl a DuckDB oracle.
- ``bench`` — parameterized web graph (``hosts`` H × ``pages_per_host``
  P, out-degree D, Zipf-skewed host popularity) for the scaling bench.

The ``text`` column is constructed *independently* of the extraction
kernel (same documented whitespace rule, different code path), so the
pytest byte-identity check is a real cross-check, not a tautology.

Everything is seeded; no wall-clock, no network.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import PAGES, PAGES_META

_EPOCH_2018_US = 1_514_764_800_000_000  # 2018-01-01T00:00:00Z in microseconds

_WORDS = (
    "data web crawl archive page link index graph node host fetch queue "
    "store map site walk snapshot record resource title text lang parquet "
    "arrow batch actor shard filter hash dedup token stream block"
).split()


def _mk_html(title: str, paragraphs: list[str], hrefs: list[tuple[str, str]]) -> tuple[bytes, str]:
    """Build an HTML page and its ground-truth extracted text.

    The text is assembled from the same parts by the documented rule
    (tags stripped, whitespace collapsed) without calling the
    extraction kernel.
    """
    body_links = "\n".join(f'  <a href="{h}">{a}</a>' for h, a in hrefs)
    paras = "\n".join(f"  <p>{p}</p>" for p in paragraphs)
    html = (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"  <title>{title}</title>\n"
        "  <style>body {{ margin: 0 }}</style>\n"
        "</head>\n<body>\n"
        f"  <h1>{title}</h1>\n{paras}\n{body_links}\n"
        "</body>\n</html>\n"
    )
    parts = [title, title] + paragraphs + [a for _, a in hrefs]
    text = " ".join(" ".join(p.split()) for p in parts if p.strip())
    return html.encode("utf-8"), text


def _para(rng: np.random.Generator, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def _ts(i: int) -> int:
    return _EPOCH_2018_US + i * 1_000_000


class SiteBuilder:
    def __init__(self):
        self.rows = []  # (url, ts_us, html, text, lang)
        self.meta = []  # (url, status, redirect_to, content_type)

    def page(self, url, title, paragraphs, hrefs, status=200, lang="en"):
        html, text = _mk_html(title, paragraphs, hrefs)
        self.rows.append((url, _ts(len(self.rows)), html, text, lang))
        self.meta.append((url, status, "", "text/html; charset=utf-8"))

    def asset(self, url, body: bytes, content_type: str, status=200):
        # Plain-text assets (e.g. CSS) pass walk's sniff gate
        # (lib/resource.go:117-119) and get text-extracted like HTML;
        # their ground truth is the whitespace-collapsed body.
        text = ""
        if content_type.startswith("text/css") or content_type.startswith("text/plain"):
            text = " ".join(body.decode("utf-8", errors="replace").split())
        self.rows.append((url, _ts(len(self.rows)), body, text, ""))
        self.meta.append((url, status, "", content_type))

    def redirect(self, url, to, status=301):
        self.rows.append((url, _ts(len(self.rows)), b"", "", ""))
        self.meta.append((url, status, to, "text/html; charset=utf-8"))

    def tables(self) -> tuple[pa.Table, pa.Table]:
        urls, ts, htmls, texts, langs = zip(*self.rows) if self.rows else ((),) * 5
        pages = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.large_binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=PAGES,
        )
        murls, stat, rto, ctype = zip(*self.meta) if self.meta else ((),) * 4
        meta = pa.table(
            {
                "url": pa.array(murls, pa.string()),
                "status": pa.array(stat, pa.int32()),
                "redirect_to": pa.array(rto, pa.string()),
                "content_type": pa.array(ctype, pa.string()),
            },
            schema=PAGES_META,
        )
        return pages, meta


def build_self_linking() -> tuple[SiteBuilder, dict]:
    b = SiteBuilder()
    hrefs = [("./", "Link to Self"), ("a.html", "Link to A"), ("b.html", "Link to B"), ("c.html", "Link to C")]
    for name in ["index.html", "a.html", "b.html", "c.html"]:
        b.page(f"http://self.test/{name}", "Self-Linking Test", [], hrefs)
    job = {
        "seeds": ["http://self.test/"],
        "domains": ["http://self.test"],
        "crawl": True,
    }
    # index.html is also served at the directory root
    b.page("http://self.test/", "Self-Linking Test", [], hrefs)
    return b, job


def build_qri_io_shaped(seed: int = 42) -> tuple[SiteBuilder, dict]:
    rng = np.random.default_rng(seed)
    b = SiteBuilder()
    host = "http://qri.test"
    sections = ["", "blog", "docs", "faq", "company", "download"]
    pages: list[str] = []
    for si, sec in enumerate(sections):
        for i in range(6 if sec else 2):
            path = f"/{sec}/p{i}.html" if sec else ("/" if i == 0 else "/about.html")
            pages.append(path)
    # ~100 assets: css/img/font/xml
    assets = (
        [f"/css/style{i}.css" for i in range(20)]
        + [f"/graphics/img{i}.png" for i in range(60)]
        + [f"/font/f{i}.woff" for i in range(10)]
        + ["/sitemap.xml", "/feed.xml"]
    )
    ext_links = ["https://www.github.com/qri-io", "https://twitter.com/qri_io"]
    for pi, path in enumerate(pages):
        n_links = int(rng.integers(3, 8))
        targets = [pages[int(t)] for t in rng.integers(0, len(pages), n_links)]
        asset_refs = [assets[int(a)] for a in rng.integers(0, len(assets), 3)]
        hrefs = [(t, f"to {t}") for t in targets]
        hrefs += [(a, f"asset {a}") for a in asset_refs]
        hrefs += [(ext_links[pi % 2], "external")]
        b.page(host + path, f"Qri {path}", [_para(rng, 30), _para(rng, 20)], hrefs)
    for a in assets:
        if a.endswith(".png"):
            b.asset(host + a, b"\x89PNG\r\n\x1a\n" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)), "image/png")
        elif a.endswith(".woff"):
            b.asset(host + a, b"wOFF" + bytes(rng.integers(0, 256, 64, dtype=np.uint8)), "font/woff")
        elif a.endswith(".xml"):
            b.asset(host + a, b'<?xml version="1.0"?><urlset></urlset>', "text/xml; charset=utf-8")
        else:
            b.asset(host + a, f"body {{ color: #{int(rng.integers(0, 0xFFFFFF)):06x} }}".encode(), "text/css")
    # one missing page (404) and one server error (retried then failed)
    b.page(host + "/gone.html", "Gone", [], [], status=404)
    b.page(host + "/flaky.html", "Flaky", [], [], status=500)
    # robots.txt (only honored when the job sets polite=True)
    b.asset(
        host + "/robots.txt",
        b"User-agent: *\nDisallow: /company/\n",
        "text/plain; charset=utf-8",
    )
    for p in pages[:4]:
        pass
    job = {
        "seeds": [host + "/"],
        "domains": [host],
        "ignore_patterns": ["/download/p4", "twitter.com"],
        "crawl": True,
    }
    return b, job


def build_redirect_chain() -> tuple[SiteBuilder, dict]:
    b = SiteBuilder()
    host = "http://redir.test"
    b.page(host + "/", "Redirect Root", ["start"], [("/hop/0", "chain"), ("/long/0", "long chain")])
    for i in range(4):
        b.redirect(f"{host}/hop/{i}", f"{host}/hop/{i+1}", status=301)
    b.page(host + "/hop/4", "Chain End", ["made it"], [])
    for i in range(12):
        b.redirect(f"{host}/long/{i}", f"{host}/long/{i+1}", status=302)
    b.page(host + "/long/12", "Too Far", ["unreachable"], [])
    job = {"seeds": [host + "/"], "domains": [host], "crawl": True}
    return b, job


def build_docs_graph(sf_dir: str) -> tuple[SiteBuilder, dict]:
    """Pages derived from ``{sf_dir}/documents.parquet``: url
    ``http://docs.test/doc/{i}``, title ``Doc {i}``, body = the
    document's text, links to ``(2i+1) mod N`` and ``(3i+7) mod N``.

    SQL-oracle-friendly: reachability from doc 0 is a recursive CTE
    over the same arithmetic (see ``__ray_entry__.oracle_sql``).
    """
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"])
    n = docs.num_rows
    b = SiteBuilder()
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    for i, doc_id in enumerate(ids):
        l1, l2 = (2 * doc_id + 1) % n, (3 * doc_id + 7) % n
        hrefs = [(f"/doc/{l1}", f"next {l1}"), (f"/doc/{l2}", f"jump {l2}")]
        body = " ".join(str(texts[i]).split())
        b.page(f"http://docs.test/doc/{doc_id}", f"Doc {doc_id}", [body], hrefs, lang=langs[i] or "en")
    job = {"seeds": ["http://docs.test/doc/0"], "domains": ["http://docs.test"], "crawl": True}
    return b, job


def build_bench(hosts: int = 50, pages_per_host: int = 200, out_degree: int = 12,
                seed: int = 42, zipf_a: float = 1.3,
                words_per_page: int = 400) -> tuple[SiteBuilder, dict]:
    """Parameterized web graph for the scaling bench.

    Host popularity is Zipf-skewed: link targets prefer low-numbered
    hosts, producing the hot-host skew the frontier sharding must
    absorb. All pages are reachable from host0/p0 via two 4-ary
    spanning trees (inter-host from each host's p0, intra-host over
    page ids), so the crawl's BFS depth is O(log4 hosts + log4
    pages_per_host) — the epoch count stays logarithmic in graph size.
    """
    rng = np.random.default_rng(seed)
    b = SiteBuilder()
    n = hosts * pages_per_host

    def page_url(h, p):
        return f"http://h{h:04d}.bench.test/p{p}.html"

    # Zipf-ish host weights
    w = 1.0 / np.arange(1, hosts + 1) ** zipf_a
    w /= w.sum()
    tgt_hosts = rng.choice(hosts, size=(n, out_degree), p=w)
    tgt_pages = rng.integers(0, pages_per_host, size=(n, out_degree))
    for h in range(hosts):
        for p in range(pages_per_host):
            i = h * pages_per_host + p
            hrefs = [
                (page_url(int(th), int(tp)), f"l{j}")
                for j, (th, tp) in enumerate(zip(tgt_hosts[i], tgt_pages[i]))
            ]
            # intra-host 4-ary spanning tree over page ids (shallow
            # BFS depth → epoch count stays ~log4 of graph size)
            for child in range(4 * p + 1, 4 * p + 5):
                if child < pages_per_host:
                    hrefs.append((page_url(h, child), f"c{child}"))
            # inter-host 4-ary spanning tree from each host's p0
            if p == 0:
                for hc in range(4 * h + 1, 4 * h + 5):
                    if hc < hosts:
                        hrefs.append((page_url(hc, 0), f"h{hc}"))
            paras = [_para(rng, words_per_page // 2), _para(rng, words_per_page // 2)]
            b.page(page_url(h, p), f"Bench {h}/{p}", paras, hrefs)
    job = {
        "seeds": [page_url(0, 0)],
        "domains": [f"http://h{h:04d}.bench.test" for h in range(hosts)],
        "crawl": True,
    }
    return b, job


_BUILDERS = {
    "self_linking": lambda **kw: build_self_linking(),
    "qri_io_shaped": lambda **kw: build_qri_io_shaped(**kw),
    "redirect_chain": lambda **kw: build_redirect_chain(),
    "docs_graph": lambda **kw: build_docs_graph(**kw),
    "bench": lambda **kw: build_bench(**kw),
}


def generate_pages(kind: str, out_dir: str, **params) -> dict:
    """Materialize a pages table + meta + job config under ``out_dir``.

    Returns ``{"pages": path, "pages_meta": path, "job": config_dict}``.
    Re-uses existing output when the parameter fingerprint matches
    (deterministic generation makes that safe).
    """
    fingerprint = hashlib.sha256(
        json.dumps({"kind": kind, **{k: str(v) for k, v in params.items()}}, sort_keys=True).encode()
    ).hexdigest()[:16]
    os.makedirs(out_dir, exist_ok=True)
    stamp = os.path.join(out_dir, "FINGERPRINT")
    pages_path = os.path.join(out_dir, "pages.parquet")
    meta_path = os.path.join(out_dir, "pages_meta.parquet")
    job_path = os.path.join(out_dir, "job.json")
    if os.path.exists(stamp) and open(stamp).read() == fingerprint and os.path.exists(pages_path):
        with open(job_path) as f:
            return {"pages": pages_path, "pages_meta": meta_path, "job": json.load(f)}

    builder, job = _BUILDERS[kind](**params)
    pages, meta = builder.tables()
    pq.write_table(pages, pages_path)
    pq.write_table(meta, meta_path)
    with open(job_path, "w") as f:
        json.dump(job, f, indent=2)
    with open(stamp, "w") as f:
        f.write(fingerprint)
    return {"pages": pages_path, "pages_meta": meta_path, "job": job}
