"""Generator invariants: determinism + text byte-identity vs the
extraction kernel (the per-row conformance invariant)."""

import pyarrow.parquet as pq

from walk_ray.functions.extract import extract_batch
from walk_ray.sources.testgen import generate_pages

SF = "/root/testdata/sf0.001"


def _check_text_invariant(pages_path):
    t = pq.read_table(pages_path)
    out = extract_batch(t["url"].to_pylist(), t["html"].to_pylist())
    stored = t["text"].to_pylist()
    for url, got, want in zip(t["url"].to_pylist(), out["text"], stored):
        assert got == want, f"text mismatch for {url}: {got!r} != {want!r}"


def test_self_linking(tmp_path):
    r = generate_pages("self_linking", str(tmp_path / "sl"))
    t = pq.read_table(r["pages"])
    assert t.num_rows == 5
    _check_text_invariant(r["pages"])


def test_qri_io_shaped(tmp_path):
    r = generate_pages("qri_io_shaped", str(tmp_path / "q"), seed=42)
    t = pq.read_table(r["pages"])
    assert t.num_rows > 100
    _check_text_invariant(r["pages"])
    # deterministic across regeneration
    r2 = generate_pages("qri_io_shaped", str(tmp_path / "q2"), seed=42)
    t2 = pq.read_table(r2["pages"])
    assert t.equals(t2)


def test_docs_graph(tmp_path):
    r = generate_pages("docs_graph", str(tmp_path / "d"), sf_dir=SF)
    t = pq.read_table(r["pages"])
    assert t.num_rows == 500
    _check_text_invariant(r["pages"])
    # titles extract correctly
    out = extract_batch(t["url"].to_pylist()[:5], t["html"].to_pylist()[:5])
    assert out["title"][0].startswith("Doc ")


def test_bench_graph(tmp_path):
    r = generate_pages("bench", str(tmp_path / "b"), hosts=5, pages_per_host=10, seed=7)
    t = pq.read_table(r["pages"])
    assert t.num_rows == 50
    _check_text_invariant(r["pages"])
