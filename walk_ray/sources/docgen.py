"""Deterministic ``documents``-table generator at arbitrary scale —
the volume-run input for the data-hygiene suite (the crawl has its own
2M-page robustness run; this gives the corpus ops one).

Mirrors the driver testdata shape exactly (``doc_id:int64,
text:string, lang:string, source:string, n_chars:int64``; same word
flavor, mean ~45 words/doc) but at any row count, written as SHARDED
parquet (``documents.parquet/`` directory) so the table enters Ray as
many blocks, the way a real corpus would.

Dup structure is explicit so dedup ops do real work: ``dup_frac`` of
docs copy one of ``n_templates`` template texts verbatim (exact dups,
cross-shard), ``near_frac`` copy a template with one word appended
(near dups for MinHash/LSH). Everything is a pure function of
``(seed, shard)`` — shards generate independently and reproducibly.

Generation is vectorized the same way ``chunk_dedup`` chunks are: draw
all word indices for a shard at once, group them into per-doc lists
with one Arrow ListArray, render texts with ``binary_join`` — no
per-doc Python string building.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

DOCGEN_VERSION = 1

_VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch agg filter query big key window row part table stream merge "
    "data vector join customer the a of and to supplier region nation "
    "order item price ship date comment clerk status total disc tax "
    "return flag mode instruct priority segment"
).split()

_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
_SOURCES = [f"src{i}" for i in range(5)]


def _render_texts(word_idx: np.ndarray, doc_lens: np.ndarray,
                  vocab_arr: pa.Array) -> pa.Array:
    """(flat word indices, words-per-doc) → one string per doc, all in
    Arrow: take the words, regroup by offsets, binary_join."""
    import pyarrow.compute as pc

    words = vocab_arr.take(pa.array(word_idx, pa.int32()))
    offs = np.zeros(len(doc_lens) + 1, dtype=np.int32)
    np.cumsum(doc_lens, out=offs[1:])
    lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), words)
    return pc.binary_join(lists, " ")


def _templates(seed: int, n_templates: int, mean_words: int) -> list[str]:
    rng = np.random.default_rng(seed ^ 0x7E397E39)
    lens = rng.integers(mean_words // 2, mean_words * 2,
                        n_templates).astype(np.int64)
    idx = rng.integers(0, len(_VOCAB), int(lens.sum()))
    texts = _render_texts(idx, lens, pa.array(_VOCAB, pa.string()))
    return texts.to_pylist()


def generate_shard(shard: int, shard_docs: int, seed: int,
                   templates: list[str], dup_frac: float,
                   near_frac: float, mean_words: int) -> pa.Table:
    rng = np.random.default_rng((seed * 1_000_003 + shard) & 0xFFFFFFFF)
    n = shard_docs
    lens = rng.integers(mean_words // 3, mean_words * 2, n).astype(np.int64)
    idx = rng.integers(0, len(_VOCAB), int(lens.sum()))
    texts = _render_texts(idx, lens, pa.array(_VOCAB, pa.string()))

    # overlay dup structure (vectorized gather from the template list)
    u = rng.random(n)
    tmpl_arr = pa.array(templates, pa.string())
    pick = rng.integers(0, len(templates), n)
    texts_np = texts.to_numpy(zero_copy_only=False)
    tmpl_np = tmpl_arr.to_numpy(zero_copy_only=False)
    is_dup = u < dup_frac
    is_near = (u >= dup_frac) & (u < dup_frac + near_frac)
    texts_np[is_dup] = tmpl_np[pick[is_dup]]
    near_pick = pick[is_near]
    suffix = rng.integers(0, len(_VOCAB), len(near_pick))
    texts_np[is_near] = np.array(
        [tmpl_np[p] + " " + _VOCAB[s] for p, s in zip(near_pick, suffix)],
        dtype=object) if len(near_pick) else texts_np[is_near]

    text_col = pa.array(texts_np, pa.string())
    import pyarrow.compute as pc

    return pa.table({
        "doc_id": pa.array(shard * shard_docs + np.arange(n), pa.int64()),
        "text": text_col,
        "lang": pa.array(np.array(_LANGS, dtype=object)[
            rng.choice(len(_LANGS), n, p=_LANG_P)], pa.string()),
        "source": pa.array(np.array(_SOURCES, dtype=object)[
            rng.integers(0, len(_SOURCES), n)], pa.string()),
        "n_chars": pc.utf8_length(text_col).cast(pa.int64()),
    })


def generate_documents(out_dir: str, n_docs: int = 5_000_000,
                       shard_docs: int = 250_000, seed: int = 42,
                       dup_frac: float = 0.05, near_frac: float = 0.02,
                       n_templates: int = 10_000,
                       mean_words: int = 45) -> str:
    """Write ``out_dir/documents.parquet/part-*.parquet``; returns
    ``out_dir``. Fingerprint-cached: re-calls with identical params
    return immediately."""
    import pyarrow.parquet as pq

    params = dict(v=DOCGEN_VERSION, n_docs=n_docs, shard_docs=shard_docs,
                  seed=seed, dup_frac=dup_frac, near_frac=near_frac,
                  n_templates=n_templates, mean_words=mean_words)
    marker = os.path.join(out_dir, "docgen.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return out_dir
    tdir = os.path.join(out_dir, "documents.parquet")
    os.makedirs(tdir, exist_ok=True)
    for f in os.listdir(tdir):
        os.unlink(os.path.join(tdir, f))

    templates = _templates(seed, n_templates, mean_words)
    n_shards = -(-n_docs // shard_docs)
    for s in range(n_shards):
        docs = min(shard_docs, n_docs - s * shard_docs)
        t = generate_shard(s, shard_docs, seed, templates,
                           dup_frac, near_frac, mean_words)
        if docs < shard_docs:
            t = t.slice(0, docs)
        pq.write_table(t, os.path.join(tdir, f"part-{s:05d}.parquet"),
                       row_group_size=65536)
    with open(marker, "w") as f:
        json.dump(params, f)
    return out_dir
