"""Similarity search over an ``embeddings``-shaped table
(``vec_id, embedding: list<float>, label``).

- :func:`ann_brute_topk` — exact top-k cosine: the query matrix is
  broadcast once (``ray.put``), every data batch does one numpy
  matmul against it and emits per-batch partial top-k; partials merge
  in a final tiny reduction. This is the exactness baseline AND the
  standard distributed brute-force shape (scales linearly in data,
  constant in queries).
- :func:`build_ivf_index` / :func:`ann_ivf_topk` — IVF variant:
  deterministic k-means coarse centroids (seeded, trained on a bounded
  Dataset sample), embeddings materialized ONCE as parquet partitioned
  by inverted-list cell; queries read only the union of their
  ``nprobe`` probed cells' partitions. The scale path: ~nprobe/nlist
  of the data is READ (I/O pruning, not just compute masking).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

__all__ = ["ann_brute_topk", "ann_ivf_topk", "build_ivf_index", "kmeans_fit"]


def _load_query_vectors(sf_dir: str, query_ids: list[int]) -> np.ndarray:
    """Read ONLY the query rows via parquet predicate pushdown — the
    driver never materializes the embeddings table."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(query_ids))],
    )
    pos = {int(v): i for i, v in enumerate(t["vec_id"].to_pylist())}
    missing = [q for q in query_ids if int(q) not in pos]
    if missing:
        raise KeyError(f"query vec_ids not found: {missing}")
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[
        [pos[int(q)] for q in query_ids]
    ]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


_PARTIAL_SCHEMA = None


def _partial_schema():
    import pyarrow as pa

    global _PARTIAL_SCHEMA
    if _PARTIAL_SCHEMA is None:
        _PARTIAL_SCHEMA = pa.schema([
            ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
            ("cosine", pa.float64())])
    return _PARTIAL_SCHEMA


def _emb_block(t):
    """(vec_ids, unit-normalized matrix) from an Arrow batch: the
    list column flattens to ONE contiguous float buffer and reshapes
    — ``tolist()`` built B × D Python floats per batch."""
    emb = t["embedding"].combine_chunks()
    vals = emb.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False)
    vecs = vals.reshape(t.num_rows, -1)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return vids, vecs / norms


def ann_brute_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10):
    """Exact cosine top-k for each query vector.

    Returns (query_id, neighbor_id, cosine, rank) with rank 1..k,
    ties broken by neighbor_id; the query itself is excluded.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    query_ids = query_ids if query_ids is not None else list(range(10))
    q_mat = _load_query_vectors(sf_dir, query_ids)  # (Q, D)
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_mat))

    class PartialTopK:
        def __init__(self):
            self._loaded = False

        def __call__(self, t: pa.Table) -> pa.Table:
            if not self._loaded:
                self.q_ids, self.q = ray.get(q_ref)
                self._loaded = True
            if t.num_rows == 0:
                return _partial_schema().empty_table()
            vids, vecs = _emb_block(t)
            sims = self.q @ vecs.T  # (Q, B)
            out = {"query_id": [], "neighbor_id": [], "cosine": []}
            kk = min(k + 1, sims.shape[1])
            # the loop is over QUERIES (bounded), not rows
            for qi, row in enumerate(sims):
                top = np.argpartition(-row, kk - 1)[:kk]
                for j in top:
                    nid = int(vids[j])
                    if nid == int(self.q_ids[qi]):
                        continue
                    out["query_id"].append(int(self.q_ids[qi]))
                    out["neighbor_id"].append(nid)
                    out["cosine"].append(float(row[j]))
            return pa.table(out, schema=_partial_schema())

    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(PartialTopK(), batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    # final merge: tiny (Q × k × n_batches rows)
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", group_keys=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out["cosine"] = out["cosine"].round(6)
    return rd.from_pandas(out.reset_index(drop=True))


def kmeans_fit(mat: np.ndarray, n_clusters: int, seed: int = 11, iters: int = 10) -> np.ndarray:
    """Small deterministic Lloyd's k-means (numpy, driver-side) for the
    IVF coarse quantizer. Input rows should be L2-normalized."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(mat), size=n_clusters, replace=False)
    centroids = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def _train_quantizer(sf_dir: str, nlist: int, sample: int, seed: int) -> np.ndarray:
    """Deterministic coarse quantizer from a bounded Dataset sample —
    the driver never reads the full table."""
    import ray.data as rd

    train = np.asarray(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .limit(sample)
        .to_pandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    tn = np.linalg.norm(train, axis=1, keepdims=True)
    tn[tn == 0] = 1.0
    return kmeans_fit(train / tn, min(nlist, len(train)), seed=seed)


def build_ivf_index(sf_dir: str, index_dir: str, nlist: int = 16, sample: int = 4096,
                    seed: int = 11) -> str:
    """Materialize the IVF index ONCE: embeddings written as parquet
    hash-partitioned by coarse-cell assignment (``cell=K/``) plus the
    centroid matrix. Queries then READ only their probed cells'
    partitions — the 100-TB shape where probing prunes I/O, not just
    compute. Fingerprint-cached like the page partitions."""
    import ray
    import ray.data as rd

    stamp = os.path.join(index_dir, "DONE")
    tag = f"{os.path.abspath(sf_dir)}|{nlist}|{sample}|{seed}|v2"
    if os.path.exists(stamp) and open(stamp).read() == tag:
        return index_dir
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    centroids = _train_quantizer(sf_dir, nlist, sample, seed)
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    cent_ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self._c = None

        def __call__(self, t):
            import pyarrow as pa

            if self._c is None:
                self._c = ray.get(cent_ref)
            if t.num_rows == 0:
                return t
            _, vecs = _emb_block(t)
            cells = np.argmax(vecs @ self._c.T, axis=1).astype(np.int64)
            # cell = hive partition key (moves to dir name); cell_id =
            # data copy (the partition col is stripped on write)
            return t.append_column("cell", pa.array(cells)) \
                    .append_column("cell_id", pa.array(cells))

    (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(Assign(), batch_format="pyarrow")
        # align blocks with partition values before the partitioned
        # write — otherwise every (block × cell) pair becomes its own
        # tiny file and probe reads drown in per-file open overhead
        .sort("cell")
        .write_parquet(os.path.join(index_dir, "cells"), partition_cols=["cell"])
    )
    with open(stamp, "w") as f:
        f.write(tag)
    return index_dir


def ann_ivf_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
                 nlist: int = 16, nprobe: int = 4, sample: int = 4096, seed: int = 11,
                 index_dir: str = ""):
    """IVF-flat approximate top-k over a materialized inverted index:
    only the union of the queries' ``nprobe`` nearest cells is READ
    (partition-pruned parquet), so both I/O and compute scale with
    nprobe/nlist of the data. Returns (query_id, neighbor_id, cosine,
    rank) like the brute baseline (approximate recall)."""
    import hashlib as _hashlib

    import ray
    import ray.data as rd

    query_ids = query_ids if query_ids is not None else list(range(10))
    if not index_dir:
        h = _hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
        index_dir = f"/tmp/walk_ray_ivf/{h}_n{nlist}_s{sample}_r{seed}"
    build_ivf_index(sf_dir, index_dir, nlist, sample, seed)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q_mat = _load_query_vectors(sf_dir, query_ids)
    probe_lists = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_mat, centroids, probe_lists))

    class ProbeTopK:
        def __init__(self):
            self._loaded = False

        def __call__(self, t):
            import pyarrow as pa

            if not self._loaded:
                self.q_ids, self.q, self.centroids, self.probes = ray.get(ref)
                self._loaded = True
            if t.num_rows == 0:
                return _partial_schema().empty_table()
            vids, vecs = _emb_block(t)
            # inverted-list id comes off the stored cell_id column —
            # no re-assignment compute
            assign = t["cell_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            out = {"query_id": [], "neighbor_id": [], "cosine": []}
            sims = self.q @ vecs.T
            # loop over QUERIES (bounded); membership is one np.isin
            for qi in range(len(self.q_ids)):
                mask = np.isin(assign, self.probes[qi])
                mask &= vids != int(self.q_ids[qi])
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                row = sims[qi, cand]
                kk = min(k, len(cand))
                top = cand[np.argpartition(-row, kk - 1)[:kk]]
                for j in top:
                    out["query_id"].append(int(self.q_ids[qi]))
                    out["neighbor_id"].append(int(vids[j]))
                    out["cosine"].append(float(sims[qi, j]))
            return pa.table(out, schema=_partial_schema())

    # READ only the probed cells' partitions (union over queries) —
    # unprobed cells' files are never opened
    import glob as _glob

    probed_cells = sorted({int(c) for row in probe_lists for c in row})
    cell_files = [
        f
        for c in probed_cells
        for f in sorted(_glob.glob(os.path.join(index_dir, "cells", f"cell={c}", "*.parquet")))
    ]
    partials = (
        rd.read_parquet(cell_files, columns=["vec_id", "embedding", "cell_id"])
        .map_batches(ProbeTopK(), batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", group_keys=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out["cosine"] = out["cosine"].round(6)
    return rd.from_pandas(out.reset_index(drop=True))
