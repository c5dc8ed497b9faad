"""Deduplication suite over a ``documents``-shaped table.

Five strategies, each the canonical large-scale shape:

- :func:`exact_dedup` — hash-partitioned exact dedup: md5(text) →
  ``groupby(hash)`` keep min doc_id. The grouped shuffle moves only
  (hash, doc_id) pairs, never text.
- :func:`minhash_lsh_dedup` — shingle → minhash signature (vectorized
  numpy) → banded LSH bucket groupby → candidate pairs → signature-
  estimated Jaccard verify → connected components. The scale path for
  near-dup text.
- :func:`simhash_dedup` — 64-bit simhash over token features, banded
  into 4×16-bit keys; candidates verified by Hamming distance.
- :func:`ngram_jaccard_pairs` — EXACT word-n-gram Jaccard similarity
  pairs. ``exact=True`` runs the all-pairs baseline (small scale /
  oracle-checkable); otherwise pairs come from MinHash-LSH candidates
  and only those are exactly verified.
- :func:`embedding_cosine_pairs` / :func:`embedding_dedup` — near-dup
  by embedding cosine; exact blocked matmul baseline + cluster
  reduction.

Connected components run on the driver over the verified-pair set
only (provably small: pairs above threshold), per the documented
partitioning assumption.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "embedding_dedup",
]

_MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------- exact

def exact_dedup(sf_dir: str):
    """(text_hash, doc_id=min) — one row per distinct content."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "text_hash": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].fillna("")
                ],
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(add_hash, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    )


# -------------------------------------------------------------- minhash

def _word_ngrams(words: list[str], n: int) -> list[str]:
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") >> 3
            for s in set(shingles)
        ),
        dtype=np.uint64,
    )


class MinHasher:
    """Vectorized minhash: perm_i(h) = a_i * h + b_i over the 2^64
    ring (wraparound multiply is a standard universal-ish permutation
    family for minhash; fully numpy-vectorizable)."""

    def __init__(self, num_perm: int = 128, seed: int = 17, ngram: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        h = _hash_shingles(_word_ngrams(text.split(), self.ngram))
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * h[None, :] + self.b[:, None]  # (P, S) u64 wrap
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"].fillna("")]
        return pd.DataFrame({"doc_id": batch["doc_id"], "sig": [s.tolist() for s in sigs]})


def minhash_signatures(sf_dir: str, num_perm: int = 128, ngram: int = 3):
    # stage instance → stateless tasks (no actor-pool CPU reservation;
    # the hasher state is just two small numpy arrays)
    return _docs(sf_dir).map_batches(
        MinHasher(num_perm=num_perm, ngram=ngram), batch_format="pandas"
    )


def minhash_lsh_dedup(sf_dir: str, num_perm: int = 128, bands: int = 32, ngram: int = 3,
                      threshold: float = 0.5):
    """Near-dup clusters: banded LSH → candidate pairs → signature-
    estimated Jaccard ≥ threshold → min-label connected components.

    Returns (doc_id, cluster_id) for every doc in some cluster of
    size ≥ 2; cluster_id = min doc_id of the cluster.
    """
    import ray
    import ray.data as rd

    rows_per_band = num_perm // bands
    sigs = minhash_signatures(sf_dir, num_perm, ngram)

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc, sig in zip(batch["doc_id"], batch["sig"]):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
                band_hashes.append(hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest())
                band_ids.append(b)
                doc_ids.append(doc)
        return pd.DataFrame({"doc_id": doc_ids, "band_id": band_ids, "band_hash": band_hashes})

    # signatures are also needed for verification — they're compact
    # (num_perm u64 per doc), so broadcast them.
    sig_map = {r["doc_id"]: np.asarray(r["sig"], dtype=np.uint64) for r in sigs.take_all()}
    sig_ref = ray.put(sig_map)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        sigs.map_batches(band_rows, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    class Verify:
        def __init__(self):
            self._sigs = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self._sigs is None:  # lazy zero-copy fetch, once per task
                self._sigs = ray.get(sig_ref)
            batch = batch.drop_duplicates(["a", "b"])
            keep_a, keep_b, est = [], [], []
            for a_, b_ in zip(batch["a"], batch["b"]):
                sa, sb = self._sigs[a_], self._sigs[b_]
                j = float((sa == sb).mean())
                if j >= threshold:
                    keep_a.append(a_)
                    keep_b.append(b_)
                    est.append(round(j, 6))
            return pd.DataFrame({"a": keep_a, "b": keep_b, "est_jaccard": est})

    verified = pairs.map_batches(Verify(), batch_format="pandas")

    # connected components on the (small) verified pair set
    edge_df = verified.to_pandas().drop_duplicates(["a", "b"])
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_, b_ in zip(edge_df["a"], edge_df["b"]):
        ra, rb = find(int(a_)), find(int(b_))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, int] = {x: find(x) for x in parent}
    out = pd.DataFrame(
        sorted(clusters.items()), columns=["doc_id", "cluster_id"]
    ) if clusters else pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                     "cluster_id": pd.Series([], dtype="int64")})
    return rd.from_pandas(out)


# -------------------------------------------------------------- simhash

class SimHasher:
    """64-bit simhash over whitespace tokens (term-frequency weights)."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        uniq, counts = np.unique(words, return_counts=True)
        digests = np.frombuffer(
            b"".join(hashlib.blake2b(w.encode(), digest_size=8).digest() for w in uniq),
            dtype=np.uint8,
        ).reshape(len(uniq), 8)
        bits = np.unpackbits(digests, axis=1).astype(np.int64)  # (W, 64)
        acc = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = [self.simhash(t) for t in batch["text"].fillna("")]
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["simhash"] = pd.Series(hs, dtype="uint64").values
        return out


def simhash_dedup(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by simhash: 4×16-bit band blocking → Hamming
    verify ≤ max_hamming. Returns (a, b, hamming)."""
    import ray
    import ray.data as rd

    sigs = _docs(sf_dir).map_batches(SimHasher(), batch_format="pandas")
    sig_map = dict(zip(*(lambda df: (df["doc_id"], df["simhash"]))(sigs.to_pandas())))
    sig_ref = ray.put({int(k): int(v) for k, v in sig_map.items()})

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "band_id": [], "band_val": []}
        for doc, h in zip(batch["doc_id"], batch["simhash"]):
            h = int(h)
            for b in range(4):
                rows["doc_id"].append(doc)
                rows["band_id"].append(b)
                rows["band_val"].append((h >> (16 * b)) & 0xFFFF)
        return pd.DataFrame(rows)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    class Verify:
        def __init__(self):
            self._sigs = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self._sigs is None:
                self._sigs = ray.get(sig_ref)
            batch = batch.drop_duplicates(["a", "b"])
            keep = {"a": [], "b": [], "hamming": []}
            for a_, b_ in zip(batch["a"], batch["b"]):
                d = bin(self._sigs[int(a_)] ^ self._sigs[int(b_)]).count("1")
                if d <= max_hamming:
                    keep["a"].append(a_)
                    keep["b"].append(b_)
                    keep["hamming"].append(d)
            return pd.DataFrame(keep)

    pairs = (
        sigs.map_batches(band_rows, batch_format="pandas")
        .groupby(["band_id", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(Verify(), batch_format="pandas")
    )
    # global pair dedup (a pair can match in several bands)
    df = pairs.to_pandas().drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return rd.from_pandas(df.reset_index(drop=True))


# -------------------------------------------------- exact n-gram jaccard

def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.2, exact: bool = True):
    """Pairs (a, b, jaccard≥threshold) over word-n-gram sets.

    ``exact=True``: blocked all-pairs baseline — each batch of docs is
    compared against the broadcast full gram-set dict. Quadratic;
    intended for oracle verification and small inputs. With
    ``exact=False`` candidates come from MinHash-LSH first (scale
    path) and only candidates are exactly verified.
    """
    import ray
    import ray.data as rd

    docs = _docs(sf_dir)

    def gram_sets(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "grams": [
                    sorted(set(_word_ngrams(t.split(), n))) for t in batch["text"].fillna("")
                ],
            }
        )

    grams_ds = docs.map_batches(gram_sets, batch_format="pandas")
    gram_map = {int(r["doc_id"]): set(r["grams"]) for r in grams_ds.take_all()}
    gram_ref = ray.put(gram_map)

    if exact:
        class AllPairs:
            def __init__(self):
                self._grams = None
                self._ids = None

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                if self._grams is None:
                    self._grams = ray.get(gram_ref)
                    self._ids = sorted(self._grams)
                grams, self.all_ids = self._grams, self._ids
                out = {"a": [], "b": [], "jaccard": []}
                for a_ in batch["doc_id"]:
                    ga = grams[int(a_)]
                    for b_ in self.all_ids:
                        if b_ <= int(a_):
                            continue
                        gb = grams[b_]
                        inter = len(ga & gb)
                        if not inter:
                            continue
                        j = inter / (len(ga) + len(gb) - inter)
                        if j >= threshold:
                            out["a"].append(int(a_))
                            out["b"].append(b_)
                            out["jaccard"].append(round(j, 6))
                return pd.DataFrame(out)

        pairs = docs.map_batches(AllPairs(), batch_format="pandas", batch_size=64)
        df = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        return rd.from_pandas(df)

    cand = minhash_lsh_dedup(sf_dir, threshold=0.0)  # cluster step skipped below

    class VerifyExact:
        def __init__(self):
            self._grams = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self._grams is None:
                self._grams = ray.get(gram_ref)
            out = {"a": [], "b": [], "jaccard": []}
            for a_, b_ in zip(batch["a"], batch["b"]):
                ga, gb = self._grams[int(a_)], self._grams[int(b_)]
                inter = len(ga & gb)
                j = inter / (len(ga) + len(gb) - inter) if inter else 0.0
                if j >= threshold:
                    out["a"].append(int(a_))
                    out["b"].append(int(b_))
                    out["jaccard"].append(round(j, 6))
            return pd.DataFrame(out)

    return cand.map_batches(VerifyExact(), batch_format="pandas")


# ---------------------------------------------------------- embeddings

def _emb_matrix(sf_dir: str):
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def embedding_cosine_pairs(sf_dir: str, threshold: float = 0.9):
    """Exact near-dup pairs (a < b, cosine ≥ threshold): per-batch
    matmul against the broadcast normalized matrix."""
    import ray
    import ray.data as rd

    ids, mat = _emb_matrix(sf_dir)
    ref = ray.put((ids, mat))

    class Block:
        def __init__(self):
            self._loaded = False

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not self._loaded:
                self.ids, self.mat = ray.get(ref)
                self.pos = {int(v): i for i, v in enumerate(self.ids)}
                self._loaded = True
            rows = [self.pos[int(v)] for v in batch["vec_id"]]
            sub = self.mat[rows]  # (B, D)
            sims = sub @ self.mat.T  # (B, N)
            out = {"a": [], "b": [], "cosine": []}
            for r, a_ in zip(sims, batch["vec_id"]):
                hits = np.nonzero(r >= threshold)[0]
                for h in hits:
                    b_ = int(self.ids[h])
                    if b_ > int(a_):
                        out["a"].append(int(a_))
                        out["b"].append(b_)
                        out["cosine"].append(round(float(r[h]), 6))
            return pd.DataFrame(out)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    pairs = ds.map_batches(Block(), batch_format="pandas", batch_size=128)
    df = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return rd.from_pandas(df)


def embedding_dedup(sf_dir: str, threshold: float = 0.9):
    """Near-dup clusters from cosine pairs (min-label components)."""
    import ray.data as rd

    edges = embedding_cosine_pairs(sf_dir, threshold).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_, b_ in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a_)), find(int(b_))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {x: find(x) for x in parent}
    out = (
        pd.DataFrame(sorted(clusters.items()), columns=["vec_id", "cluster_id"])
        if clusters
        else pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                           "cluster_id": pd.Series([], dtype="int64")})
    )
    return rd.from_pandas(out)
