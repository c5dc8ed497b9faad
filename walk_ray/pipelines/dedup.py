"""Deduplication suite over a ``documents``-shaped table.

Five strategies, each the canonical large-scale shape:

- :func:`exact_dedup` — hash-partitioned exact dedup: md5(text) →
  ``groupby(hash)`` keep min doc_id. The grouped shuffle moves only
  (hash, doc_id) pairs, never text.
- :func:`minhash_lsh_dedup` — shingle → minhash signature (batch-
  vectorized numpy) → banded LSH → estimated-Jaccard verify →
  connected components. Two physical plans behind one semantic result
  (chosen by input size, like a broadcast-vs-shuffle join threshold):
  sig-on-band (one exchange, signature rides the band rows, inline
  verify) for small corpora, and a skinny three-exchange plan for
  volume where the bands-fold signature amplification would spill the
  object store. No driver materialization of per-doc state anywhere.
  The bucket co-partitions run as raw-task hash exchanges
  (``stages/exchange.py``) — the keys are dense bucket ids, so Ray
  Data's sort-based groupby shuffle pays for ordering nothing needs.
- :func:`simhash_dedup` — 64-bit simhash over token features, banded
  into 4×16-bit keys (exact recall at Hamming ≤ 3 by pigeonhole); the
  8-byte hash rides on the band rows, buckets verify locally.
- :func:`ngram_jaccard_pairs` — EXACT word-n-gram Jaccard similarity
  pairs. ``exact=True`` runs the all-pairs broadcast baseline (small
  scale / oracle-checkable only); ``exact=False`` is the scale path:
  MinHash-LSH candidates, then two bucket exchanges (membership ⋈
  gram-sets by doc hash; doc payloads ⋈ pairs by verify partition)
  shuffle only candidate docs' gram sets.
- :func:`embedding_cosine_pairs` / :func:`embedding_dedup` — near-dup
  by embedding cosine; exact blocked-matmul baseline plus an
  IVF-cell-blocked scale path (:func:`embedding_cosine_pairs_blocked`).

The cluster step (:func:`components_distributed`) is distributed
min-label propagation over the verified-pairs Dataset — two
bounded-group shuffles per round, O(diameter) rounds, driver sees only
per-round change counts. The driver-side :func:`_components` remains
as the small-scale reference implementation the tests pin the
distributed path against.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.exchange import bucket_exchange

_PAIRS_EST_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("est_jaccard", pa.float64())]
)

__all__ = [
    "exact_dedup",
    "dedup_keep_best",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_lsh_dedup",
    "components_distributed",
    "chunk_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_blocked",
    "embedding_dedup",
]

_MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------- exact

def exact_dedup(sf_dir: str, n_buckets: int | None = None):
    """(text_hash, doc_id=min, n_copies) — one row per distinct
    content. Hash + per-block partial (min doc_id, count) fuse into
    the exchange split task; each crc32(hash) bucket completes the min
    and the count sum (exchange instead of Dataset.groupby: the same
    dense-hash-bucket shape as dedup_keep_best, without the sort
    shuffle of every (block, hash) partial)."""
    from zlib import crc32

    from ..stages.exchange import bucket_exchange
    from ..stages.sizing import auto_buckets

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")

    schema = pa.schema([("text_hash", pa.string()), ("doc_id", pa.int64()),
                        ("n_copies", pa.int64())])
    part_schema = pa.schema(list(schema) + [pa.field("bucket", pa.int64())])

    def partial_t(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t["text"], "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "text_hash": [hashlib.md5(x.encode("utf-8")).hexdigest()
                          for x in texts],
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype("int64"),
        })
        g = df.groupby("text_hash", sort=False, as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        g["n_copies"] = g["n_copies"].astype("int64")
        g["bucket"] = [crc32(h.encode()) % n_buckets for h in g["text_hash"]]
        return pa.Table.from_pandas(g, schema=part_schema,
                                    preserve_index=False)

    def finish(_b: int, t) -> pa.Table:
        if t is None or not t.num_rows:
            return schema.empty_table()
        g = (t.to_pandas().groupby("text_hash", sort=False, as_index=False)
             .agg(doc_id=("doc_id", "min"), n_copies=("n_copies", "sum")))
        g["n_copies"] = g["n_copies"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).cast(schema)

    return bucket_exchange([(_docs(sf_dir), "bucket")], n_buckets, finish,
                           schemas=[part_schema], map_fns=[partial_t])


def dedup_keep_best(sf_dir: str, n_buckets: int | None = None):
    """Quality-aware duplicate resolution: per exact-duplicate cluster
    (cluster = md5(text)) keep the copy with the HIGHEST quality score
    (tie → min doc_id) — the policy stage of a training-data dedup,
    which keeps the best copy rather than an arbitrary one. Output one
    row per distinct content: (text_hash, doc_id, quality, n_copies).

    Scale shape: hash + quality score are vectorized per batch and the
    batch immediately reduces to its per-hash best (partial argmax +
    partial count), so the wide step moves at most one skinny row per
    (batch, hash). ONE bucket exchange by hash(text_hash) then
    completes argmax and count locally per bucket."""
    from zlib import crc32

    from ..stages.exchange import bucket_exchange
    from ..stages.sizing import auto_buckets
    from .text import quality_of

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")

    schema = pa.schema([
        ("text_hash", pa.string()), ("doc_id", pa.int64()),
        ("quality", pa.float64()), ("n_copies", pa.int64()),
    ])

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        """Per-hash argmax(quality, tie min doc_id) + copy count;
        n_copies sums partial counts when present."""
        counts = (df.groupby("text_hash", sort=False)["n_copies"].sum()
                  if "n_copies" in df.columns
                  else df.groupby("text_hash", sort=False).size())
        df = df.sort_values(["text_hash", "quality", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        best = df.drop_duplicates("text_hash", keep="first")
        out = best[["text_hash", "doc_id", "quality"]].copy()
        out["n_copies"] = out["text_hash"].map(counts).astype("int64")
        return out

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        df = pd.DataFrame({
            "text_hash": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
            "doc_id": batch["doc_id"].astype("int64"),
            "quality": quality_of(texts),
        })
        out = _best(df)
        out["bucket"] = [crc32(h.encode()) % n_buckets for h in out["text_hash"]]
        return out

    def finish(_b: int, t) -> pa.Table:
        if t is None or t.num_rows == 0:
            return schema.empty_table()
        out = _best(t.to_pandas())
        return pa.Table.from_pandas(
            out[["text_hash", "doc_id", "quality", "n_copies"]],
            preserve_index=False).cast(schema)

    part_schema = pa.schema([
        ("text_hash", pa.string()), ("doc_id", pa.int64()),
        ("quality", pa.float64()), ("n_copies", pa.int64()),
        ("bucket", pa.int64())])

    def partial_t(t: pa.Table) -> pa.Table:
        # fused split-side map: hash+score+partial-argmax run inside
        # the split task; only per-(block, hash) winners hit the store
        df = partial(t.to_pandas())
        if not len(df):
            return part_schema.empty_table()
        df["n_copies"] = df["n_copies"].astype("int64")
        return pa.Table.from_pandas(df, schema=part_schema,
                                    preserve_index=False)

    return bucket_exchange([(_docs(sf_dir), "bucket")], n_buckets, finish,
                           schemas=[part_schema], map_fns=[partial_t])


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


def _doc_shingle_hashes(words: list[str], n: int) -> np.ndarray:
    """Per-doc reference for the minhash shingle hash: polynomial fold
    (odd 64-bit multiplier) of per-token blake2b hashes per n-gram,
    >> 3 — the rolling construction shared with winnowing
    (``text._token_hash`` / ``text._WINNOW_P``), which lets the batch
    kernel hash blake2b once per batch-unique TOKEN and fold in numpy
    instead of building every shingle string. Deduplicated (set
    semantics; minhash is order-independent)."""
    from .text import _token_hash, _WINNOW_P

    M = (1 << 64) - 1
    th = [_token_hash(w) for w in words]
    if len(words) < n:
        grams = [th] if words else []
    else:
        grams = [th[i: i + n] for i in range(len(words) - n + 1)]
    out = set()
    for g in grams:
        h = 0
        for t in g:
            h = (h * _WINNOW_P + t) & M
        out.add(h >> 3)
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """Vectorized minhash: perm_i(h) = a_i * h + b_i over the 2^64
    ring (wraparound multiply is a standard universal-ish permutation
    family for minhash; fully numpy-vectorizable)."""

    def __init__(self, num_perm: int = 128, seed: int = 17, ngram: int = 3,
                 fsb: bool = False):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        # fsb=True: emit the signature matrix as ONE zero-copy
        # fixed_size_binary(num_perm*8) column instead of list<int64>
        # rows — the internal interchange the LSH plans decode back to
        # a (D, P) uint64 view with no per-row Python (see _sig_mat)
        self.fsb = fsb

    def signature(self, text: str) -> np.ndarray:
        h = _doc_shingle_hashes(text.split(), self.ngram)
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * h[None, :] + self.b[:, None]  # (P, S) u64 wrap
        return vals.min(axis=1)

    def _batch_shingle_rows(self, col):
        """Vectorized shingling for a whole batch (exactly
        :func:`_doc_shingle_hashes` per row): Arrow tokenize +
        ``dictionary_encode`` so blake2b runs once per batch-UNIQUE
        token; shingle hashes are the n-step numpy polynomial fold over
        shifted contiguous slices of the flat token-hash stream (no
        shingle string is ever built). Input: a null-filled Arrow
        string array. Returns (doc_row_idx, shingle_hash) with each
        doc's rows contiguous (set semantics falls out of the
        consumer's idempotent min reduction)."""
        import pyarrow.compute as pc

        from .text import _token_hash, _WINNOW_P

        n = self.ngram
        D = len(col)
        toks = pc.utf8_split_whitespace(col)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab_py = enc.dictionary.to_pylist()
        if "" in vocab_py:
            keep = codes != vocab_py.index("")
            codes, parent = codes[keep], parent[keep]
        uh = np.fromiter((_token_hash(w) for w in vocab_py),
                         dtype=np.uint64, count=len(vocab_py))
        th = uh[codes] if len(codes) else np.empty(0, np.uint64)
        nw = np.bincount(parent, minlength=D).astype(np.int64)
        off = np.zeros(D + 1, dtype=np.int64)
        np.cumsum(nw, out=off[1:])
        P = np.uint64(_WINNOW_P)

        with np.errstate(over="ignore"):
            # long docs: fold over shifted contiguous slices, 1 gather
            ldocs = np.flatnonzero(nw >= n)
            m = nw[ldocs] - n + 1
            tot_l = int(m.sum())
            if tot_l:
                mstart = np.zeros(len(ldocs), dtype=np.int64)
                np.cumsum(m[:-1], out=mstart[1:])
                rep = np.repeat(np.arange(len(ldocs)), m)
                gs = off[ldocs][rep] + (np.arange(tot_l, dtype=np.int64)
                                        - mstart[rep])
                nt = len(th)
                hf = th[: nt - n + 1].copy()
                for i in range(1, n):
                    hf = hf * P + th[i: nt - n + 1 + i]
                h_long = hf[gs] >> np.uint64(3)
                rows_long = ldocs[rep]
            else:
                h_long = np.empty(0, np.uint64)
                rows_long = np.empty(0, np.int64)
            # short docs (0 < nw < n): ONE whole-doc shingle
            sdocs = np.flatnonzero((nw > 0) & (nw < n))
            if len(sdocs):
                h_short = th[off[sdocs]].copy()
                for step in range(1, n - 1):
                    mask = nw[sdocs] > step
                    h_short[mask] = (h_short[mask] * P
                                     + th[off[sdocs][mask] + step])
                h_short >>= np.uint64(3)
            else:
                h_short = np.empty(0, np.uint64)

        # duplicates stay: min is idempotent, so the segment-min gives
        # set semantics for free — a global dedup sort would cost more
        # than it saves. Each doc's rows are CONTIGUOUS (long docs are
        # doc-major; short docs are one row each), which is all the
        # segment-min reduction requires.
        rows = np.concatenate([rows_long, sdocs])
        h = np.concatenate([h_long, h_short])
        return rows.astype(np.int64, copy=False), h

    def __call__(self, t):
        import pyarrow.compute as pc

        col = pc.fill_null(t["text"].combine_chunks(), "")
        rows, h = self._batch_shingle_rows(col)
        D = t.num_rows
        sig = np.full((D, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        if len(rows):
            # per-doc min over each permutation: segment-min at doc
            # boundaries (rows are doc-sorted), chunked so the (P, S)
            # permutation matrix stays ~32 MB
            seg_starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
            doc_of_seg = rows[seg_starts]
            nseg = len(seg_starts)
            # (P, ROWCAP) u64 = 8 MB at P=128: keep the permutation
            # matrix L3-resident — a DRAM-sized chunk measured 20×
            # slower — and reuse one buffer (no temporaries)
            ROWCAP = 8192
            buf = np.empty((self.num_perm, ROWCAP * 2), dtype=np.uint64)
            i = 0
            with np.errstate(over="ignore"):
                while i < nseg:
                    j = i + 1
                    while (j < nseg
                           and seg_starts[j] - seg_starts[i] < ROWCAP):
                        j += 1
                    lo_row = int(seg_starts[i])
                    hi_row = int(seg_starts[j]) if j < nseg else len(rows)
                    w = hi_row - lo_row
                    v = (buf[:, :w] if w <= buf.shape[1]
                         else np.empty((self.num_perm, w), np.uint64))
                    np.multiply(self.a[:, None], h[None, lo_row:hi_row],
                                out=v)
                    v += self.b[:, None]
                    mins = np.minimum.reduceat(
                        v, seg_starts[i:j] - lo_row, axis=1)
                    sig[doc_of_seg[i:j]] = mins.T
                    i = j
        if self.fsb:
            W = self.num_perm * 8
            sigb = pa.Array.from_buffers(
                pa.binary(W), D,
                [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())])
            return pa.table({"doc_id": t["doc_id"], "sigb": sigb})
        return pa.table({"doc_id": t["doc_id"],
                         "sig": pa.array([s.tolist() for s in sig])})


def minhash_signatures(sf_dir: str, num_perm: int = 128, ngram: int = 3):
    # stage instance → stateless tasks (no actor-pool CPU reservation;
    # the hasher state is just two small numpy arrays)
    return _docs(sf_dir).map_batches(
        MinHasher(num_perm=num_perm, ngram=ngram), batch_format="pyarrow"
    )


def _signatures_fsb(sf_dir: str, num_perm: int = 128, ngram: int = 3):
    """Internal signature stage for the LSH plans: same computation as
    :func:`minhash_signatures`, but the signature travels as one
    fixed_size_binary(num_perm*8) column (``sigb``) built zero-copy
    from the batch's (D, P) uint64 matrix — no per-row list
    materialization on the way out, no per-row ``np.asarray`` on the
    way back in (:func:`_sig_mat`)."""
    return _docs(sf_dir).map_batches(
        MinHasher(num_perm=num_perm, ngram=ngram, fsb=True),
        batch_format="pyarrow")


def _sig_mat(col, num_perm: int) -> np.ndarray:
    """Zero-copy decode of a ``sigb`` fixed_size_binary column (Array
    or ChunkedArray) back to a (D, num_perm) uint64 matrix."""
    W = num_perm * 8
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = [np.frombuffer(c.buffers()[1], np.uint64,
                           count=len(c) * num_perm, offset=c.offset * W)
             for c in chunks if len(c)]
    if not parts:
        return np.empty((0, num_perm), dtype=np.uint64)
    flat = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return flat.reshape(-1, num_perm)


SIG_ON_BAND_MAX_BYTES = 4 << 30  # plan switch: see minhash_lsh_pairs


def _docs_rows(sf_dir: str) -> int:
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    files = (sorted(_glob.glob(_os.path.join(path, "**", "*.parquet"),
                               recursive=True))
             if _os.path.isdir(path) else [path])
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _lsh_pairs_sig_on_band(sigs, num_perm: int, bands: int,
                           threshold: float, nparts: int):
    """Small-corpus plan: the full signature rides on every band row
    and ONE exchange verifies inline (est + exact first-band
    ownership). Optimal while docs x bands x sig_bytes fits the object
    store comfortably; at volume the 32x amplification spills — the
    skinny plan takes over (see minhash_lsh_pairs)."""
    rows_per_band = num_perm // bands
    W = num_perm * 8
    band_schema = pa.schema([("doc_id", pa.int64()), ("band_id", pa.int64()),
                             ("band_hash", pa.uint64()),
                             ("bucket", pa.int64()), ("sig", pa.binary(W))])

    def band_rows(t: pa.Table) -> pa.Table:
        D = t.num_rows
        if not D:
            return band_schema.empty_table()
        M = _sig_mat(t["sigb"], num_perm)
        C = M.reshape(D, bands, rows_per_band)
        P1 = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            x = C[:, :, 0] * P1
            for k in range(1, rows_per_band):
                x = (x ^ C[:, :, k]) * P1
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(29)
            band_ids = np.tile(np.arange(bands, dtype=np.uint64), D)
            bucket = ((x.reshape(-1) * np.uint64(bands) + band_ids)
                      % np.uint64(nparts)).astype(np.int64)
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        sig_rep = pa.Array.from_buffers(
            pa.binary(W), D * bands,
            [None, pa.py_buffer(np.repeat(M, bands, axis=0).tobytes())])
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, bands), pa.int64()),
            "band_id": pa.array(band_ids.astype(np.int64), pa.int64()),
            "band_hash": pa.array(x.reshape(-1), pa.uint64()),
            "bucket": pa.array(bucket, pa.int64()),
            "sig": sig_rep})

    def verify_partition(g: pa.Table) -> pd.DataFrame:
        return _verify_sig_partition(g, num_perm, bands, threshold)

    def verify_reduce(_b: int, t):
        if t is None or t.num_rows == 0:
            return _PAIRS_EST_SCHEMA.empty_table()
        return pa.Table.from_pandas(verify_partition(t),
                                    preserve_index=False).cast(
                                        _PAIRS_EST_SCHEMA)

    # map-side fusion: the 32×-amplified band table (sig rides every
    # row) never materializes as its own Dataset — band_rows runs
    # inside the split task, block → bucket slices directly
    return bucket_exchange([(sigs, "bucket")], nparts, verify_reduce,
                           schemas=[band_schema], map_fns=[band_rows])


def _verify_sig_partition(g: pa.Table, num_perm: int, bands: int,
                          threshold: float) -> pd.DataFrame:
    """In-bucket verify: TRUE chunk equality at the current band,
    exact first-band ownership (pairs emit once, globally), inline
    est filter — nothing but final pairs leaves the partition."""
    rows_per_band = num_perm // bands
    empty = pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64"),
         "est_jaccard": pd.Series([], dtype="float64")})
    band_np = g["band_id"].to_numpy(zero_copy_only=False)
    hash_np = g["band_hash"].to_numpy(zero_copy_only=False)
    doc_all = g["doc_id"].to_numpy(zero_copy_only=False)
    mat_all = _sig_mat(g["sig"], num_perm)
    order = np.lexsort((doc_all, hash_np, band_np))
    band_np, hash_np, doc_all = (band_np[order], hash_np[order],
                                 doc_all[order])
    mat_all = mat_all[order]
    uniq = np.r_[True, (band_np[1:] != band_np[:-1])
                 | (hash_np[1:] != hash_np[:-1])
                 | (doc_all[1:] != doc_all[:-1])]
    band_np, hash_np, doc_all = (band_np[uniq], hash_np[uniq],
                                 doc_all[uniq])
    mat_all = mat_all[uniq]
    bounds = np.flatnonzero(np.r_[
        True,
        (band_np[1:] != band_np[:-1]) | (hash_np[1:] != hash_np[:-1]),
        True])
    sizes = np.diff(bounds)
    out_a, out_b, out_j = [], [], []
    sig_dt = [(f"f{p}", np.uint64) for p in range(num_perm)]
    for gi in np.nonzero(sizes >= 2)[0]:
        lo, hi = int(bounds[gi]), int(bounds[gi + 1])
        ids = doc_all[lo:hi].astype(np.int64)
        band = int(band_np[lo])
        mat = mat_all[lo:hi]
        # Dup-heavy groups hold many IDENTICAL signatures; est,
        # band equality and ownership are functions of the sig
        # alone, so factorize sigs into runs, decide once per
        # RUN-pair, and expand to doc pairs vectorized. Unique-sig
        # groups degrade to m == k with fully-vectorized pair
        # checks (no per-row fancy-index copies).
        sv = np.ascontiguousarray(mat).view(sig_dt).ravel()
        _, first_idx, inv = np.unique(sv, return_index=True,
                                      return_inverse=True)
        m = len(first_idx)
        rorder = np.argsort(inv, kind="stable")
        inv_s, ids_s = inv[rorder], ids[rorder]
        run_bounds = np.flatnonzero(
            np.r_[True, inv_s[1:] != inv_s[:-1], True])
        run_sizes = np.diff(run_bounds)
        U = mat[first_idx]                       # m × num_perm
        B = U.reshape(m, bands, rows_per_band)
        if band == 0 and threshold <= 1.0:
            # intra-run pairs: identical sigs, est exactly 1.0;
            # band 0 owns them (equal at band 0 by definition)
            for r in np.nonzero(run_sizes >= 2)[0]:
                rid = np.sort(ids_s[run_bounds[r]:run_bounds[r + 1]])
                iu, ju = np.triu_indices(len(rid), k=1)
                out_a.append(rid[iu])
                out_b.append(rid[ju])
                out_j.append(np.ones(len(iu), dtype=np.float64))
        if m >= 2 and not (band > 0 and (B[:, 0] == B[0, 0]).all()):
            # (the guard: when every run in a band>0 group is equal at
            # band 0, band 0 owns every cross-run pair — skip in O(m))
            ria, rib, rj = [], [], []
            for i in range(m - 1):
                # true equality at THIS band (bucket key is a
                # non-crypto hash: membership only gathers candidates)
                alive = (B[i, band][None, :] == B[i + 1:, band]).all(axis=1)
                if band > 0 and alive.any():
                    # ownership: kill pairs owned by an earlier band
                    alive &= ~(B[i, 0][None, :]
                               == B[i + 1:, 0]).all(axis=1)
                    if band > 1:
                        surv = np.nonzero(alive)[0]
                        if len(surv):
                            ec = (B[i, 1:band][None]
                                  == B[i + 1:, 1:band][surv]).all(axis=2)
                            alive[surv[ec.any(axis=1)]] = False
                cand = np.nonzero(alive)[0]
                if not len(cand):
                    continue
                eq = (U[i] == U[i + 1:][cand]).mean(axis=1)
                sel = np.nonzero(eq >= threshold)[0]
                if len(sel):
                    ria.append(np.full(len(sel), i, dtype=np.int64))
                    rib.append(i + 1 + cand[sel])
                    rj.append(eq[sel])
            if ria:
                # expand surviving RUN pairs to doc pairs, vectorized
                ia = np.concatenate(ria)
                ju_ = np.concatenate(rib)
                est = np.concatenate(rj)
                sa, sb = run_sizes[ia], run_sizes[ju_]
                cnt = sa * sb
                total = int(cnt.sum())
                p = np.repeat(np.arange(len(ia)), cnt)
                start = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                t_loc = np.arange(total) - start[p]
                a_doc = ids_s[run_bounds[ia][p] + t_loc // sb[p]]
                b_doc = ids_s[run_bounds[ju_][p] + t_loc % sb[p]]
                out_a.append(np.minimum(a_doc, b_doc))
                out_b.append(np.maximum(a_doc, b_doc))
                out_j.append(np.round(np.repeat(est, cnt), 6))
    if not out_a:
        return empty
    return pd.DataFrame({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b),
                         "est_jaccard": np.concatenate(out_j)})


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 128, bands: int = 32, ngram: int = 3,
                      threshold: float = 0.5, plan: str | None = None):
    """Banded-LSH candidate pairs with signature-estimated Jaccard >=
    ``threshold``: (a, b, est_jaccard), deduplicated across bands.

    TWO physical plans, one semantic result (chosen like a broadcast-
    vs-shuffle join threshold; round-5 volume-run finding):

    - ``sig-on-band`` (small corpora): the full signature rides on
      every band row, ONE exchange verifies inline with exact
      first-band ownership. Optimal until the ``bands``-fold signature
      amplification (docs × bands × num_perm × 8 B; 17.5 GB at 500k
      docs) spills the object store.
    - ``skinny`` (volume): three skinny exchanges, the shape
      ``ngram_jaccard_pairs(exact=False)`` uses. Band rows carry only
      ids + the band's raw chunk (64 B); identical-signature pairs
      (``hall`` full-sig hash) emit est=1.0 inline from band 0;
      differing-sig candidates join signatures once per pair
      partition (pairs-bounded, not corpus × bands) where est and
      global dedup complete. 125 s → 18 s at 500k docs.

    Emitted pair set and est values are plan-independent and equal to
    round 4's (pair iff some band's chunk truly equal AND est >=
    threshold) — pinned by ``test_minhash_plans_agree``.
    """
    rows_per_band = num_perm // bands
    # LSH (band, hash) groups hash into a bounded number of verify
    # PARTITIONS (most groups are singletons; per-group task overhead
    # would dominate otherwise)
    NPARTS = 64
    sigs = _signatures_fsb(sf_dir, num_perm, ngram)

    if plan is None:
        band_bytes = _docs_rows(sf_dir) * bands * (num_perm * 8 + 32)
        plan = ("sig-on-band" if band_bytes <= SIG_ON_BAND_MAX_BYTES
                else "skinny")
    if plan == "sig-on-band":
        return _lsh_pairs_sig_on_band(sigs, num_perm, bands, threshold,
                                      NPARTS)
    if plan != "skinny":
        raise ValueError(f"unknown plan {plan!r}")
    # the skinny plan consumes sigs TWICE (band rows + payload join);
    # materialize once so the shingle+hash stage doesn't re-execute —
    # bounded at docs × (8 + num_perm×8) B ≈ 1 KB/doc in the object
    # store (spillable), vs recomputing the most CPU-expensive stage
    sigs = sigs.materialize()

    band_schema = pa.schema(
        [("doc_id", pa.int64()), ("band_id", pa.int8()),
         ("band_hash", pa.uint64()), ("h0", pa.uint64()),
         ("hall", pa.uint64()), ("bucket", pa.int64())]
        + [(f"c{k}", pa.uint64()) for k in range(rows_per_band)])

    def band_rows(t: pa.Table) -> pa.Table:
        """One row per (doc, band), fully vectorized, skinny (~73 B:
        band_id is int8 — 32 bands). The band key is a
        non-cryptographic u64 mix of the band's chunk — it only
        GATHERS candidates; equality is decided on the real chunk
        columns, so a key collision can only waste a comparison,
        never change the pair set."""
        D = t.num_rows
        if not D:
            return band_schema.empty_table()
        M = _sig_mat(t["sigb"], num_perm)
        C = M.reshape(D, bands, rows_per_band)
        P1 = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            x = C[:, :, 0] * P1
            for k in range(1, rows_per_band):
                x = (x ^ C[:, :, k]) * P1
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(29)
            # hall: a u64 mix of the WHOLE signature. Pairs with equal
            # hall have identical sigs (same 64-bit-proxy confidence as
            # band_hash itself) → est is exactly 1.0 with no sig join
            hall = M[:, 0] * P1
            for k in range(1, num_perm):
                hall = (hall ^ M[:, k]) * P1
            hall ^= hall >> np.uint64(33)
            hall *= np.uint64(0xFF51AFD7ED558CCD)
            hall ^= hall >> np.uint64(29)
            band_ids = np.tile(np.arange(bands, dtype=np.uint64), D)
            bucket = ((x.reshape(-1) * np.uint64(bands) + band_ids)
                      % np.uint64(NPARTS)).astype(np.int64)
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cols = {"doc_id": pa.array(np.repeat(doc, bands), pa.int64()),
                "band_id": pa.array(band_ids.astype(np.int8), pa.int8()),
                "band_hash": pa.array(x.reshape(-1), pa.uint64()),
                # band-0 key rides on every row: bands > 0 suppress any
                # pair already equal at band 0 (identical-sig dup
                # clusters collide in EVERY band — without this they
                # ship each pair ~bands times into the global dedup)
                "h0": pa.array(np.repeat(x[:, 0], bands), pa.uint64()),
                "hall": pa.array(np.repeat(hall, bands), pa.uint64()),
                "bucket": pa.array(bucket, pa.int64())}
        for k in range(rows_per_band):
            cols[f"c{k}"] = pa.array(C[:, :, k].reshape(-1), pa.uint64())
        return pa.table(cols)

    cand_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("vbucket", pa.int64()), ("sure", pa.int8())])

    def _pair_vbucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            x = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 ^ b.astype(np.uint64))
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(29)
        return (x % np.uint64(NPARTS)).astype(np.int64)

    def candidates_reduce(_b: int, t) -> pa.Table:
        """Collision groups via ONE lexsort whose key includes the
        true chunk values; all i<j pairs per group, deduped
        in-partition. Pure numpy — no pandas frame for the (rows ×
        bands)-sized bucket."""
        if t is None or t.num_rows == 0:
            return cand_schema.empty_table()
        band_np = t["band_id"].to_numpy(zero_copy_only=False)
        hash_np = t["band_hash"].to_numpy(zero_copy_only=False)
        doc_arr = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        h0_arr = t["h0"].to_numpy(zero_copy_only=False)
        hall_arr = t["hall"].to_numpy(zero_copy_only=False)
        cks = [t[f"c{k}"].to_numpy(zero_copy_only=False)
               for k in range(rows_per_band)]
        # sort by (band, hash, c0..ck, hall, doc) — lexsort's primary
        # key goes LAST; same linearization the pandas mergesort gave
        order = np.lexsort((doc_arr, hall_arr, *cks[::-1],
                            hash_np, band_np))
        band_np, hash_np, doc_arr = (band_np[order], hash_np[order],
                                     doc_arr[order])
        h0_arr, hall_arr = h0_arr[order], hall_arr[order]
        cks = [c[order] for c in cks]
        # drop duplicate (band, hash, chunks, doc) rows — equal-subset
        # rows are adjacent (same doc ⇒ same hall, the only other key)
        dup = ((band_np[1:] != band_np[:-1]) | (hash_np[1:] != hash_np[:-1])
               | (doc_arr[1:] != doc_arr[:-1]))
        for c in cks:
            dup = dup | (c[1:] != c[:-1])
        keep = np.r_[True, dup]
        band_np, hash_np, doc_arr = band_np[keep], hash_np[keep], doc_arr[keep]
        h0_arr, hall_arr = h0_arr[keep], hall_arr[keep]
        cks = [c[keep] for c in cks]
        change = (band_np[1:] != band_np[:-1]) | (hash_np[1:] != hash_np[:-1])
        for c in cks:
            change = change | (c[1:] != c[:-1])
        bounds = np.flatnonzero(np.r_[True, change, True])
        sizes = np.diff(bounds)
        out_a, out_b, out_sure = [], [], []
        for gi in np.nonzero(sizes >= 2)[0]:
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            band = int(band_np[lo])
            ids = doc_arr[lo:hi]  # sorted by (hall, doc_id)
            if band > 0:
                h0g = h0_arr[lo:hi]
                if (h0g == h0g[0]).all():
                    # whole group already equal at band 0 — band 0's
                    # bucket owns every pair (the dominant full-dup
                    # case: skip before any pair construction)
                    continue
                iu, ju = np.triu_indices(len(ids), k=1)
                keep = h0g[iu] != h0g[ju]
                iu, ju = iu[keep], ju[keep]
                sure = np.zeros(len(iu), dtype=bool)
            else:
                # band 0 owns identical-sig pairs: within a hall-run
                # est is exactly 1.0 and the pair occurs nowhere else
                # (h0 suppression) — emit FINAL, no sig join, no dedup
                iu, ju = np.triu_indices(len(ids), k=1)
                hg = hall_arr[lo:hi]
                sure = hg[iu] == hg[ju]
            # group rows are sorted by (hall, doc_id), so a pair's
            # (min, max) order is restored after the concat below
            out_a.append(ids[iu])
            out_b.append(ids[ju])
            out_sure.append(sure)
        if not out_a:
            return cand_schema.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        sure = np.concatenate(out_sure)
        lo_ = np.minimum(a, b)
        hi_ = np.maximum(a, b)
        df = pd.DataFrame({"a": lo_, "b": hi_, "sure": sure}).drop_duplicates(
            ["a", "b"])
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "vbucket": pa.array(_pair_vbucket(a, b), pa.int64()),
                         "sure": pa.array(
                             df["sure"].to_numpy(dtype=np.int8), pa.int8())})

    # map-side fusion: band_rows runs inside the split task — the
    # ~73 B × docs × bands expansion goes straight to bucket slices,
    # never materializing as a Dataset in the object store
    cand = bucket_exchange([(sigs, "bucket")], NPARTS, candidates_reduce,
                           schemas=[band_schema], map_fns=[band_rows])

    # --- membership: which pair partitions need which doc's signature
    memb_schema = pa.schema([("doc_id", pa.int64()), ("vbucket", pa.int64()),
                             ("dbucket", pa.int64())])

    def membership(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return memb_schema.empty_table()
        sure = t["sure"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)[sure == 0]
        b = t["b"].to_numpy(zero_copy_only=False)[sure == 0]
        v = t["vbucket"].to_numpy(zero_copy_only=False)[sure == 0]
        df = pd.DataFrame({"doc_id": np.concatenate([a, b]),
                           "vbucket": np.concatenate([v, v])}).drop_duplicates()
        df["dbucket"] = (df["doc_id"] % NPARTS).astype("int64")
        return pa.Table.from_pandas(df, schema=memb_schema,
                                    preserve_index=False)

    memb = cand.map_batches(membership, batch_format="pyarrow")

    def sure_rows(t: pa.Table) -> pa.Table:
        """Identical-sig pairs bypass the join: est is exactly 1.0 and
        band-0 ownership already made them globally unique."""
        if t.num_rows == 0:
            return _PAIRS_EST_SCHEMA.empty_table()
        sure = t["sure"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)[sure == 1]
        b = t["b"].to_numpy(zero_copy_only=False)[sure == 1]
        return pa.table({
            "a": pa.array(a.astype(np.int64), pa.int64()),
            "b": pa.array(b.astype(np.int64), pa.int64()),
            "est_jaccard": pa.array(np.ones(len(a)), pa.float64()),
        })

    sure_ds = cand.map_batches(sure_rows, batch_format="pyarrow")

    sig_schema = pa.schema([("doc_id", pa.int64()), ("sig", pa.binary()),
                            ("dbucket", pa.int64())])

    def sig_rows(t: pa.Table) -> pa.Table:
        """(doc_id, sig bytes, dbucket) — the fsb column casts to
        variable binary wholesale; no per-row work."""
        if t.num_rows == 0:
            return sig_schema.empty_table()
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "sig": pc.cast(t["sigb"].combine_chunks(), pa.binary()),
            "dbucket": pa.array(doc % NPARTS, pa.int64())})

    pay_schema = pa.schema([("doc_id", pa.int64()), ("vbucket", pa.int64()),
                            ("sig", pa.binary())])

    def payload_reduce(_b: int, memb_t, sig_t) -> pa.Table:
        """Ship each doc's signature once per pair partition."""
        if memb_t is None or memb_t.num_rows == 0 or sig_t is None                 or sig_t.num_rows == 0:
            return pay_schema.empty_table()
        m = memb_t.to_pandas().drop_duplicates()
        smap = sig_t.to_pandas().drop_duplicates("doc_id")
        j = m.merge(smap[["doc_id", "sig"]], on="doc_id", how="inner")
        return pa.table({"doc_id": pa.array(j["doc_id"].to_numpy(np.int64)),
                         "vbucket": pa.array(j["vbucket"].to_numpy(np.int64)),
                         "sig": pa.array(j["sig"].tolist(), pa.binary())})

    payloads = bucket_exchange([(memb, "dbucket"), (sigs, "dbucket")],
                               NPARTS, payload_reduce,
                               schemas=[memb_schema, sig_schema],
                               map_fns=[None, sig_rows])

    def verify_reduce(_b: int, pay_t, pair_t) -> pa.Table:
        """Per pair partition: global pair dedup + vectorized
        est_jaccard from the joined signatures."""
        if pair_t is None or pair_t.num_rows == 0 or pay_t is None                 or pay_t.num_rows == 0:
            return _PAIRS_EST_SCHEMA.empty_table()
        pairs = pair_t.to_pandas()
        pairs = pairs[pairs["sure"] == 0][["a", "b"]].drop_duplicates()
        if not len(pairs):
            return _PAIRS_EST_SCHEMA.empty_table()
        pay = pay_t.to_pandas().drop_duplicates("doc_id")
        docs = pay["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(docs, kind="stable")
        docs = docs[order]
        mat = np.stack([np.frombuffer(s, dtype=np.uint64)
                        for s in pay["sig"].to_numpy()[order]])
        ia = np.searchsorted(docs, pairs["a"].to_numpy(dtype=np.int64))
        ib = np.searchsorted(docs, pairs["b"].to_numpy(dtype=np.int64))
        est = (mat[ia] == mat[ib]).mean(axis=1)
        keep = est >= threshold
        out = pd.DataFrame({
            "a": pairs["a"].to_numpy(dtype=np.int64)[keep],
            "b": pairs["b"].to_numpy(dtype=np.int64)[keep],
            "est_jaccard": np.round(est[keep], 6)})
        return pa.Table.from_pandas(out, schema=_PAIRS_EST_SCHEMA,
                                    preserve_index=False)

    verified = bucket_exchange([(payloads, "vbucket"), (cand, "vbucket")],
                               NPARTS, verify_reduce,
                               schemas=[pay_schema, cand_schema])
    return verified.union(sure_ds)


def _cc_split_edges_impl(table: pa.Table, n_buckets: int):
    """Plain Ray task: one pairs block → per-bucket edge arrays
    (both directions, bucketed by ``src % n_buckets``)."""
    if table.num_rows == 0 or "a" not in table.column_names:
        # empty blocks (zero-group map_groups artifacts) carry no schema
        z = np.array([], dtype=np.int64)
        out = tuple((z, z) for _ in range(n_buckets))
        return out[0] if n_buckets == 1 else out
    a = np.asarray(table["a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    b = np.asarray(table["b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    buck = src % n_buckets
    order = np.argsort(buck, kind="stable")
    src, dst, buck = src[order], dst[order], buck[order]
    bounds = np.searchsorted(buck, np.arange(n_buckets + 1))
    out = tuple((src[bounds[i]:bounds[i + 1]], dst[bounds[i]:bounds[i + 1]])
                for i in range(n_buckets))
    return out[0] if n_buckets == 1 else out


def _cc_gather_bucket_impl(*parts):
    """Plain Ray task: concatenate one bucket's edge slices from every
    input block and initialize labels (label = node id, nodes sorted)."""
    src = np.concatenate([p[0] for p in parts]) if parts else np.array([], np.int64)
    dst = np.concatenate([p[1] for p in parts]) if parts else np.array([], np.int64)
    nodes = np.unique(src)  # sorted
    # pre-resolve each edge's src position once — rounds then index,
    # not search
    src_pos = np.searchsorted(nodes, src)
    return src_pos, dst, nodes, nodes.copy()  # (edge src idx, edge dst, nodes, labels)


def _cc_propagate_impl(bucket_state, labels, n_buckets: int):
    """Plain Ray task: one src bucket emits per-dst-bucket candidate
    messages (dst, label[src]); messages that cannot improve any label
    (cand >= dst, since label[dst] <= dst always) are pruned at the
    source."""
    src_pos, dst, _nodes, _ = bucket_state
    cand = labels[src_pos]
    keep = cand < dst
    dst_k, cand_k = dst[keep], cand[keep]
    buck = dst_k % n_buckets
    order = np.argsort(buck, kind="stable")
    dst_k, cand_k, buck = dst_k[order], cand_k[order], buck[order]
    bounds = np.searchsorted(buck, np.arange(n_buckets + 1))
    out = tuple((dst_k[bounds[i]:bounds[i + 1]], cand_k[bounds[i]:bounds[i + 1]])
                for i in range(n_buckets))
    return out[0] if n_buckets == 1 else out


def _cc_reduce_impl(bucket_state, labels, *msgs):
    """Plain Ray task: per-node min over this bucket's incoming
    candidates; returns (new_labels, changed_count)."""
    nodes = bucket_state[2]
    new = labels.copy()
    for node_arr, cand_arr in msgs:
        if len(node_arr):
            pos = np.searchsorted(nodes, node_arr)
            np.minimum.at(new, pos, cand_arr)
    return new, int((new < labels).sum())


def _cc_to_table_impl(bucket_state, labels, id_col: str) -> pa.Table:
    nodes = bucket_state[2]
    return pa.table({id_col: pa.array(nodes, pa.int64()),
                     "cluster_id": pa.array(labels, pa.int64())})


def components_distributed(pairs, id_col: str = "doc_id", n_buckets: int = 16,
                           max_rounds: int = 64):
    """Distributed min-label connected components over a verified-pair
    Dataset (columns ``a``, ``b``) — the 100-TB cluster step.

    Iterative min-label propagation: every node starts with its own id
    as label; each round every node takes the min of its own and its
    neighbors' labels; converges to the component-min in O(diameter)
    rounds (near-dup clusters are dense — typically 2-3 rounds).

    Execution shape: the pairs Dataset executes ONCE into object-store
    blocks; edges bucket by ``src % n_buckets`` and every round is a
    BSP superstep of PLAIN Ray tasks — per-src-bucket propagate
    (messages pruned at the source: a candidate ≥ its target node can
    never win) and per-dst-bucket ``np.minimum.at`` reduce. The driver
    sees per-round changed-counts (ints) and ObjectRefs, never an edge
    or label row — a dup-heavy corpus with billions of verified pairs
    never pins one process. Raw tasks rather than a per-round Dataset
    pipeline for the same reason as the crawl's epoch loop: a
    fixed-point loop of tiny executions pays the streaming executor's
    per-execution setup (~1-2 s) every round, which dwarfs the work.

    Returns a Dataset (id_col, cluster_id), one row per node that
    appears in some pair, cluster_id = min node id of its component,
    sorted by id_col.
    """
    import ray
    import ray.data as rd

    empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                          "cluster_id": pd.Series([], dtype="int64")})

    block_refs = pairs.to_arrow_refs()
    if not block_refs:
        return rd.from_pandas(empty)

    split = ray.remote(_cc_split_edges_impl)
    gather = ray.remote(_cc_gather_bucket_impl)
    propagate = ray.remote(_cc_propagate_impl)
    reduce_ = ray.remote(num_returns=2)(_cc_reduce_impl)
    to_table = ray.remote(_cc_to_table_impl)

    nb = n_buckets
    split_refs = [split.options(num_returns=nb if nb > 1 else None).remote(r, nb)
                  for r in block_refs]
    if nb == 1:
        split_refs = [[r] for r in split_refs]
    states = [gather.remote(*[sr[b] for sr in split_refs]) for b in range(nb)]
    # labels ride separately so rounds replace them without reshipping
    # the static edge structure
    labels = [ray.put(None)] * nb

    def _init_label(st):
        return st[3]

    init_lab = ray.remote(_init_label)
    labels = [init_lab.remote(states[b]) for b in range(nb)]

    for _ in range(max_rounds):
        msg_refs = [
            propagate.options(num_returns=nb if nb > 1 else None).remote(
                states[b], labels[b], nb)
            for b in range(nb)
        ]
        if nb == 1:
            msg_refs = [[r] for r in msg_refs]
        results = [
            reduce_.remote(states[b], labels[b], *[msg_refs[s][b] for s in range(nb)])
            for b in range(nb)
        ]
        labels = [r[0] for r in results]
        changed = sum(ray.get([r[1] for r in results]))
        if changed == 0:
            break

    tables = [to_table.remote(states[b], labels[b], id_col) for b in range(nb)]
    ds = rd.from_arrow_refs(tables)
    if ds.count() == 0:
        return rd.from_pandas(empty)
    return ds.sort(id_col)


def _components(edges: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Min-label connected components over a verified-pair edge list.

    Driver-side by documented design: the edge set is the pairs ABOVE
    the similarity threshold — provably small relative to the corpus
    (it is the dedup output itself)."""
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
    clusters: dict[int, int] = {x: find(x) for x in parent}
    if not clusters:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    return pd.DataFrame(sorted(clusters.items()), columns=[id_col, "cluster_id"])


def minhash_lsh_dedup(sf_dir: str, num_perm: int = 128, bands: int = 32, ngram: int = 3,
                      threshold: float = 0.5):
    """Near-dup clusters: banded LSH → in-bucket signature-estimated
    Jaccard ≥ threshold → DISTRIBUTED min-label connected components
    (:func:`components_distributed` — the pair set never visits the
    driver; on a dup-heavy 100-TB corpus it is billions of edges).

    Returns (doc_id, cluster_id) for every doc in some cluster of
    size ≥ 2; cluster_id = min doc_id of the cluster.
    """
    pairs = minhash_lsh_pairs(sf_dir, num_perm, bands, ngram, threshold)
    return components_distributed(pairs, id_col="doc_id")


# -------------------------------------------------------------- simhash

class SimHasher:
    """64-bit simhash over whitespace tokens (term-frequency weights).

    The per-word digest is the first 8 bytes of md5 (big-endian) —
    md5 specifically so the WHOLE pipeline is recomputable in DuckDB
    (``CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT)``), which is what
    makes ``simhash_dedup`` oracle-checkable end to end. Output bit
    ``i`` is set iff the tf-weighted sum over word-digest bit
    ``(63 - i)`` is positive (the layout np.unpackbits gives a
    big-endian byte view)."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        uniq, counts = np.unique(words, return_counts=True)
        hs = np.fromiter(
            (int(hashlib.md5(w.encode()).hexdigest()[:16], 16) for w in uniq),
            dtype=np.uint64, count=len(uniq))
        shifts = np.uint64(63) - np.arange(64, dtype=np.uint64)
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((2 * bits - 1) * counts[:, None]).sum(axis=0)  # (64,)
        set_bits = np.nonzero(acc > 0)[0].astype(np.uint64)
        if not len(set_bits):
            return 0
        return int(np.bitwise_or.reduce(np.uint64(1) << set_bits))

    def __call__(self, t):
        # batch-vectorized on Arrow dictionary codes: tokenize +
        # dictionary_encode once (split() parity), md5 once per
        # batch-UNIQUE word (the oracle-shared semantic), one
        # scatter-add into the (docs × 64) sign accumulator —
        # no per-doc or per-token Python
        import hashlib as _hl

        import pyarrow.compute as pc

        D = t.num_rows
        toks = pc.utf8_split_whitespace(
            pc.fill_null(t["text"].combine_chunks(), ""))
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab_py = enc.dictionary.to_pylist()
        if "" in vocab_py:
            keep = codes != vocab_py.index("")
            codes, parent = codes[keep], parent[keep]
        out_hash = np.zeros(D, dtype=np.uint64)
        if len(codes):
            uh = np.fromiter(
                (int(_hl.md5(w.encode()).hexdigest()[:16], 16)
                 for w in vocab_py),
                dtype=np.uint64, count=len(vocab_py))
            shifts = np.uint64(63) - np.arange(64, dtype=np.uint64)
            ubits = ((uh[:, None] >> shifts[None, :]) & np.uint64(1)) \
                .astype(np.int64)  # (V, 64)
            # tf-weighting == summing each word INSTANCE's ±1 vector,
            # so no (doc, word) count pass: one scatter-add over the
            # token instances
            acc = np.zeros((D, 64), dtype=np.int64)
            np.add.at(acc, parent, 2 * ubits[codes] - 1)
            pos = acc > 0
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            out_hash = (pos.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(out_hash, pa.uint64())})


def simhash_dedup(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by simhash: 4×16-bit band blocking → in-bucket
    Hamming verify ≤ max_hamming. Returns (a, b, hamming).

    Recall is EXACT by pigeonhole: ≤3 differing bits across 4 bands
    leaves at least one band identical, so every qualifying pair
    shares a bucket. The 8-byte simhash rides on each band row — the
    bucket verifies locally, no driver materialization or broadcast.
    """
    sigs = _docs(sf_dir).map_batches(SimHasher(), batch_format="pyarrow")

    NPARTS = 64  # verify partitions (bounded group count, see minhash)

    band_schema = pa.schema([("doc_id", pa.int64()), ("band_id", pa.int64()),
                             ("band_val", pa.int64()), ("bucket", pa.int64()),
                             ("simhash", pa.uint64())])

    def band_rows(t: pa.Table) -> pa.Table:
        """Vectorized 4-band explosion (one numpy shift per row set,
        no per-doc Python); runs fused inside the split task."""
        D = t.num_rows
        if not D:
            return band_schema.empty_table()
        doc = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands = np.tile(np.arange(4, dtype=np.int64), D)
        hr = np.repeat(h, 4)
        v = ((hr >> (np.uint64(16) * bands.astype(np.uint64)))
             & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, 4), pa.int64()),
            "band_id": pa.array(bands, pa.int64()),
            "band_val": pa.array(v, pa.int64()),
            "bucket": pa.array((v * 4 + bands) % NPARTS, pa.int64()),
            "simhash": pa.array(hr, pa.uint64())})

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Hamming-verify every (band, value) bucket hashed into this
        partition (vectorized boundary walk; singleton buckets skip).
        A pair is emitted only in the FIRST band whose chunks are
        equal, so pairs are globally unique with no dedup shuffle."""
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
        g = g.sort_values(["band_id", "band_val", "doc_id"], kind="mergesort")
        g = g.drop_duplicates(["band_id", "band_val", "doc_id"])
        codes = g["band_id"].to_numpy() * (1 << 16) + g["band_val"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, np.diff(codes) != 0, True])
        sizes = np.diff(bounds)
        doc_arr = g["doc_id"].to_numpy()
        hs_arr = g["simhash"].to_numpy(dtype=np.uint64)
        band_arr = g["band_id"].to_numpy()
        out = {"a": [], "b": [], "hamming": []}
        for gi in np.nonzero(sizes >= 2)[0]:
            lo, hi = bounds[gi], bounds[gi + 1]
            ids = doc_arr[lo:hi]
            band = int(band_arr[lo])
            hs = hs_arr[lo:hi]
            # all i<j pairs of the bucket at once: XOR → byte view →
            # unpackbits popcount (no per-pair Python)
            iu, ju = np.triu_indices(len(ids), k=1)
            xv = np.ascontiguousarray(hs[iu] ^ hs[ju])
            d = np.unpackbits(xv.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            close = d <= max_hamming
            if not close.any():
                continue
            xv, d, iu, ju = xv[close], d[close], iu[close], ju[close]
            # ownership: emit only in the FIRST band whose 16-bit chunk
            # matches (≤3 diffs over 4 bands guarantees one exists)
            zero = np.stack([(xv >> np.uint64(16 * b)) & np.uint64(0xFFFF) == 0
                             for b in range(4)])
            keep = zero.argmax(axis=0) == band
            out["a"].extend(ids[iu[keep]].tolist())
            out["b"].extend(ids[ju[keep]].tolist())
            out["hamming"].extend(d[keep].tolist())
        return pd.DataFrame(out) if out["a"] else empty

    ham_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())])

    def verify_reduce(_b: int, t):
        if t is None or t.num_rows == 0:
            return ham_schema.empty_table()
        return pa.Table.from_pandas(verify_partition(t.to_pandas()),
                                    preserve_index=False).cast(ham_schema)

    pairs = bucket_exchange([(sigs, "bucket")], NPARTS, verify_reduce,
                            schemas=[band_schema], map_fns=[band_rows])
    # final ordering as a Dataset sort — the pair set is output-bounded
    # but on a dup-heavy corpus still too big to funnel through the
    # driver for ordering
    return pairs.sort(["a", "b"])


# -------------------------------------------------- exact n-gram jaccard

_GB_SCHEMA = pa.schema([("doc_id", pa.int64()), ("gbytes", pa.binary()),
                        ("dbucket", pa.int64())])


def _gram_bytes_rows(t: pa.Table, n: int, nb: int) -> pa.Table:
    """(doc_id, gbytes, dbucket) rows straight from raw doc text —
    pure Arrow/numpy (the lm_perplexity idiom): tokenize with
    ``utf8_split_whitespace`` (``str.split()`` parity after dropping
    boundary-empty tokens), build n-gram strings with one
    ``binary_join_element_wise`` over shifted zero-copy slices,
    ``dictionary_encode`` once, distinct+sort per doc over integer
    (doc, vocab-rank) keys, and render each doc's serialized set with
    one C++ ``binary_join``. Byte-identical to
    ``"\\x00".join(sorted(set(_word_ngrams(text.split(), n)))).encode()``
    (UTF-8 byte order == code-point order); every doc emits a row,
    empty/short docs as empty bytes."""
    import pyarrow.compute as pc

    ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    D = len(ids)
    if not D:
        return _GB_SCHEMA.empty_table()
    toks = pc.utf8_split_whitespace(
        pc.fill_null(t["text"].combine_chunks(), ""))
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        sel = pa.array(np.nonzero(nonempty)[0])
        flat = pc.take(flat, sel)
        parent = parent[nonempty]
    L = len(flat)
    if n == 1:
        grams, gparent = flat, parent
    else:
        tokc = (np.bincount(parent, minlength=D).astype(np.int64)
                if L else np.zeros(D, dtype=np.int64))
        if L >= n:
            # gram i spans tokens [i, i+n) — valid iff it stays in
            # one doc
            mask = parent[: L - n + 1] == parent[n - 1:]
            grams = pc.binary_join_element_wise(
                *[flat.slice(k, L - n + 1) for k in range(n)], " ")
            grams = pc.take(grams, pa.array(np.nonzero(mask)[0]))
            gparent = parent[: L - n + 1][mask]
        else:
            grams, gparent = flat.slice(0, 0), parent[:0]
        short = np.nonzero((tokc > 0) & (tokc < n))[0]
        if len(short):
            # _word_ngrams' short-doc case: 0 < len(words) < n docs
            # contribute ONE gram — the join of all their tokens
            is_short = tokc[parent] < n
            stoks = pc.take(flat, pa.array(np.nonzero(is_short)[0]))
            soff = np.zeros(len(short) + 1, dtype=np.int32)
            np.cumsum(tokc[short], out=soff[1:])
            sgrams = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(soff, pa.int32()),
                                         stoks), " ")
            grams = pa.concat_arrays([grams, sgrams])
            gparent = np.concatenate([gparent, short])
    if len(grams):
        enc = pc.dictionary_encode(grams)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gvocab = enc.dictionary
        V = len(gvocab)
        order = pc.sort_indices(gvocab).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank = np.empty(V, dtype=np.int64)
        rank[order] = np.arange(V, dtype=np.int64)
        key = np.unique(gparent * np.int64(V) + rank[codes])
        gdoc = key // V
        vals = pc.take(gvocab, pa.array(order[key % V]))
        counts = np.bincount(gdoc, minlength=D)
    else:
        vals = grams
        counts = np.zeros(D, dtype=np.int64)
    offsets = np.zeros(D + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    glist = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     vals.cast(pa.string()))
    gbytes = pc.binary_join(glist, "\x00").cast(pa.binary())
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "gbytes": gbytes,
                     "dbucket": pa.array(ids % np.int64(nb), pa.int64())})


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.2, exact: bool = True,
                        bands: int = 32):
    """Pairs (a, b, jaccard≥threshold) over word-n-gram sets.

    ``exact=True``: blocked all-pairs baseline — each batch of docs is
    compared against the broadcast full gram-set dict. Quadratic AND
    whole-dataset-broadcast; intended ONLY for oracle verification at
    small scale. ``exact=False`` is the 100-TB path: candidate pairs
    come from MinHash-LSH blocking, membership and gram sets meet in a
    bucketed co-partition join, and exact Jaccard runs per verify
    partition — corpus-sized state never leaves the Dataset/object
    store and never lands on the driver.

    ``bands`` tunes the LSH sensitivity curve (rows-per-band =
    128/bands; collision probability 1-(1-j^r)^b). The default b=32,
    r=4 is recall-generous down to the lowest thresholds this repo
    oracles (j≈0.5 collides with P≈1-4e-5 per truly-similar pair).
    On corpora with heavy INTERMEDIATE similarity (template clusters
    at j≈0.6-0.7) and a high target threshold, that curve makes
    nearly every template pair a candidate — measured 166M candidate
    pairs from 50k docs at threshold 0.8 (see BASELINE.md round-5
    volume notes). There, pass bands=16 (r=8): collision at j=0.6
    drops from 98.8% to 24% while j≥0.9 pairs still collide at
    P≥99.9%; output stays exact-Jaccard-verified — the approximation
    is candidate recall at the threshold boundary, the same contract
    minhash_lsh_dedup documents.
    """
    import ray
    import ray.data as rd

    docs = _docs(sf_dir)

    if exact:
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

    # --- scale path: LSH candidates, exact verify via pairs ⋈ grams ---
    # candidate pairs from banded LSH (est filter 0.2 below the target
    # threshold: ~7.5σ of headroom for the 128-perm estimator at the
    # boundary, so exact recall survives boundary-hugging data; exact
    # verify prunes after). The candidate set stays a DATASET end to
    # end — nothing transits or is broadcast from the driver, so a
    # dup-heavy corpus whose candidate-pair list dwarfs one process
    # still streams. Both wide steps run as bucket_exchanges (see
    # stages/exchange.py): (1) membership ⋈ gram-sets co-partitioned
    # by hash(doc_id) — the join that tells each gram set which verify
    # partitions need it; (2) doc payloads ⋈ pair rows co-partitioned
    # by the pair's verify partition, where exact Jaccard runs.
    empty_pairs = pd.DataFrame(
        {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")})

    # pairs hash into a bounded number of verify partitions FIRST, so
    # a doc's gram set ships to each partition AT MOST ONCE (≤ NPARTS
    # copies) — not once per pair-side. On dup-heavy data (sf0.1: ~5M
    # candidate pairs over 4.5k docs) this cuts the join/shuffle
    # payload and the per-pair set construction by orders of magnitude.
    # Both counts follow the input-derived sizing policy (gram bytes ≈
    # corpus text bytes; the pair side is bounded per partition by the
    # same hash spread).
    from ..stages.sizing import auto_buckets

    NPARTS = auto_buckets(f"{sf_dir}/documents.parquet")
    NB = NPARTS  # doc-hash buckets of the membership ⋈ grams join

    cand = minhash_lsh_pairs(sf_dir, ngram=n, bands=bands,
                             threshold=max(0.0, threshold - 0.2))

    def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
        pa_ = batch["a"].to_numpy(dtype=np.int64)
        pb_ = batch["b"].to_numpy(dtype=np.int64)
        with np.errstate(over="ignore"):
            part = (pa_ * np.int64(1000003) + pb_) % NPARTS
        return pd.DataFrame({"pa": pa_, "pb": pb_, "part": part})

    pair_rows = cand.map_batches(pair_part, batch_format="pandas").materialize()
    if pair_rows.count() == 0:
        return rd.from_pandas(empty_pairs)

    def doc_part_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # skinny (doc_id, part) membership, deduped per block; the
        # cross-block duplicates collapse in join_reduce's global
        # drop_duplicates before any payload attaches
        df = pd.DataFrame(
            {"doc_id": np.concatenate([batch["pa"], batch["pb"]]),
             "part": np.concatenate([batch["part"], batch["part"]])}
        ).drop_duplicates()
        df["dbucket"] = df["doc_id"].to_numpy(dtype=np.int64) % NB
        return df

    membership = pair_rows.map_batches(doc_part_rows, batch_format="pandas")

    def gram_bytes_t(t: pa.Table) -> pa.Table:
        # fused split-side map, raw text → serialized gram sets in one
        # pure-Arrow kernel — the per-doc gram lists (≈ corpus text
        # volume) never materialize as their own Dataset and never
        # become Python objects
        return _gram_bytes_rows(t, n, NB)

    doc_part_schema = pa.schema(
        [("part", pa.int64()), ("doc_id", pa.int64()), ("gbytes", pa.binary())])

    def join_reduce(_b: int, mem_t, gram_t) -> pa.Table:
        # inner join on doc_id: non-candidate docs' gram sets drop
        # here; output ≤ one payload row per (doc, verify partition)
        if mem_t is None or gram_t is None or not mem_t.num_rows or not gram_t.num_rows:
            return doc_part_schema.empty_table()
        mem = mem_t.select(["doc_id", "part"]).to_pandas().drop_duplicates()
        gr = gram_t.select(["doc_id", "gbytes"]).to_pandas().drop_duplicates("doc_id")
        out = mem.merge(gr, on="doc_id", how="inner")[["part", "doc_id", "gbytes"]]
        return pa.Table.from_pandas(out, preserve_index=False).cast(doc_part_schema)

    doc_parts = bucket_exchange(
        [(membership, "dbucket"), (docs, "dbucket")], NB, join_reduce,
        schemas=[None, _GB_SCHEMA], map_fns=[None, gram_bytes_t])

    pairs_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())])

    def verify_reduce(_b: int, docs_t, pairs_t) -> pa.Table:
        """Exact-Jaccard verify for every pair in one partition.
        Identical serialized gram sets collapse into CLASSES
        (factorize on the bytes), jaccard is computed ONCE per unique
        class pair (a dict lookup + one C-level set intersection), and
        the per-pair result is a vectorized gather — on dup-heavy
        corpora the set work drops from O(pairs) to O(distinct-set
        pairs)."""
        if docs_t is None or pairs_t is None or not pairs_t.num_rows:
            return pairs_schema.empty_table()
        d_ids = docs_t["doc_id"].to_numpy(zero_copy_only=False)
        codes, uniq_bytes = pd.factorize(
            pd.Series(docs_t["gbytes"].to_pylist(), dtype=object))
        # doc -> class (first occurrence wins; dup doc rows agree)
        order = np.argsort(d_ids, kind="stable")
        ds_sorted, cs_sorted = d_ids[order], codes[order]
        first = np.r_[True, ds_sorted[1:] != ds_sorted[:-1]]
        doc_sorted, cls_sorted = ds_sorted[first], cs_sorted[first]
        pa_ = pairs_t["pa"].to_numpy(zero_copy_only=False)
        pb_ = pairs_t["pb"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(doc_sorted, pa_)
        ib = np.searchsorted(doc_sorted, pb_)
        n = len(doc_sorted)
        ok = ((ia < n) & (ib < n)
              & (doc_sorted[np.minimum(ia, n - 1)] == pa_)
              & (doc_sorted[np.minimum(ib, n - 1)] == pb_))
        pa_, pb_ = pa_[ok], pb_[ok]  # drop orphan pairs
        ca, cb = cls_sorted[ia[ok]], cls_sorted[ib[ok]]
        lo = np.minimum(ca, cb).astype(np.int64)
        hi = np.maximum(ca, cb).astype(np.int64)
        nc = np.int64(len(uniq_bytes))
        ukey, inv = np.unique(lo * nc + hi, return_inverse=True)
        sets = [set(by.split(b"\x00")) if by else set()
                for by in uniq_bytes]
        jac_u = np.empty(len(ukey), dtype=np.float64)
        for idx in range(len(ukey)):
            i, j = divmod(int(ukey[idx]), int(nc))
            ga, gbs = sets[i], sets[j]
            inter = len(ga & gbs)
            # sentinel -1: the original skips zero-intersection pairs
            # outright, even at threshold 0
            jac_u[idx] = (-1.0 if not inter
                          else inter / (len(ga) + len(gbs) - inter))
        jac = jac_u[inv]
        keep = jac >= threshold
        return pa.table(
            {"a": pa.array(pa_[keep].astype(np.int64), pa.int64()),
             "b": pa.array(pb_[keep].astype(np.int64), pa.int64()),
             "jaccard": pa.array(np.round(jac[keep], 6), pa.float64())})

    verified = bucket_exchange(
        [(doc_parts, "part"), (pair_rows, "part")], NPARTS, verify_reduce)
    return verified.sort(["a", "b"])


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


def embedding_cosine_pairs_blocked(sf_dir: str, threshold: float = 0.9,
                                   nlist: int = 16, nassign: int = 6,
                                   sample: int = 4096, seed: int = 11):
    """IVF-blocked near-dup pairs (the 100-TB path): each vector is
    assigned to its ``nassign`` nearest coarse cells, pairwise cosine
    runs ONLY within a cell (``groupby(cell).map_groups`` matmul), and
    pairs dedupe across cells. Precision is exact (cosine computed on
    the true vectors); recall depends on cell overlap — two vectors
    must share at least one of their ``nassign`` cells. Scales as
    O(N²/nlist · nassign²) vs the baseline's O(N²) with no broadcast
    of the full matrix.

    Centroids come from a deterministic k-means over a bounded Dataset
    sample (``limit(sample)``) — the driver never reads the full table.
    """
    import ray
    import ray.data as rd

    from .similarity import kmeans_fit

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    train = np.asarray(
        emb.limit(sample).to_pandas()["embedding"].tolist(), dtype=np.float64
    )
    norms = np.linalg.norm(train, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    centroids = kmeans_fit(train / norms, min(nlist, len(train)), seed=seed)
    cent_ref = ray.put(centroids)
    k_assign = min(nassign, len(centroids))

    class AssignCells:
        def __init__(self):
            self._c = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self._c is None:
                self._c = ray.get(cent_ref)
            vecs = np.asarray(batch["embedding"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            vecs = vecs / nrm
            sims = vecs @ self._c.T  # (B, nlist)
            cells = np.argsort(-sims, axis=1)[:, :k_assign]
            vids = batch["vec_id"].to_numpy()
            out_v, out_c, out_e, out_cl = [], [], [], []
            for i in range(len(vids)):
                raw = vecs[i].tobytes()
                # the row carries its full cell-assignment set so a
                # pair can be emitted exactly once (in the min shared
                # cell) with no cross-cell dedup shuffle
                cl = np.sort(cells[i].astype(np.int64)).tobytes()
                for c in cells[i]:
                    out_v.append(int(vids[i]))
                    out_c.append(int(c))
                    out_e.append(raw)
                    out_cl.append(cl)
            return pd.DataFrame(
                {"vec_id": out_v, "cell": out_c, "vec": out_e, "cells": out_cl})

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Pairwise cosine within one cell; a pair is emitted only
        when this cell is the MIN cell shared by both assignment sets
        (carried on the rows) — globally unique output, no dedup
        shuffle."""
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")})
        cell = int(g["cell"].iloc[0])
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return empty
        mat = np.stack([np.frombuffer(v, dtype=np.float64) for v in g["vec"]])
        cell_sets = [set(np.frombuffer(c, dtype=np.int64).tolist()) for c in g["cells"]]
        sims = mat @ mat.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        if not len(ii):
            return empty
        keep = [k for k in range(len(ii))
                if min(cell_sets[ii[k]] & cell_sets[jj[k]]) == cell]
        if not keep:
            return empty
        ii, jj = ii[keep], jj[keep]
        return pd.DataFrame(
            {"a": ids[ii].astype("int64"), "b": ids[jj].astype("int64"),
             "cosine": np.round(sims[ii, jj], 6)})

    return (
        emb.map_batches(AssignCells(), batch_format="pandas", batch_size=1024)
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pandas")
    )


def embedding_dedup(sf_dir: str, threshold: float = 0.9, method: str = "ivf"):
    """Near-dup clusters from cosine pairs (min-label components).

    ``method="ivf"`` (default) blocks comparisons by IVF cell — the
    scale path; ``method="exact"`` is the all-pairs oracle baseline.
    The cluster step is :func:`components_distributed` in both modes —
    no driver materialization of the pair set.
    """
    if method == "ivf":
        pairs = embedding_cosine_pairs_blocked(sf_dir, threshold)
    else:
        pairs = embedding_cosine_pairs(sf_dir, threshold)
    return components_distributed(pairs, id_col="vec_id")


# --------------------------------------------- chunk-level exact dedup

def chunk_dedup(sf_dir: str, chunk_words: int = 5,
                n_buckets: int | None = None, docs=None):
    """CCNet-style chunk-level exact dedup with document reassembly:
    split every document into fixed ``chunk_words``-word chunks (the
    paragraph stand-in — the synthetic corpus has no newlines), keep
    each distinct chunk's globally FIRST occurrence (min (doc_id,
    chunk_idx)), and reassemble the surviving chunks per document in
    original order. Documents whose every chunk was seen earlier drop
    out entirely.

    Two bounded-bucket exchanges, never an all-pairs step:

    1. chunk rows co-partition by ``crc32(chunk) % n_buckets`` — the
       winner per distinct chunk is decided vectorized inside one
       bucket (sort + drop_duplicates), so only chunk text + two int
       ids cross the wire (≈ corpus volume, the floor for content
       dedup);
    2. winners co-partition by ``doc_id % n_buckets`` — reassembly
       (sort by chunk_idx, join with spaces) is per-doc local to one
       bucket.

    Output: (doc_id, clean_text, n_chunks_kept, n_chunks_total).
    SQL-expressible (window rank over chunks) → DuckDB oracle.
    """
    from zlib import crc32

    import ray.data as rd

    from ..stages.sizing import auto_buckets

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")

    chunk_schema = pa.schema([
        ("doc_id", pa.int64()), ("ci", pa.int64()), ("chunk", pa.string()),
        ("n_chunks_total", pa.int64()), ("bucket", pa.int64()),
    ])

    def to_chunks(t: pa.Table) -> pa.Table:
        # fully vectorized chunking, zero per-token Python: Arrow
        # split_pattern explodes words into one flat values buffer;
        # chunk boundaries are every chunk_words-th word offset, so a
        # ListArray over the SAME values buffer re-groups words into
        # chunks and binary_join renders chunk strings in C++. The only
        # Python-level loop left is crc32 once per UNIQUE chunk.
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return chunk_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = pc.fill_null(t["text"], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = pa.concat_arrays(texts.chunks) if texts.num_chunks != 1 \
                else texts.chunk(0)
        lists = pc.split_pattern(texts, " ")
        offs = lists.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)                       # words per doc (>=1)
        counts = (lens + chunk_words - 1) // chunk_words
        doc_of = np.repeat(np.arange(len(ids)), counts)
        ci = (np.arange(counts.sum(), dtype=np.int64)
              - np.repeat(np.cumsum(counts) - counts, counts))
        starts = offs[:-1][doc_of] + ci * chunk_words
        new_offs = np.append(starts, offs[-1]).astype(np.int32)
        chunk_list = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                              lists.values)
        chunks = pc.binary_join(chunk_list, " ")
        codes, uniq = pd.factorize(chunks.to_numpy(zero_copy_only=False))
        ubuck = np.fromiter((crc32(c.encode()) for c in uniq),
                            dtype=np.int64, count=len(uniq)) % n_buckets
        return pa.table({
            "doc_id": pa.array(ids[doc_of], pa.int64()),
            "ci": pa.array(ci + 1, pa.int64()),
            "chunk": chunks,
            "n_chunks_total": pa.array(counts[doc_of], pa.int64()),
            "bucket": pa.array(ubuck[codes], pa.int64()),
        })

    if docs is None:
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    win_schema = pa.schema([
        ("doc_id", pa.int64()), ("ci", pa.int64()), ("chunk", pa.string()),
        ("n_chunks_total", pa.int64()), ("dbucket", pa.int64()),
    ])

    def keep_first(b: int, t) -> pa.Table:
        """Winner per distinct chunk = min (doc_id, ci): one
        ``dictionary_encode`` pass over the chunk strings (C-speed
        hash; equal strings → equal code), then an integer lexsort and
        a first-per-code scan — chunk text never enters pandas."""
        import pyarrow.compute as pc

        if t is None or t.num_rows == 0:
            return win_schema.empty_table()
        chunk = t["chunk"].combine_chunks()
        code = pc.dictionary_encode(chunk).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = t["ci"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ci, doc, code))
        cs = code[o]
        sel = o[np.r_[True, cs[1:] != cs[:-1]]]
        tot = t["n_chunks_total"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc[sel], pa.int64()),
            "ci": pa.array(ci[sel], pa.int64()),
            "chunk": chunk.take(pa.array(sel)),
            "n_chunks_total": pa.array(
                tot[sel].astype(np.int64), pa.int64()),
            "dbucket": pa.array(doc[sel] % n_buckets, pa.int64()),
        }).cast(win_schema)

    # map-side fusion: the chunk explosion (≈ corpus text volume plus
    # per-chunk ids) goes straight from each docs block to bucket
    # slices inside the split task — never a materialized Dataset
    winners = bucket_exchange([(docs, "bucket")], n_buckets, keep_first,
                              schemas=[chunk_schema], map_fns=[to_chunks])

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("clean_text", pa.string()),
        ("n_chunks_kept", pa.int64()), ("n_chunks_total", pa.int64()),
    ])

    def reassemble(b: int, t) -> pa.Table:
        """Per-doc reassembly without Python joins: integer lexsort by
        (doc_id, ci), then a ListArray over the sorted chunk values and
        one ``binary_join`` renders every doc's clean_text in C++."""
        import pyarrow.compute as pc

        if t is None or t.num_rows == 0:
            return out_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = t["ci"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t["n_chunks_total"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ci, doc))
        ds_ = doc[o]
        newd = np.r_[True, ds_[1:] != ds_[:-1]]
        offs = np.r_[np.flatnonzero(newd), len(ds_)].astype(np.int32)
        vals = t["chunk"].combine_chunks().take(pa.array(o))
        clean = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals), " ")
        return pa.table({
            "doc_id": pa.array(ds_[newd], pa.int64()),
            "clean_text": clean,
            "n_chunks_kept": pa.array(np.diff(offs).astype(np.int64),
                                      pa.int64()),
            "n_chunks_total": pa.array(tot[o][newd].astype(np.int64),
                                       pa.int64()),
        }).cast(out_schema)

    return bucket_exchange([(winners, "dbucket")], n_buckets, reassemble,
                           schemas=[win_schema])
