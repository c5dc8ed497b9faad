"""Text-analysis operators over a ``documents``-shaped table
(``doc_id, text, lang, source, n_chars``) — the large-scale
training-data-pipeline additions (token counting, quality scoring,
language ID, fingerprinting).

Every operator is a vectorized ``map_batches`` Dataset program whose
semantics are deliberately SQL-expressible, so each has a DuckDB
oracle in ``__ray_entry__.oracle_sql`` (the correctness gate).

Heuristics are deterministic and documented inline; they make no claim
of linguistic accuracy — they are the *shape* of a language-ID /
quality stage (stateful setup in ``__init__``, vectorized per batch)
with exactly reproducible outputs.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

__all__ = [
    "token_stats",
    "quality_scores",
    "lang_id",
    "text_fingerprint",
    "winnow_doc",
    "winnow_fingerprints",
    "tfidf_scores",
    "tfidf_top_terms",
    "hash_split",
    "pack_sequences",
    "regex_redact",
    "decontaminate",
    "repetition_stats",
    "classifier_scores",
    "lm_perplexity",
    "STOPWORDS",
    "LANG_MARKERS",
]

STOPWORDS = ("the", "a", "of", "and", "to")

# marker words per language, checked in priority order (ties → earlier)
LANG_MARKERS = [
    ("en", ("the", "a", "and")),
    ("de", ("der", "die", "und")),
    ("es", ("el", "la", "los")),
    ("fr", ("le", "les", "des")),
]

_BPE_ISH = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _docs_count(sf_dir: str) -> int:
    """Corpus size from parquet footer metadata — O(footers), never a
    full Dataset pass (a ``count()`` here would stream every block of
    a 100-TB table just to learn N)."""
    import glob as _glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True)) if os.path.isdir(path) else [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def token_stats(sf_dir: str):
    """Per-doc token counts: whitespace tokens and a BPE-ish regex
    tokenization (word pieces + single punctuation marks)."""

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
        # Arrow C++ regex scans (RE2): the whitespace-token count is a
        # maximal \S+ run count; the BPE-ish pattern is RE2-compatible
        # (leftmost-first alternation, same matches as Python re —
        # parity pinned against the pandas path in pytest)
        filled = pc.fill_null(t["text"].combine_chunks(), "")
        return pa.table({
            "doc_id": t["doc_id"],
            "n_ws_tokens": pc.count_substring_regex(
                filled, r"\S+").cast(pa.int64()),
            "n_bpe_tokens": pc.count_substring_regex(
                filled, _BPE_ISH.pattern).cast(pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


# a stopword is a whole whitespace token equal to one of STOPWORDS:
# anchor on start-or-whitespace (consumed) and whitespace-or-end
# (lookahead, so adjacent stopwords separated by one space both match)
_STOP_RE = re.compile(
    r"(?:^|\s)(?:" + "|".join(re.escape(w) for w in STOPWORDS) + r")(?=\s|$)"
)


def _quality_arrays(filled) -> dict:
    """Arrow-native quality statistics over a (null-filled) string
    array — ONE whitespace split feeds every count: ``n_words`` =
    non-empty tokens (``count(r"\\S+")`` parity), ``total_wlen`` =
    summed token codepoint lengths (``count(r"\\S")`` parity — split
    removes exactly whitespace), ``n_stop`` = whole-token membership
    in STOPWORDS via ``pc.is_in`` (identical to the anchored regex:
    a stopword counts iff it is a maximal \\S+ run). The pandas
    ``.str.count`` path this replaces re-ran a Python-level regex per
    row; here every step is an Arrow C++ kernel or a bincount."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    D = len(filled)
    n_chars = pc.utf8_length(filled).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    toks = pc.utf8_split_whitespace(filled)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nonempty = wlen > 0  # Arrow keeps boundary-empty tokens; split() drops
    n_words = np.bincount(parent[nonempty], minlength=D).astype(np.int64)
    total_wlen = np.bincount(parent, weights=wlen,
                             minlength=D).astype(np.int64)
    is_stop = pc.is_in(
        flat, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(parent[is_stop], minlength=D).astype(np.int64)
    nw1 = np.maximum(n_words, 1)
    stop_ratio = np.round(n_stop / nw1, 6)
    quality = np.round(np.minimum(n_words / 100.0, 1.0)
                       * (1 - stop_ratio), 6)
    return {"n_chars": n_chars, "n_words": n_words, "n_stopwords": n_stop,
            "mean_word_len": np.round(total_wlen / nw1, 6),
            "stop_ratio": stop_ratio, "quality": quality}


def quality_of(texts: pd.Series) -> pd.Series:
    """The clamped linear quality score used across the pipeline
    (also by dedup's keep-best policy): ``least(1, n_words/100) *
    (1 - stop_ratio)``, rounded to 6 dp. Computed by the Arrow
    kernel :func:`_quality_arrays` (the former pandas ``.str.count``
    path ran a Python regex per row)."""
    import pyarrow as pa

    q = _quality_arrays(pa.array(texts, pa.string()))["quality"]
    return pd.Series(q, index=texts.index)


def quality_scores(sf_dir: str):
    """Quality heuristics: length, word count, mean word length,
    stopword ratio, and a clamped linear score
    ``least(1, n_words/100) * (1 - stop_ratio)`` rounded to 6 dp.
    One Arrow split feeds every count (:func:`_quality_arrays`)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def score(t: pa.Table) -> pa.Table:
        qa = _quality_arrays(pc.fill_null(t["text"].combine_chunks(), ""))
        cols = {"doc_id": t["doc_id"]}
        for name in ("n_chars", "n_words", "n_stopwords",
                     "mean_word_len", "stop_ratio", "quality"):
            cols[name] = pa.array(qa[name])
        return pa.table(cols)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def lang_id(sf_dir: str):
    """Marker-word language ID: count marker hits per language, predict
    the argmax (priority order breaks ties), default ``en``."""

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    langs = np.array([lang for lang, _ in LANG_MARKERS], dtype=object)
    marker_sets = [pa.array(list(ms)) for _, ms in LANG_MARKERS]

    def predict(t: pa.Table) -> pa.Table:
        # whole-token marker counting = split + per-language is_in
        # membership (identical to the anchored regex: a marker counts
        # iff it is a maximal \S+ run); prediction is argmax with
        # priority-order ties (np.argmax keeps the first maximum)
        D = t.num_rows
        toks = pc.utf8_split_whitespace(
            pc.fill_null(t["text"].combine_chunks(), ""))
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        counts = np.empty((D, len(marker_sets)), dtype=np.int64)
        for j, ms in enumerate(marker_sets):
            hit = pc.is_in(flat, value_set=ms).to_numpy(zero_copy_only=False)
            counts[:, j] = np.bincount(parent[hit], minlength=D)
        return pa.table({
            "doc_id": t["doc_id"],
            "pred_lang": pa.array(langs[np.argmax(counts, axis=1)],
                                  pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        predict, batch_format="pyarrow")


def text_fingerprint(sf_dir: str):
    """Content fingerprint: md5 of the exact text bytes (D4-style
    content addressing re-used for documents)."""
    import hashlib

    def fp(t) -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        texts = pc.fill_null(t["text"], "").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "fp_md5": pa.array(
                [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts],
                pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


# Polynomial (Rabin-Karp-style) k-gram hash over per-token blake2b
# hashes — the rolling-hash construction the winnowing paper assumes
# (Schleimer/Wilkerson/Aiken §2: k-grams are hashed incrementally, not
# re-digested per gram). Tokens get a crypto-quality 64-bit hash ONCE
# per distinct token; a gram's hash is the odd-constant polynomial fold
# of its token hashes (mod 2^64), >> 1 to stay in int63 range. This
# makes the batch kernel fully vectorizable: blake2b runs once per
# batch-unique TOKEN (vocab ≪ tokens), the fold is k numpy ops.
_WINNOW_P = 0x9E3779B97F4A7C15  # odd 64-bit multiplier (golden ratio)


def _token_hash(word: str) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(word.encode(), digest_size=8).digest(), "big")


def _gram_hash(token_hashes) -> int:
    h = 0
    for t in token_hashes:
        h = (h * _WINNOW_P + t) & 0xFFFFFFFFFFFFFFFF
    return h >> 1


def winnow_doc(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD'03) over word k-gram rolling hashes: from every window of
    ``window`` consecutive k-gram hashes keep the minimum (rightmost
    minimum on ties — the standard robust-winnowing rule), dedup
    consecutive selections. Deterministic; numpy-vectorized. The
    per-doc reference for the batch kernel :func:`_winnow_batch`.
    """
    import numpy as np

    words = text.split()
    th = [_token_hash(w) for w in words]
    if len(words) < k:
        grams = [th] if words else []
    else:
        grams = [th[i : i + k] for i in range(len(words) - k + 1)]
    if not grams:
        return []
    h = np.fromiter((_gram_hash(g) for g in grams),
                    dtype=np.uint64, count=len(grams))
    if len(h) <= window:
        return [int(h.min())]
    # sliding windows (n-window+1, window); rightmost-min = argmin on
    # the reversed window
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    rev = win[:, ::-1]
    right_idx = window - 1 - np.argmin(rev, axis=1)
    picks = win[np.arange(len(win)), right_idx]
    pos = np.arange(len(win)) + right_idx
    # keep each selected position once (consecutive windows often pick
    # the same gram)
    keep = np.ones(len(pos), dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    return [int(v) for v in picks[keep]]


def _winnow_batch(t, k: int, window: int):
    """Batch-wide winnowing kernel, exactly :func:`winnow_doc` per row
    (pinned by ``test_winnow_batch_matches_winnow_doc``) with no
    per-doc or per-gram Python loop: Arrow whitespace tokenize
    (boundary-empty tokens dropped — ``split()`` parity),
    ``dictionary_encode`` the token stream so blake2b runs once per
    batch-UNIQUE token (Heaps' law: vocab ≪ tokens), gram hashes are
    the k-step numpy polynomial fold over shifted slices (no gram
    string is ever built), and the window selection is one global
    sliding-window rightmost-min scan masked at doc boundaries plus
    ``reduceat`` per-doc reductions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema([
        ("doc_id", pa.int64()), ("n_fingerprints", pa.int64()),
        ("fp_min", pa.uint64()), ("fp_xor", pa.uint64())])
    D = t.num_rows
    if not D:
        return schema.empty_table()
    toks = pc.utf8_split_whitespace(
        pc.fill_null(t["text"].combine_chunks(), ""))
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_py = enc.dictionary.to_pylist()
    if "" in vocab_py:
        keep_i = codes != vocab_py.index("")
        codes, parent = codes[keep_i], parent[keep_i]
    # blake2b once per batch-unique token; th = 64-bit hash per token
    uh = np.fromiter((_token_hash(w) for w in vocab_py),
                     dtype=np.uint64, count=len(vocab_py))
    th = uh[codes] if len(codes) else np.empty(0, np.uint64)
    nw = np.bincount(parent, minlength=D).astype(np.int64)
    off = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(nw, out=off[1:])

    P = np.uint64(_WINNOW_P)
    # long docs (nw >= k): m = nw-k+1 overlapping k-grams each, hashed
    # doc-major so each doc's grams are contiguous
    ldocs = np.flatnonzero(nw >= k)
    m = nw[ldocs] - k + 1
    tot_l = int(m.sum())
    if tot_l:
        mstart = np.zeros(len(ldocs), dtype=np.int64)
        np.cumsum(m[:-1], out=mstart[1:])
        rep = np.repeat(np.arange(len(ldocs)), m)
        intra = np.arange(tot_l, dtype=np.int64) - mstart[rep]
        gs = off[ldocs][rep] + intra
        gdoc = ldocs[rep]
        # fold over shifted CONTIGUOUS slices of the flat token-hash
        # stream (cross-doc positions compute garbage that gs never
        # selects), then ONE gather — k gathers would dominate
        nt = len(th)
        hf = th[: nt - k + 1].copy()
        for i in range(1, k):
            hf = hf * P + th[i: nt - k + 1 + i]
        h_long = hf[gs] >> np.uint64(1)
    else:
        gdoc = np.empty(0, dtype=np.int64)
        h_long = np.empty(0, np.uint64)
    # short docs (0 < nw < k): ONE gram = fold of all the doc's token
    # hashes — ≤ k-1 masked vectorized steps, no per-doc loop
    sdocs = np.flatnonzero((nw > 0) & (nw < k))
    if len(sdocs):
        h_short = th[off[sdocs]].copy()
        for step in range(1, k - 1):
            mask = nw[sdocs] > step
            h_short[mask] = (h_short[mask] * P
                             + th[off[sdocs][mask] + step])
        h_short >>= np.uint64(1)
    else:
        h_short = np.empty(0, np.uint64)

    n_fp = np.zeros(D, dtype=np.int64)
    fp_min = np.zeros(D, dtype=np.uint64)
    fp_xor = np.zeros(D, dtype=np.uint64)

    # window-selection path: every window fully inside one doc (the
    # boundary mask also excludes docs with m <= window entirely)
    if tot_l >= window:
        win = np.lib.stride_tricks.sliding_window_view(h_long, window)
        valid = np.flatnonzero(gdoc[: tot_l - window + 1]
                               == gdoc[window - 1:])
        if len(valid):
            # argmin over the reversed strided VIEW of every window
            # (rightmost minimum), masked after — a fancy-indexed
            # win[valid] would copy ~window× the hash stream
            right = window - 1 - np.argmin(win[:, ::-1], axis=1)[valid]
            pos = valid + right
            pdoc = gdoc[valid]
            newdoc = np.r_[True, pdoc[1:] != pdoc[:-1]]
            keep = newdoc | np.r_[True, pos[1:] != pos[:-1]]
            picks, kdoc = h_long[pos[keep]], pdoc[keep]
            starts = np.flatnonzero(np.r_[True, kdoc[1:] != kdoc[:-1]])
            docs_w = kdoc[starts]
            n_fp[docs_w] = np.diff(np.r_[starts, len(picks)])
            fp_min[docs_w] = np.minimum.reduceat(picks, starts)
            fp_xor[docs_w] = np.bitwise_xor.reduceat(picks, starts)

    # min-only path: short docs and long docs with m <= window grams
    # (winnow_doc: len(h) <= window -> [min(h)])
    if tot_l:
        lmin = np.minimum.reduceat(h_long, np.r_[0, np.cumsum(m)[:-1]])
        small = m <= window
        docs_s = ldocs[small]
        n_fp[docs_s] = 1
        fp_min[docs_s] = lmin[small]
        fp_xor[docs_s] = lmin[small]
    if len(sdocs):
        n_fp[sdocs] = 1
        fp_min[sdocs] = h_short
        fp_xor[sdocs] = h_short

    return pa.table({
        "doc_id": t["doc_id"],
        "n_fingerprints": pa.array(n_fp, pa.int64()),
        "fp_min": pa.array(fp_min, pa.uint64()),
        "fp_xor": pa.array(fp_xor, pa.uint64())}).cast(schema)


def winnow_fingerprints(sf_dir: str, k: int = 5, window: int = 4):
    """Per-doc winnowing summary: (doc_id, n_fingerprints, fp_min,
    fp_xor) — the rolling-hash document-fingerprinting stage of a
    training-data pipeline. Rows-only driver check (the selection rule
    is not SQL-expressible); pinned by a pure-python reference in
    pytest. The kernel is batch-vectorized (:func:`_winnow_batch`);
    :func:`winnow_doc` remains the per-doc reference semantics."""

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _winnow_batch(t, k, window), batch_format="pyarrow")


# --- tf-idf -----------------------------------------------------------

# The scores exchange is the expensive step and both tfidf_scores and
# tfidf_top_terms need it; the output rides in the object store as
# already-computed arrow refs (bucket_exchange returns from_arrow_refs),
# so caching the Dataset shares one exchange across queries in a
# session. The key carries everything the cached rows depend on:
# corpus path + bucket count (semantic inputs), a file fingerprint
# (mtime+size per shard — a regenerated corpus at the same path must
# miss), and the Ray job id (after ray.shutdown()/ray.init() the cached
# Dataset's object refs are dead — a new session must miss).
_TFIDF_CACHE: dict[tuple, object] = {}


def _tfidf_cache_key(sf_dir: str, n_buckets: int):
    """Cache key for the scores exchange, or ``None`` when Ray isn't
    initialized (a cached Dataset can't be valid then)."""
    import glob as _glob

    import ray

    if not ray.is_initialized():
        return None
    path = f"{sf_dir}/documents.parquet"
    files = (sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                               recursive=True))
             if os.path.isdir(path) else [path])
    try:
        fp = tuple((f, os.stat(f).st_mtime_ns, os.stat(f).st_size)
                   for f in files)
    except OSError:
        return None
    return (os.path.abspath(sf_dir), n_buckets, fp,
            ray.get_runtime_context().get_job_id())

_TERM_ROW_SCHEMA = None  # built lazily (pa import stays function-local)


def _term_row_schema():
    import pyarrow as pa

    global _TERM_ROW_SCHEMA
    if _TERM_ROW_SCHEMA is None:
        _TERM_ROW_SCHEMA = pa.schema([
            ("doc_id", pa.int64()),
            ("term", pa.dictionary(pa.int32(), pa.string())),
            ("tf", pa.int64()), ("tbucket", pa.int64())])
    return _TERM_ROW_SCHEMA


def _term_rows(t, n_buckets: int):
    """Explode a docs block to (doc_id, term, tf) rows bucketed by
    hash(term) — pure Arrow (the lm_perplexity idiom): tokenize with
    ``utf8_split_whitespace`` (parity with ``str.split()`` after
    dropping Arrow's boundary-empty tokens), ``dictionary_encode``
    once, aggregate tf over integer composite keys, and ship terms as
    dictionary arrays (int32 codes + one block-vocab dictionary per
    slice) — no token ever becomes a Python object."""
    from zlib import crc32

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = _term_row_schema()
    if t.num_rows == 0:
        return schema.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.utf8_split_whitespace(
        pc.fill_null(t["text"].combine_chunks(), ""))
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    vocab_py = vocab.to_pylist()
    if "" in vocab_py:
        keep = codes != vocab_py.index("")
        codes, parent = codes[keep], parent[keep]
    if not len(codes):
        return schema.empty_table()
    # tf per (doc, term): factorize the integer composite key
    comp = parent.astype(np.int64) * np.int64(len(vocab_py)) + codes
    grp, guniq = pd.factorize(comp)
    tf = np.bincount(grp).astype(np.int64)
    guniq = np.asarray(guniq, dtype=np.int64)
    gparent = guniq // len(vocab_py)
    gcode = guniq % len(vocab_py)
    vb = np.fromiter((crc32(w.encode()) % n_buckets for w in vocab_py),
                     dtype=np.int64, count=len(vocab_py))
    return pa.table({
        "doc_id": pa.array(ids[gparent], pa.int64()),
        "term": pa.DictionaryArray.from_arrays(
            pa.array(gcode.astype(np.int32)), vocab),
        "tf": pa.array(tf, pa.int64()),
        "tbucket": pa.array(vb[gcode], pa.int64())})


def tfidf_scores(sf_dir: str, n_buckets: int | None = None,
                 _encoded: bool = False):
    """Corpus tf-idf: one row per (doc, term) with ``tf``, ``df`` and
    ``tfidf = round(tf * ln(N / df), 6)`` (N = corpus size, whitespace
    tokens, exact-match terms).

    100-TB shape: term rows co-partition by ``hash(term)`` in ONE
    bucket exchange — every occurrence of a term lands in the same
    bucket, so document frequency and the idf join both complete
    locally inside the bucket. No vocabulary broadcast, no driver
    state; the only wide step moves (doc_id, term, tf) rows once.
    """
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import bucket_exchange
    from ..stages.sizing import auto_buckets

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")

    def _decode(t: pa.Table) -> pa.Table:
        # public-boundary decode: the cached/internal form keeps term
        # dictionary-encoded (int32 codes, ~3x smaller in the store);
        # plain strings materialize only in the consumer-facing rows
        import pyarrow.compute as pc

        i = t.schema.get_field_index("term")
        return t.set_column(i, "term", pc.cast(t["term"], pa.string()))

    key = _tfidf_cache_key(sf_dir, n_buckets)
    cached = _TFIDF_CACHE.get(key) if key is not None else None
    if cached is not None:
        return cached if _encoded else cached.map_batches(
            _decode, batch_format="pyarrow")

    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = _docs_count(sf_dir)

    schema = pa.schema([
        ("doc_id", pa.int64()),
        ("term", pa.dictionary(pa.int32(), pa.string())),
        ("tf", pa.int64()), ("df", pa.int64()), ("tfidf", pa.float64()),
    ])

    def score_bucket(_b: int, t) -> pa.Table:
        """df + idf join over unified dictionary CODES (the
        lm_perplexity idiom): distinct-doc counts per term are a
        factorize+bincount over an integer composite — no string
        touches pandas; terms decode to plain strings only in the
        output column."""
        if t is None or t.num_rows == 0:
            return schema.empty_table()
        tcol = t["term"].combine_chunks()
        codes = tcol.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = len(tcol.dictionary)
        # document frequency = DISTINCT docs per term (robust to a
        # doc_id appearing in more than one source block)
        dg, duniq = pd.factorize(doc)
        grp, guniq = pd.factorize(codes * np.int64(len(duniq)) + dg)
        pair_term = (np.asarray(guniq, dtype=np.int64)
                     // np.int64(len(duniq)))
        dfreq_term = np.bincount(pair_term, minlength=V).astype(np.int64)
        dfreq = dfreq_term[codes]
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfidf = np.round(tf * np.log(n_docs / dfreq.astype(np.float64)), 6)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "term": tcol,
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(dfreq, pa.int64()),
            "tfidf": pa.array(tfidf, pa.float64())}).cast(schema)

    out = bucket_exchange([(docs, "tbucket")], n_buckets, score_bucket,
                          schemas=[_term_row_schema()],
                          map_fns=[lambda t: _term_rows(t, n_buckets)])
    # re-key after the build: bucket_exchange initialized Ray if it
    # wasn't up at entry, so the key is computable now
    key = _tfidf_cache_key(sf_dir, n_buckets)
    if key is not None:
        _TFIDF_CACHE[key] = out
    return out if _encoded else out.map_batches(_decode,
                                                batch_format="pyarrow")


def tfidf_top_terms(sf_dir: str, k: int = 5, n_buckets: int | None = None):
    """Top-``k`` terms per document by tf-idf (rank 1..k; ties break on
    term ascending, ordering on the ROUNDED score so the ranking is
    engine-independent). Second co-partition by ``hash(doc_id)`` — all
    of a doc's terms meet in one bucket for the vectorized top-k."""
    import pyarrow as pa

    from ..stages.exchange import bucket_exchange
    from ..stages.sizing import auto_buckets

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")
    scores = tfidf_scores(sf_dir, n_buckets, _encoded=True)

    import numpy as np
    import pyarrow.compute as pc

    ship_schema = pa.schema([
        ("doc_id", pa.int64()),
        ("term", pa.dictionary(pa.int32(), pa.string())),
        ("tfidf", pa.float64()), ("dbucket", pa.int64())])

    def add_dbucket(t: pa.Table) -> pa.Table:
        """Project to the three needed columns (tf/df don't ride the
        exchange); terms are already dictionary-encoded — int32 codes
        per row plus one vocab dictionary per slice."""
        if t.num_rows == 0:
            return ship_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({
            "doc_id": t["doc_id"],
            "term": t["term"].combine_chunks(),
            "tfidf": t["tfidf"],
            "dbucket": pa.array(doc % n_buckets, pa.int64())})

    schema = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()),
        ("tfidf", pa.float64()), ("rank", pa.int64()),
    ])

    def topk_bucket(_b: int, t) -> pa.Table:
        """Vectorized per-doc top-k over CODES: rank codes by the
        lexicographic order of the unified dictionary (small; one
        object argsort over the vocab), then one numpy lexsort of
        (doc asc, tfidf desc, term-rank asc) and a boundary-scan rank.
        Terms decode to strings only for the k kept rows."""
        if t is None or t.num_rows == 0:
            return schema.empty_table()
        tcol = t["term"].combine_chunks()
        codes = tcol.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = tcol.dictionary
        # rank-of-code under lexicographic vocab order
        vorder = np.argsort(np.asarray(vocab.to_pandas(), dtype=object),
                            kind="stable")
        vrank = np.empty(len(vorder), dtype=np.int64)
        vrank[vorder] = np.arange(len(vorder))
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfidf = t["tfidf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vrank[codes], -tfidf, doc))
        doc_s, codes_s, tfidf_s = doc[order], codes[order], tfidf[order]
        n = len(doc_s)
        new_doc = np.r_[True, doc_s[1:] != doc_s[:-1]]
        start = np.maximum.accumulate(
            np.where(new_doc, np.arange(n, dtype=np.int64), 0))
        rank = np.arange(n, dtype=np.int64) - start + 1
        keep = rank <= k
        return pa.table({
            "doc_id": pa.array(doc_s[keep], pa.int64()),
            "term": pc.take(vocab, pa.array(codes_s[keep])).cast(pa.string()),
            "tfidf": pa.array(tfidf_s[keep], pa.float64()),
            "rank": pa.array(rank[keep], pa.int64())}).cast(schema)

    return bucket_exchange([(scores, "dbucket")], n_buckets, topk_bucket,
                           schemas=[ship_schema], map_fns=[add_dbucket])


# --- deterministic split ----------------------------------------------

def hash_split(sf_dir: str, weights=(("train", 0.9), ("val", 0.05), ("test", 0.05)),
               key: str = "doc_id"):
    """Deterministic train/val/test assignment: split by
    ``md5(str(key)) % 1e6`` against cumulative weight boundaries —
    stable across runs, machines and shard counts (the property a
    training-data split must have; a random split resplits on every
    re-run). Pure map, no shuffle."""
    import hashlib as _hl

    import ray.data as rd

    bounds = []
    acc = 0.0
    for name, w in weights:
        acc += w
        bounds.append((name, int(round(acc * 1_000_000))))
    if bounds[-1][1] != 1_000_000:
        # not assert: stripped under -O, and a short last boundary
        # would silently drop every row hashing past it
        raise ValueError(f"split weights must sum to 1, got {acc}")
    last_split = bounds[-1][0]

    import numpy as np
    import pyarrow as pa

    his = np.array([hi for _, hi in bounds], dtype=np.int64)
    names = np.array([name for name, _ in bounds], dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        # Arrow-native: no pandas round-trip; boundary lookup is one
        # vectorized searchsorted (h < hi -> first boundary past h; h
        # can never reach the last boundary since h < 1e6)
        vals = t[key].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (int(_hl.md5(str(v).encode()).hexdigest()[:8], 16) % 1_000_000
             for v in vals), dtype=np.int64, count=len(vals))
        idx = np.minimum(np.searchsorted(his, h, side="right"), len(his) - 1)
        return pa.table({key: t[key],
                         "split": pa.array(names[idx], pa.string())})

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=[key]).map_batches(
        assign, batch_format="pyarrow")


def stratified_sample(sf_dir: str,
                      rates=(("en", 300_000),),
                      default_rate: int = 700_000,
                      key: str = "doc_id", stratum: str = "lang"):
    """Deterministic stratified downsampling — the corpus-balancing
    stage of a training-data pipeline (e.g. shrink an over-represented
    language without touching the long tail). A row survives iff
    ``md5(str(key)) % 1e6 < rate[stratum]`` (rates in parts-per-
    million), so the sample is a pure function of the corpus: stable
    across runs, machines and shard counts, and a row's fate never
    depends on any other row. Pure map, no shuffle, columns pruned at
    the read."""
    import hashlib as _hl

    import numpy as np
    import ray.data as rd

    rate_map = dict(rates)

    import pyarrow as pa

    def keep(t: pa.Table) -> pa.Table:
        # Arrow-native filter: build the survival mask in numpy, slice
        # the table zero-copy (no pandas round-trip)
        vals = t[key].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (int(_hl.md5(str(v).encode()).hexdigest()[:8], 16) % 1_000_000
             for v in vals), dtype=np.int64, count=len(vals))
        strata = t[stratum].to_numpy(zero_copy_only=False)
        caps = np.fromiter((rate_map.get(v, default_rate) for v in strata),
                           dtype=np.int64, count=len(strata))
        return t.filter(pa.array(h < caps))

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=[key, stratum]).map_batches(
        keep, batch_format="pyarrow")


# --- sequence packing ---------------------------------------------------

def pack_sequences(sf_dir: str, budget: int = 2048,
                   n_buckets: int | None = None):
    """Greedy next-fit packing of documents into fixed token budgets —
    the batch-assembly stage of a training-data pipeline (docs
    concatenate into ~budget-token training sequences).

    Deterministic and shard-independent: docs pack in doc_id order
    WITHIN their hash bucket (bucket = doc_id % n_buckets), and bin
    ids are (bucket << 32) | bucket-local index, so output is a pure
    function of the corpus. A doc longer than the budget occupies a
    single-doc bin (truncation is the trainer's decision, not the
    packer's). Packing is inherently sequential per bin stream, so the
    parallel unit is the bucket: the only wide step moves skinny
    (doc_id, n_tokens) rows once; the per-bucket loop is over DOCS,
    not tokens. Output: one row per doc (doc_id, n_tokens, bin_id,
    bin_tokens), where bin_tokens is the bin's final fill.

    Not SQL-expressible (running reset-on-overflow cumsum) → rows-only
    driver check; pinned against a pure-python reference in pytest.
    """
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import bucket_exchange
    from ..stages.sizing import auto_buckets

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")

    def tok_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = pc.count_substring_regex(
            pc.fill_null(t["text"], ""), r"\S+").cast(pa.int64())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": n_tok,
                         "bucket": pa.array(ids % n_buckets, pa.int64())})

    schema = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("bin_id", pa.int64()), ("bin_tokens", pa.int64()),
    ])

    def pack_bucket(b: int, t) -> pa.Table:
        if t is None or t.num_rows == 0:
            return schema.empty_table()
        df = t.select(["doc_id", "n_tokens"]).to_pandas().sort_values("doc_id")
        ids = df["doc_id"].to_numpy()
        toks = df["n_tokens"].to_numpy()
        bin_idx = np.empty(len(ids), dtype=np.int64)
        fill, cur = 0, 0
        fills = []
        for i, n in enumerate(toks):
            if fill and fill + n > budget:
                fills.append(fill)
                cur += 1
                fill = 0
            bin_idx[i] = cur
            fill += int(n)
        fills.append(fill)
        fills_arr = np.asarray(fills, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "bin_id": pa.array((b << 32) | bin_idx, pa.int64()),
            "bin_tokens": pa.array(fills_arr[bin_idx], pa.int64()),
        })

    rows_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                             ("bucket", pa.int64())])
    return bucket_exchange([(_docs(sf_dir, ["doc_id", "text"]), "bucket")],
                           n_buckets, pack_bucket,
                           schemas=[rows_schema], map_fns=[tok_rows])


# ------------------------------------------------------- PII redaction

# Default redaction rules: (name, pattern, replacement), applied in
# order. Patterns stick to RE2-compatible syntax ([0-9], (?:...), \b)
# so the DuckDB oracle runs the IDENTICAL strings; counts are taken on
# the ORIGINAL text (rules here match disjoint spans, so sequential-
# vs-original counting cannot differ — documented invariant).
REDACT_RULES = (
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    # demo rule that actually fires on the synthetic corpus (word-salad
    # text carries no PII): whole-token stopword 'the'
    ("stop", r"\b(?:the)\b", "<STOP>"),
)


def regex_redact(sf_dir: str, rules=REDACT_RULES):
    """PII-style regex redaction: apply each (name, pattern, repl) rule
    to ``text`` in order, emitting the cleaned text plus a per-rule
    match count ``n_<name>`` (counted on the original text). The shape
    of a scrubbing stage in a training-data pipeline — patterns are
    config; compiled once at pipeline build, vectorized
    ``Series.str.count`` / ``str.replace`` per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    rules = tuple(rules)

    def scrub(t: pa.Table) -> pa.Table:
        # the rule patterns are RE2-compatible by contract (shared
        # verbatim with the DuckDB oracle), so counts and replaces are
        # Arrow C++ RE2 kernels — the former pandas .str path ran a
        # Python re.sub per row per rule
        texts = pc.fill_null(t["text"].combine_chunks(), "")
        out = {"doc_id": t["doc_id"]}
        clean = texts
        for name, pat, repl in rules:
            out[f"n_{name}"] = pc.count_substring_regex(
                texts, pat).cast(pa.int64())
            clean = pc.replace_substring_regex(clean, pat, repl)
        out["clean_text"] = clean
        return pa.table(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")


# ------------------------------------------- benchmark decontamination

DECON_EVERY = 13       # benchmark = docs with doc_id % 13 == 0 ...
DECON_MAX_ID = 1000    # ... and doc_id < 1000 → ≤ 77 snippets at ANY
                       # corpus scale (a real benchmark set is a fixed
                       # small external artifact; deriving it from a
                       # bounded id range keeps the bench synthetic
                       # while keeping the broadcast side O(1))
DECON_SNIP_WORDS = 5


def decontaminate(sf_dir: str, every: int = DECON_EVERY,
                  max_id: int = DECON_MAX_ID,
                  snip_words: int = DECON_SNIP_WORDS):
    """Exact-substring benchmark decontamination: flag every document
    whose text contains any benchmark snippet verbatim (the
    conservative pre-training hygiene check). The benchmark side is a
    BOUNDED set (≤ max_id/every snippets regardless of corpus size), so
    it broadcasts as one compiled alternation regex inside the batch
    closure — a single vectorized ``str.contains`` pass per batch, no
    join, no shuffle. Output: (doc_id, contaminated ∈ {0,1})."""
    import pyarrow.compute as pc
    import ray.data as rd

    # the doc_id < max_id predicate is pushed into the parquet scan
    # (row-group pruning: at 100 TB only the leading shards are read);
    # the % every filter runs on the bounded remainder
    snip_ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              filter=pc.field("doc_id") < max_id)

    def to_snips(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[batch["doc_id"] % every == 0]
        snips = (sel["text"].fillna("").str.split(" ").str[:snip_words]
                 .str.join(" "))
        return pd.DataFrame({"snip": pd.Series(snips, dtype="object")})

    # bounded small side (≤ max_id/every rows): take_all is O(1), documented.
    # Empty/whitespace-only snippets are dropped — an empty alternation
    # branch matches EVERY document and would flag the whole corpus.
    snips = sorted({r["snip"] for r in
                    snip_ds.map_batches(to_snips, batch_format="pandas").take_all()
                    if r["snip"].strip()})
    pattern = "|".join(re.escape(s) for s in snips) if snips else None
    if pattern is not None:
        re.compile(pattern)  # fail fast driver-side on a bad pattern

    import pyarrow as pa
    import pyarrow.compute as pc

    def flag(t: pa.Table) -> pa.Table:
        # one RE2 alternation scan per batch in C++ (the pandas
        # str.contains path ran a Python re.search per row); snippets
        # are re.escape()d literals, identical under re and RE2
        texts = pc.fill_null(t["text"].combine_chunks(), "")
        hit = (pc.match_substring_regex(texts, pattern)
               if pattern is not None
               else pa.array([False] * t.num_rows, pa.bool_()))
        return pa.table({"doc_id": t["doc_id"],
                         "contaminated": hit.cast(pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        flag, batch_format="pyarrow")


# ------------------------------------------- Gopher-style repetition

def repetition_stats(sf_dir: str):
    """Repetition quality signals (the Gopher-rules shape): per doc,
    the total / top / excess word-bigram counts and the top-bigram
    fraction. A doc dominated by one repeated phrase scores a high
    ``top_bigram_frac`` and would be filtered upstream of training.

    Vectorized over Arrow dictionary CODES: ``split_pattern(text, " ")``
    (single-space split, exactly the oracle's string_split — empty
    tokens from doubled spaces count as words), ``dictionary_encode``
    the token stream once, shift-align codes into bigram ids, and every
    per-doc count is a factorize+bincount / maximum.at — no token ever
    becomes a Python object."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema([
        ("doc_id", pa.int64()), ("n_words", pa.int64()),
        ("n_bigrams", pa.int64()), ("top_bigram_n", pa.int64()),
        ("dup_bigram_excess", pa.int64()), ("top_bigram_frac", pa.float64())])

    def stats(t: pa.Table) -> pa.Table:
        D = t.num_rows
        if not D:
            return schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(
            pc.fill_null(t["text"].combine_chunks(), ""), " ")
        offs = lists.offsets.to_numpy().astype(np.int64)
        n_words = np.diff(offs)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(lists.values).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        V = max(int(codes.max()) + 1, 1) if len(codes) else 1
        m = (parent[1:] == parent[:-1]) if len(parent) else np.empty(0, bool)
        idx = np.flatnonzero(m)
        n_bigrams = np.zeros(D, dtype=np.int64)
        top_n = np.zeros(D, dtype=np.int64)
        n_distinct = np.zeros(D, dtype=np.int64)
        if len(idx):
            bgid, bgu = pd.factorize(codes[idx] * np.int64(V)
                                     + codes[idx + 1])
            comp = (parent[idx].astype(np.int64) * np.int64(len(bgu))
                    + bgid)
            grp, guniq = pd.factorize(comp)
            counts = np.bincount(grp).astype(np.int64)
            gparent = (np.asarray(guniq, dtype=np.int64)
                       // np.int64(len(bgu)))
            n_bigrams = np.bincount(gparent, weights=counts,
                                    minlength=D).astype(np.int64)
            n_distinct = np.bincount(gparent, minlength=D).astype(np.int64)
            np.maximum.at(top_n, gparent, counts)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bigrams": pa.array(n_bigrams, pa.int64()),
            "top_bigram_n": pa.array(top_n, pa.int64()),
            "dup_bigram_excess": pa.array(n_bigrams - n_distinct, pa.int64()),
            "top_bigram_frac": pa.array(
                np.round(top_n / np.maximum(n_bigrams, 1), 6), pa.float64()),
        }).cast(schema)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


# ----------------------------------------- model-scoring stage shape

CLF_DIM = 65536  # hashed feature space (md5-prefix % CLF_DIM)

# per-actor token→feature-index memo cap: web-scale vocabulary is
# unbounded, so a long-lived actor's cache must not grow forever. The
# factorize-per-batch already bounds per-call cost; past the cap the
# memo is simply cleared (correctness is unaffected — md5 recomputes).
CLF_CACHE_MAX = 262144


class BoWScorer:
    """The classifier_scores actor: deterministic hashed-BoW linear
    model, weights built ONCE per actor in ``__init__`` (the seam where
    a real .bin model load goes), scored vectorized per batch."""

    def __init__(self):
        i = np.arange(CLF_DIM, dtype=np.uint64)
        self.w = ((i * np.uint64(2654435761)) % np.uint64(2**32)) \
            .astype(np.float64) / 2.0**32 - 0.5
        self.idx_cache: dict[str, int] = {}

    def _idx(self, tok: str) -> int:
        import hashlib

        h = self.idx_cache.get(tok)
        if h is None:
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % CLF_DIM
            self.idx_cache[tok] = h
        return h

    def __call__(self, t):
        # Arrow tokenize + dictionary_encode (split() parity after
        # dropping boundary-empty tokens); md5 runs once per
        # batch-UNIQUE token through the capped per-actor memo
        import pyarrow as pa
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
        n_tok = np.bincount(parent, minlength=D).astype(np.int64)
        uidx = np.fromiter((self._idx(w) for w in vocab_py),
                           dtype=np.int64, count=len(vocab_py))
        if len(self.idx_cache) > CLF_CACHE_MAX:
            self.idx_cache.clear()
        tw = self.w[uidx[codes]] if len(codes) else np.empty(0)
        sums = np.bincount(parent, weights=tw, minlength=D)
        logit = sums / np.maximum(n_tok, 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "score": pa.array(np.round(1.0 / (1.0 + np.exp(-logit)), 6),
                              pa.float64()),
        })


def classifier_scores(sf_dir: str):
    """Quality-classifier scoring, the batched-model-inference shape:
    a hashed bag-of-words linear model (fasttext-style) scored over
    every document. The "model" is a deterministic weight vector
    ``w[i] = ((i * 2654435761) % 2^32) / 2^32 - 0.5`` over a
    ``CLF_DIM``-dim md5-hashed token space — loaded ONCE per actor in
    ``__init__``, scored vectorized per batch (see :class:`BoWScorer`).

    ``score = sigmoid(mean token weight)``, rounded to 6 dp. Every
    step is SQL-expressible → DuckDB oracle (md5-prefix hashing and
    the weight formula run verbatim in SQL).
    """
    # autoscaling pool (min 1 → a 4-CPU test session keeps CPUs free
    # for the upstream read; a fixed pool the size of the session
    # starves it) + coalesced batches: tiny parquet blocks would
    # otherwise become tiny batches (per-call overhead dominates); the
    # 512 KB weight vector lives once per actor, NOT once per batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        BoWScorer, batch_format="pyarrow", concurrency=(1, 8), batch_size=2048)


# ------------------------------------------- n-gram LM perplexity

LM_SMOOTH = 4096.0  # constant additive-smoothing denominator (fixed →
                    # the whole train+score is ONE pass, no global
                    # vocab-size scalar round-trip)


def lm_perplexity(sf_dir: str, n_buckets: int | None = None):
    """Corpus bigram-LM perplexity per document — the CCNet-shaped
    quality signal (docs unlike the corpus score high). The LM is
    trained ON the corpus and scored over it in one distributed
    pipeline:

    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + LM_SMOOTH)``,
    ``perplexity = exp(-mean ln P)`` over the doc's bigrams (docs with
    no bigram score 1.0).

    Scale shape: bigram instance rows pre-aggregate per batch, then
    co-partition by ``crc32(w1)`` — every instance of prefix ``w1``
    lands in ONE bucket, so the global counts c(w1,w2), c(w1) AND each
    doc's partial log-P sums all complete inside that bucket with no
    second count shuffle. A final skinny exchange by ``doc_id``
    combines partials (left-joined against the doc list so
    bigram-less docs surface). Nothing corpus-sized touches the
    driver. SQL-expressible → DuckDB oracle.
    """
    from zlib import crc32

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.exchange import bucket_exchange
    from ..stages.sizing import auto_buckets

    if n_buckets is None:
        n_buckets = auto_buckets(f"{sf_dir}/documents.parquet")

    row_schema = pa.schema([
        ("doc_id", pa.int64()),
        ("w1", pa.dictionary(pa.int32(), pa.string())),
        ("w2", pa.dictionary(pa.int32(), pa.string())),
        ("bucket", pa.int64())])

    def bigram_rows_t(t: pa.Table) -> pa.Table:
        """Pure-Arrow fused split-side map: tokenize with
        ``utf8_split_whitespace`` (C speed; parity with ``str.split()``
        needs only dropping the empty tokens Arrow keeps for
        leading/trailing whitespace — interior runs collapse, so ''
        never appears mid-list and dropping it can't create a false
        bigram), ``dictionary_encode`` the token stream once, and
        shift-align codes into (doc, w1, w2) instance rows. Words ship
        as dictionary arrays — int32 codes per row plus one
        block-vocab dictionary per bucket slice (Heaps' law: vocab ≪
        tokens) — and no token ever becomes a Python object. Instance
        rows (k≡1) beat per-(doc,bigram) pre-aggregation here: the
        groupby compressed ~1% and cost more than everything else in
        the task combined."""
        if t.num_rows == 0:
            return row_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.utf8_split_whitespace(
            pc.fill_null(t["text"].combine_chunks(), ""))
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        vocab_py = vocab.to_pylist()
        if "" in vocab_py:
            keep = codes != vocab_py.index("")
            codes, parent = codes[keep], parent[keep]
        idx = (np.flatnonzero(parent[1:] == parent[:-1])
               if len(parent) else np.empty(0, np.int64))
        if not len(idx):
            return row_schema.empty_table()
        c1, c2 = codes[idx], codes[idx + 1]
        vb = np.fromiter((crc32(w.encode()) % n_buckets for w in vocab_py),
                         dtype=np.int64, count=len(vocab_py))
        return pa.table({
            "doc_id": pa.array(ids[parent[idx]], pa.int64()),
            "w1": pa.DictionaryArray.from_arrays(
                pa.array(c1.astype(np.int32)), vocab),
            "w2": pa.DictionaryArray.from_arrays(
                pa.array(c2.astype(np.int32)), vocab),
            "bucket": pa.array(vb[c1], pa.int64())})

    part_schema = pa.schema([("doc_id", pa.int64()), ("s", pa.float64()),
                             ("n", pa.int64()), ("dbucket", pa.int64())])

    def score_bucket(_b: int, t) -> pa.Table:
        """Counts + per-doc partials over dictionary CODES — the
        bucket-local dictionaries unify in ``combine_chunks`` and every
        count is a factorize+bincount; no string touches pandas."""
        if t is None or t.num_rows == 0:
            return part_schema.empty_table()
        w1c = t["w1"].combine_chunks()
        w2c = t["w2"].combine_chunks()
        i1 = w1c.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        i2 = w2c.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # global counts are bucket-local (all of prefix w1 is here);
        # rows are bigram INSTANCES (k=1), so counts are row counts
        comp = i1 * np.int64(len(w2c.dictionary)) + i2
        grp, _ = pd.factorize(comp)
        c2n = np.bincount(grp).astype(np.float64)[grp]
        c1n = np.bincount(i1, minlength=len(w1c.dictionary)).astype(
            np.float64)[i1]
        logp = np.log((c2n + 1.0) / (c1n + LM_SMOOTH))
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dg, duniq = pd.factorize(doc)
        s = np.bincount(dg, weights=logp)
        n = np.bincount(dg).astype(np.int64)
        duniq = np.asarray(duniq, dtype=np.int64)
        return pa.table({"doc_id": pa.array(duniq, pa.int64()),
                         "s": pa.array(s, pa.float64()),
                         "n": pa.array(n, pa.int64()),
                         "dbucket": pa.array(duniq % n_buckets, pa.int64())
                         }).cast(part_schema)

    partials = bucket_exchange(
        [(_docs(sf_dir, ["doc_id", "text"]), "bucket")], n_buckets,
        score_bucket, schemas=[row_schema], map_fns=[bigram_rows_t])

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dbucket": pa.array(ids % n_buckets, pa.int64())})

    docs = _docs(sf_dir, ["doc_id"])

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                            ("perplexity", pa.float64())])

    def combine(_b: int, part_t, doc_t) -> pa.Table:
        if doc_t is None or doc_t.num_rows == 0:
            return out_schema.empty_table()
        docs_df = pd.DataFrame(
            {"doc_id": doc_t["doc_id"].to_numpy(zero_copy_only=False)})
        if part_t is not None and part_t.num_rows:
            p = (part_t.select(["doc_id", "s", "n"]).to_pandas()
                 .groupby("doc_id", sort=True).sum().reset_index())
        else:
            p = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype="float64"),
                              "n": pd.Series([], dtype="int64")})
        m = docs_df.merge(p, on="doc_id", how="left")
        n = m["n"].fillna(0).to_numpy(dtype=np.int64)
        s = m["s"].fillna(0.0).to_numpy(dtype=np.float64)
        ppl = np.where(n > 0, np.exp(-s / np.maximum(n, 1)), 1.0)
        return pa.table({"doc_id": pa.array(m["doc_id"].to_numpy(np.int64)),
                         "n_bigrams": pa.array(n, pa.int64()),
                         "perplexity": pa.array(np.round(ppl, 6), pa.float64())})

    doc_schema = pa.schema([("doc_id", pa.int64()), ("dbucket", pa.int64())])
    return bucket_exchange([(partials, "dbucket"), (docs, "dbucket")],
                           n_buckets, combine,
                           schemas=[part_schema, doc_schema],
                           map_fns=[None, doc_rows])
