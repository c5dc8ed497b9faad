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

import re

import pandas as pd

__all__ = [
    "token_stats",
    "quality_scores",
    "lang_id",
    "text_fingerprint",
    "winnow_doc",
    "winnow_fingerprints",
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


def token_stats(sf_dir: str):
    """Per-doc token counts: whitespace tokens and a BPE-ish regex
    tokenization (word pieces + single punctuation marks)."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        # vectorized: a whitespace token is a maximal \S+ run, so the
        # count equals len(strip().split()); both counts are C-speed
        # regex scans, no per-row Python loop
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": texts.str.count(r"\S+").astype("int64"),
                "n_bpe_tokens": texts.str.count(_BPE_ISH).astype("int64"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pandas")


def quality_scores(sf_dir: str):
    """Quality heuristics: length, word count, mean word length,
    stopword ratio, and a clamped linear score
    ``least(1, n_words/100) * (1 - stop_ratio)`` rounded to 6 dp."""

    class Scorer:
        def __init__(self):
            # a stopword is a whole whitespace token equal to one of
            # STOPWORDS: anchor on start-or-whitespace (consumed) and
            # whitespace-or-end (lookahead, so adjacent stopwords
            # separated by one space still both match)
            self.stop_re = re.compile(
                r"(?:^|\s)(?:" + "|".join(re.escape(w) for w in STOPWORDS) + r")(?=\s|$)"
            )

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch["text"].fillna("")
            # all counts are vectorized regex scans: n_words = maximal
            # \S+ runs (== len(split())), total word length = count of
            # non-whitespace chars (split() drops exactly whitespace)
            n_words = texts.str.count(r"\S+").astype("int64")
            n_stop = texts.str.count(self.stop_re).astype("int64")
            total_wlen = texts.str.count(r"\S").astype("int64")
            stop_ratio = (n_stop / n_words.clip(lower=1)).round(6)
            score = ((n_words / 100).clip(upper=1.0) * (1 - stop_ratio)).round(6)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_chars": texts.str.len().astype("int64"),
                    "n_words": n_words,
                    "n_stopwords": n_stop,
                    "mean_word_len": (total_wlen / n_words.clip(lower=1)).round(6),
                    "stop_ratio": stop_ratio,
                    "quality": score,
                }
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(Scorer(), batch_format="pandas")


def lang_id(sf_dir: str):
    """Marker-word language ID: count marker hits per language, predict
    the argmax (priority order breaks ties), default ``en``."""

    class LangId:
        def __init__(self):
            # one compiled whole-token regex per language (same
            # anchoring as quality_scores' stopword counter)
            self.markers = [
                (lang,
                 re.compile(r"(?:^|\s)(?:" + "|".join(re.escape(m) for m in ms)
                            + r")(?=\s|$)"))
                for lang, ms in LANG_MARKERS
            ]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch["text"].fillna("")
            # counts per language are vectorized regex scans; the
            # prediction is the first language (priority order) with
            # the max count — idxmax over priority-ordered columns
            counts = pd.DataFrame(
                {lang: texts.str.count(rx) for lang, rx in self.markers}
            )
            return pd.DataFrame(
                {"doc_id": batch["doc_id"], "pred_lang": counts.idxmax(axis=1).values}
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(LangId(), batch_format="pandas")


def text_fingerprint(sf_dir: str):
    """Content fingerprint: md5 of the exact text bytes (D4-style
    content addressing re-used for documents)."""
    import hashlib

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fp_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].fillna("")
                ],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pandas")


def winnow_doc(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD'03) over word k-gram hashes: from every window of
    ``window`` consecutive k-gram hashes keep the minimum (rightmost
    minimum on ties — the standard robust-winnowing rule), dedup
    consecutive selections. Deterministic; numpy-vectorized.
    """
    import hashlib

    import numpy as np

    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return []
    h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big") >> 1
         for g in grams),
        dtype=np.uint64, count=len(grams),
    )
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


def winnow_fingerprints(sf_dir: str, k: int = 5, window: int = 4):
    """Per-doc winnowing summary: (doc_id, n_fingerprints, fp_min,
    fp_xor) — the rolling-hash document-fingerprinting stage of a
    training-data pipeline. Rows-only driver check (the selection rule
    is not SQL-expressible); pinned by a pure-python reference in
    pytest."""

    class Winnow:
        def __init__(self):
            self.k = k
            self.window = window

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            n_fp, fp_min, fp_xor = [], [], []
            for t in batch["text"].fillna(""):
                fps = winnow_doc(t, self.k, self.window)
                n_fp.append(len(fps))
                fp_min.append(min(fps) if fps else 0)
                x = 0
                for v in fps:
                    x ^= v
                fp_xor.append(x)
            out = pd.DataFrame({"doc_id": batch["doc_id"]})
            out["n_fingerprints"] = pd.Series(n_fp, dtype="int64").values
            out["fp_min"] = pd.Series(fp_min, dtype="uint64").values
            out["fp_xor"] = pd.Series(fp_xor, dtype="uint64").values
            return out

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(Winnow(), batch_format="pandas")
