"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``large_binary`` columns with a ``kind``
tag. Decode / resize / frame-sample are actor-pool ``map_batches``
stages whose Ray-side plumbing (schema, batch sizing for big rows,
actor ``__init__`` loading a "model", output layout) is real and
tested; the actual codec work is STUBBED — the container ships no
image/audio libraries — behind either

- ``decoder="strict"`` → raises ``NotImplementedError`` (documents the
  integration point for pillow/ffmpeg/torchaudio), or
- ``decoder="fake"`` (default in tests) → a deterministic stand-in
  that derives fixed-size "features" from the payload bytes, so the
  distributed plumbing is exercised end-to-end with stable outputs.

Batch sizing note: binary payloads make rows wide — stages here use
small ``batch_size`` so batch × concurrency stays within worker heap
(see the memory-aware sizing rule in the repo docs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "make_media_table", "DecodeStage", "decode_media", "media_features", "media_near_dup"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def make_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media rows (payloads are opaque bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [bytes(rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8)) for _ in range(n)],
        "width": [int(rng.integers(16, 512)) for _ in range(n)],
        "height": [int(rng.integers(16, 512)) for _ in range(n)],
        "duration_ms": [int(rng.integers(0, 60_000)) for _ in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStage:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real implementation loads its codec/model
    ONCE per actor; ``__call__`` decodes a batch and emits a
    fixed-size feature vector per row.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake", target_size: tuple[int, int] = (32, 32),
                 frames: int = 4):
        if decoder not in ("fake", "strict"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.target_size = target_size
        self.frames = frames

    # -- the stubbed codec boundary -----------------------------------

    def _decode(self, kind: str, payload: bytes) -> np.ndarray:
        if self.decoder == "strict":
            raise NotImplementedError(
                "media decoding requires pillow/ffmpeg, not present in this "
                "environment; integrate here (DecodeStage._decode)"
            )
        # deterministic fake: digest-seeded pseudo pixels/samples
        digest = hashlib.blake2b(payload, digest_size=32, person=kind[:8].encode()).digest()
        base = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
        reps = self.FEATURE_DIM * 4 // len(base) + 1
        return np.tile(base, reps)

    def _features(self, raw: np.ndarray) -> np.ndarray:
        # "resize / frame-sample": bucket-average down to FEATURE_DIM
        usable = raw[: (len(raw) // self.FEATURE_DIM) * self.FEATURE_DIM]
        return usable.reshape(self.FEATURE_DIM, -1).mean(axis=1).round(4)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        ok = []
        for kind, payload in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist()):
            try:
                feats.append(self._features(self._decode(kind, payload or b"")).tolist())
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append([0.0] * self.FEATURE_DIM)
                ok.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "decode_ok": pa.array(ok, pa.bool_()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def decode_media(media_ds, decoder: str = "fake", concurrency: int = 2, batch_size: int = 16,
                 stage_cls: type = DecodeStage):
    """media Dataset → (media_id, kind, decode_ok, features).

    Actor pool + small batches: the binary column dominates block
    size, so batches stay small while the pool provides parallelism.

    ``stage_cls`` is the codec integration seam: a real deployment
    subclasses :class:`DecodeStage` overriding ``_decode`` (pillow /
    ffmpeg / torchaudio) and passes it here — no pipeline code changes
    (pinned by ``test_decode_stage_real_decoder_drop_in``).
    """
    return media_ds.map_batches(
        stage_cls,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_features(sf_dir: str, n: int = 64):
    """queries() entry point: synthesize the media table (derived from
    nothing in sf_dir — media is generator-owned) and run the decode
    pipeline with the deterministic fake decoder."""
    import ray.data as rd

    ds = rd.from_arrow(make_media_table(n))
    out = decode_media(ds).to_pandas()
    out["feat_mean"] = out["features"].map(lambda f: round(float(np.mean(f)), 4))
    return rd.from_pandas(out[["media_id", "kind", "decode_ok", "feat_mean"]])


def media_near_dup(sf_dir: str, n: int = 64, threshold: float = 0.99):
    """Near-duplicate media by feature cosine: the decode stage's
    feature vectors feed the SAME IVF-cell-blocked near-dup path as
    text embeddings (``dedup.embedding_cosine_pairs_blocked``) — the
    multimodal pipeline composes with the dedup suite instead of
    reimplementing it. Returns (a, b, cosine) media-id pairs."""
    import hashlib as _hl
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from .dedup import embedding_cosine_pairs_blocked

    # materialize features as an embeddings-shaped table (vec_id,
    # embedding) — the dedup path reads parquet like any other table
    tag = _hl.sha256(f"{sf_dir}|{n}|v1".encode()).hexdigest()[:12]
    feat_dir = f"/tmp/walk_ray_media/feat_{tag}"
    marker = os.path.join(feat_dir, "embeddings.parquet")
    if not os.path.exists(marker):
        os.makedirs(feat_dir, exist_ok=True)
        feats = decode_media(rd.from_arrow(make_media_table(n))).to_pandas()
        t = pa.table(
            {
                "vec_id": pa.array(feats["media_id"].astype("int64"), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, f)) for f in feats["features"]],
                    pa.list_(pa.float64()),
                ),
            }
        )
        pq.write_table(t, marker)
    return embedding_cosine_pairs_blocked(feat_dir, threshold=threshold,
                                          nlist=4, nassign=2, sample=n)
