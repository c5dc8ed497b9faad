"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``large_binary`` columns with a ``kind``
tag. Decode / resize / frame-sample are actor-pool ``map_batches``
stages whose Ray-side plumbing (schema, batch sizing for big rows,
actor ``__init__`` loading a "model", output layout) is real and
tested. Three codec modes:

- ``decoder="real"`` — pure-numpy parsers for three genuinely trivial
  public formats (no external libs): PPM ``P6`` images, RIFF/WAVE
  PCM16 audio, and YUV4MPEG2 (``.y4m``) C420 video. Payloads are
  real encoded bytes; features come from real pixels/samples/frames.
- ``decoder="fake"`` — a deterministic digest-seeded stand-in (used
  where well-spread pseudo-random features matter, e.g. near-dup).
- ``decoder="strict"`` — raises ``NotImplementedError``: the
  integration seam for pillow/ffmpeg/torchaudio codecs this container
  doesn't ship (drop-in contract pinned by
  ``test_decode_stage_real_decoder_drop_in``).

Batch sizing note: binary payloads make rows wide — stages here use
small ``batch_size`` so batch × concurrency stays within worker heap
(see the memory-aware sizing rule in the repo docs).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA", "make_media_table", "DecodeStage", "decode_media",
    "media_features", "media_near_dup",
    "encode_ppm", "parse_ppm", "encode_wav", "parse_wav",
    "encode_y4m", "parse_y4m",
]

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


# --- pure-numpy codecs for three trivially-parseable public formats ----
#
# These are REAL formats (netpbm PPM, RIFF/WAVE, YUV4MPEG2), chosen
# because their specs are simple enough to implement byte-exactly with
# numpy alone — which makes the decode stage genuinely decode instead
# of hashing, while the strict-mode seam still documents where heavier
# codecs (JPEG/MP3/H.264) would plug in.

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM ``P6`` bytes (maxval 255)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("PPM P6 wants (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def parse_ppm(data: bytes) -> np.ndarray:
    """Binary PPM ``P6`` → (h, w, 3) uint8. Handles the format's
    whitespace/comment grammar (``#`` to end of line between header
    tokens); 1-byte samples only (maxval < 256)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        toks.append(int(data[i:j]))
        i = j
    w, h, maxval = toks
    if maxval >= 256:
        raise ValueError("2-byte PPM samples not supported")
    i += 1  # exactly one whitespace byte after maxval
    pix = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16_000, channels: int = 1) -> bytes:
    """int16 PCM samples (interleaved if multichannel) → RIFF/WAVE."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE PCM16 → (samples int16, rate, channels). Walks the
    chunk list (chunks are word-aligned; unknown ones are skipped)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, rate, channels, samples = 12, None, None, None
    while i + 8 <= len(data):
        cid, size = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if tag != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (tag={tag}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt /data chunk")
    return samples, rate, channels


def encode_y4m(y: np.ndarray, u: np.ndarray, v: np.ndarray, fps: int = 25) -> bytes:
    """YUV4MPEG2 C420: y (n, h, w) uint8, u/v (n, h/2, w/2) uint8."""
    n, h, w = y.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420jpeg\n" % (w, h, fps)]
    for k in range(n):
        out.append(b"FRAME\n")
        out.append(y[k].tobytes())
        out.append(u[k].tobytes())
        out.append(v[k].tobytes())
    return b"".join(out)


def parse_y4m(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """YUV4MPEG2 C420 → (y (n,h,w), u, v, fps)."""
    nl = data.index(b"\n")
    fields = data[:nl].split(b" ")
    if fields[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    for f in fields[1:]:
        if f[:1] == b"W":
            w = int(f[1:])
        elif f[:1] == b"H":
            h = int(f[1:])
        elif f[:1] == b"F":
            num, den = f[1:].split(b":")
            fps = int(num) // int(den)
        elif f[:1] == b"C" and not f[1:].startswith(b"420"):
            raise ValueError(f"only C420 supported, got {f!r}")
    if w is None or h is None:
        raise ValueError("missing W/H header fields")
    ysz, csz = w * h, (w // 2) * (h // 2)
    i, ys, us, vs = nl + 1, [], [], []
    while i < len(data):
        fl = data.index(b"\n", i)
        if data[i : i + 5] != b"FRAME":
            raise ValueError("bad frame marker")
        i = fl + 1
        buf = np.frombuffer(data, dtype=np.uint8, count=ysz + 2 * csz, offset=i)
        ys.append(buf[:ysz].reshape(h, w))
        us.append(buf[ysz : ysz + csz].reshape(h // 2, w // 2))
        vs.append(buf[ysz + csz :].reshape(h // 2, w // 2))
        i += ysz + 2 * csz
    return np.stack(ys), np.stack(us), np.stack(vs), fps


def make_media_table(n: int = 64, seed: int = 5, encoding: str = "opaque") -> pa.Table:
    """Deterministic synthetic media rows.

    ``encoding="opaque"`` — payloads are raw pseudo-random bytes (the
    original plumbing fixture, decodable only by the fake decoder).
    ``encoding="real"`` — payloads are genuinely encoded PPM / WAV /
    Y4M bytes whose metadata columns (width/height/duration) describe
    the actual encoded content.
    """
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    if encoding == "opaque":
        rows = {
            "media_id": list(range(n)),
            "kind": [kinds[i % 3] for i in range(n)],
            "payload": [bytes(rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8)) for _ in range(n)],
            "width": [int(rng.integers(16, 512)) for _ in range(n)],
            "height": [int(rng.integers(16, 512)) for _ in range(n)],
            "duration_ms": [int(rng.integers(0, 60_000)) for _ in range(n)],
        }
        return pa.table(rows, schema=MEDIA_SCHEMA)
    if encoding != "real":
        raise ValueError(encoding)
    rows = {k: [] for k in ("media_id", "kind", "payload", "width", "height", "duration_ms")}
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        if kind == "image":
            w, h = int(rng.integers(8, 33)) * 2, int(rng.integers(8, 33)) * 2
            pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows["payload"].append(encode_ppm(pix))
            rows["width"].append(w); rows["height"].append(h)
            rows["duration_ms"].append(0)
        elif kind == "audio":
            rate, nsamp = 16_000, int(rng.integers(400, 4000))
            samples = rng.integers(-(1 << 15), 1 << 15, nsamp).astype(np.int16)
            rows["payload"].append(encode_wav(samples, rate))
            rows["width"].append(0); rows["height"].append(0)
            rows["duration_ms"].append(nsamp * 1000 // rate)
        else:
            w, h, f, fps = 16, 16, int(rng.integers(3, 9)), 25
            y = rng.integers(0, 256, (f, h, w), dtype=np.uint8)
            u = rng.integers(0, 256, (f, h // 2, w // 2), dtype=np.uint8)
            v = rng.integers(0, 256, (f, h // 2, w // 2), dtype=np.uint8)
            rows["payload"].append(encode_y4m(y, u, v, fps))
            rows["width"].append(w); rows["height"].append(h)
            rows["duration_ms"].append(f * 1000 // fps)
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
        if decoder not in ("real", "fake", "strict"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.target_size = target_size
        self.frames = frames

    # -- the codec boundary --------------------------------------------

    def _decode(self, kind: str, payload: bytes) -> np.ndarray:
        if self.decoder == "strict":
            raise NotImplementedError(
                "this payload needs a heavyweight codec (pillow/ffmpeg), "
                "not present in this environment; integrate here "
                "(DecodeStage._decode)"
            )
        if self.decoder == "real":
            if kind == "image":
                return parse_ppm(payload).astype(np.float64).ravel()
            if kind == "audio":
                return parse_wav(payload)[0].astype(np.float64)
            if kind == "video":
                # frame-sample: self.frames evenly spaced luma planes
                y, _u, _v, _fps = parse_y4m(payload)
                idx = np.linspace(0, len(y) - 1, min(self.frames, len(y)))
                return y[idx.round().astype(int)].astype(np.float64).ravel()
            raise ValueError(f"unknown media kind {kind!r}")
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


def media_features(sf_dir: str, n: int = 64, decoder: str = "real"):
    """queries() entry point: synthesize the media table (derived from
    nothing in sf_dir — media is generator-owned) and run the decode
    pipeline. Default mode is the REAL decoder over genuinely encoded
    PPM/WAV/Y4M payloads — features are bucket means of actual
    pixels/samples/frames, not digest noise."""
    import ray.data as rd

    encoding = "real" if decoder == "real" else "opaque"
    ds = rd.from_arrow(make_media_table(n, encoding=encoding))

    def add_mean(t: pa.Table) -> pa.Table:
        # vectorized list-mean: flatten once, segment-sum by offsets —
        # stays a Dataset end to end (no driver to_pandas / per-row map)
        import pyarrow.compute as pc

        col = t["features"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else np.empty(0, np.int64)
        sums = np.add.reduceat(flat, starts) if flat.size else np.zeros(len(lens))
        sums = np.where(lens > 0, sums, 0.0)
        mean = np.round(sums / np.maximum(lens, 1), 4)
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "decode_ok": t["decode_ok"],
            "feat_mean": pa.array(mean, pa.float64()),
        })

    return decode_media(ds, decoder=decoder).map_batches(
        add_mean, batch_format="pyarrow")


def media_near_dup(sf_dir: str, n: int = 64, threshold: float = 0.99):
    """Near-duplicate media by feature cosine: the decode stage's
    feature vectors feed the SAME IVF-cell-blocked near-dup path as
    text embeddings (``dedup.embedding_cosine_pairs_blocked``) — the
    multimodal pipeline composes with the dedup suite instead of
    reimplementing it. Returns (a, b, cosine) media-id pairs.

    Uses the FAKE decoder deliberately: digest features are uniform on
    the hypercube (well-spread cosines), whereas bucket means of
    uniform random pixels all sit near the all-127.5 ray and a 0.99
    threshold would pair everything."""
    import hashlib as _hl
    import os

    import ray.data as rd

    from .dedup import embedding_cosine_pairs_blocked

    # materialize features as an embeddings-shaped table (vec_id,
    # embedding) — the dedup path reads parquet like any other table
    tag = _hl.sha256(f"{sf_dir}|{n}|v2".encode()).hexdigest()[:12]
    feat_dir = f"/tmp/walk_ray_media/feat_{tag}"
    # embeddings.parquet is a DIRECTORY of parquet shards (read_parquet
    # handles both layouts) — written by the Dataset itself, no driver
    # materialization; rename-in makes the existence check atomic
    marker = os.path.join(feat_dir, "embeddings.parquet")
    if not os.path.exists(marker):
        os.makedirs(feat_dir, exist_ok=True)

        def to_emb(t: pa.Table) -> pa.Table:
            return pa.table({"vec_id": t["media_id"],
                             "embedding": t["features"]})

        tmp = marker + f".tmp{os.getpid()}"
        (decode_media(rd.from_arrow(make_media_table(n)))
         .map_batches(to_emb, batch_format="pyarrow")
         .write_parquet(tmp))
        try:
            os.rename(tmp, marker)
        except OSError:  # lost a concurrent race: another writer won
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    return embedding_cosine_pairs_blocked(feat_dir, threshold=threshold,
                                          nlist=4, nassign=2, sample=n)
