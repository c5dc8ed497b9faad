"""Behavioral tests for the training-data operators (dedup /
similarity / multimodal) and remaining crawl semantics (politeness via
robots, StopURL, as-of lookup with a cut-off timestamp)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_minhash_estimates_jaccard():
    # estimated jaccard from signatures tracks exact unigram jaccard
    from walk_ray.pipelines.dedup import MinHasher, _word_ngrams

    mh = MinHasher(num_perm=256, ngram=1)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox leaps over the lazy cat " * 5
    sa, sb = mh.signature(a), mh.signature(b)
    est = float((sa == sb).mean())
    ga, gb = set(_word_ngrams(a.split(), 1)), set(_word_ngrams(b.split(), 1))
    true = len(ga & gb) / len(ga | gb)
    assert abs(est - true) < 0.15
    # identical docs -> identical signatures
    assert (mh.signature(a) == mh.signature(a)).all()


@pytest.mark.usefixtures("ray_session")
def test_simhash_properties():
    from walk_ray.pipelines.dedup import SimHasher

    h1 = SimHasher.simhash("alpha beta gamma delta epsilon zeta")
    h2 = SimHasher.simhash("alpha beta gamma delta epsilon eta")
    h3 = SimHasher.simhash("totally different words entirely here now")
    near = bin(h1 ^ h2).count("1")
    far = bin(h1 ^ h3).count("1")
    assert near < far
    assert SimHasher.simhash("") == 0


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_brute():
    from walk_ray.pipelines.similarity import ann_brute_topk, ann_ivf_topk

    brute = ann_brute_topk(SF, list(range(5)), 10).to_pandas()
    ivf = ann_ivf_topk(SF, list(range(5)), 10, nlist=8, nprobe=4).to_pandas()
    recalls = []
    for q in range(5):
        b = set(brute[brute.query_id == q]["neighbor_id"])
        v = set(ivf[ivf.query_id == q]["neighbor_id"])
        recalls.append(len(b & v) / len(b))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 lists scanned


@pytest.mark.usefixtures("ray_session")
def test_multimodal_plumbing():
    import ray.data as rd

    from walk_ray.pipelines.multimodal import DecodeStage, decode_media, make_media_table

    t = make_media_table(32, seed=5)
    out = decode_media(rd.from_arrow(t)).to_pandas()
    assert len(out) == 32
    assert out["decode_ok"].all()
    assert out["features"].map(len).eq(DecodeStage.FEATURE_DIM).all()
    # deterministic across runs
    out2 = decode_media(rd.from_arrow(make_media_table(32, seed=5))).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True),
    )
    # strict mode documents the codec integration point
    with pytest.raises(NotImplementedError):
        DecodeStage(decoder="strict")(t.slice(0, 2))


def test_codec_roundtrips_byte_exact():
    """The pure-numpy PPM / WAV / Y4M codecs: encode → parse recovers
    the source arrays exactly, and parse → re-encode reproduces the
    original bytes (so the decode stage decodes REAL formats, not a
    private serialization)."""
    import numpy as np

    from walk_ray.pipelines.multimodal import (
        encode_ppm, parse_ppm, encode_wav, parse_wav, encode_y4m, parse_y4m)

    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    data = encode_ppm(pix)
    assert np.array_equal(parse_ppm(data), pix)
    assert encode_ppm(parse_ppm(data)) == data
    # the PPM comment/whitespace grammar is honored
    commented = b"P6\n# a comment\n 18\t24 # another\n255\n" + pix.tobytes()
    assert np.array_equal(parse_ppm(commented), pix)

    samples = rng.integers(-(1 << 15), 1 << 15, 777).astype(np.int16)
    wav = encode_wav(samples, rate=8_000)
    got, rate, channels = parse_wav(wav)
    assert np.array_equal(got, samples) and rate == 8_000 and channels == 1
    assert encode_wav(got, rate) == wav

    y = rng.integers(0, 256, (5, 16, 20), dtype=np.uint8)
    u = rng.integers(0, 256, (5, 8, 10), dtype=np.uint8)
    v = rng.integers(0, 256, (5, 8, 10), dtype=np.uint8)
    y4m = encode_y4m(y, u, v, fps=30)
    gy, gu, gv, fps = parse_y4m(y4m)
    assert np.array_equal(gy, y) and np.array_equal(gu, u) and np.array_equal(gv, v)
    assert fps == 30
    assert encode_y4m(gy, gu, gv, fps) == y4m


@pytest.mark.usefixtures("ray_session")
def test_real_decoder_end_to_end():
    """decoder="real" over genuinely encoded payloads: every row
    decodes, features are bucket means of the true pixels/samples
    (spot-checked against a local decode), and a corrupt payload
    degrades to decode_ok=False instead of failing the stage."""
    import numpy as np
    import ray.data as rd

    from walk_ray.pipelines.multimodal import (
        DecodeStage, decode_media, make_media_table, parse_ppm)

    t = make_media_table(24, seed=7, encoding="real")
    out = decode_media(rd.from_arrow(t), decoder="real").to_pandas()
    assert len(out) == 24 and out["decode_ok"].all()
    assert out["features"].map(len).eq(DecodeStage.FEATURE_DIM).all()

    # spot-check one image row against a driver-side decode
    img_row = min(i for i, k in enumerate(t["kind"].to_pylist()) if k == "image")
    pix = parse_ppm(t["payload"][img_row].as_py()).astype(np.float64).ravel()
    usable = pix[: len(pix) // 16 * 16]
    want = usable.reshape(16, -1).mean(axis=1).round(4)
    got = out.set_index("media_id").loc[t["media_id"][img_row].as_py(), "features"]
    assert np.allclose(got, want)

    # metadata columns describe the encoded content
    hdr = parse_ppm(t["payload"][img_row].as_py())
    assert hdr.shape[0] == t["height"][img_row].as_py()
    assert hdr.shape[1] == t["width"][img_row].as_py()

    # corrupt payload → decode_ok False, stage survives
    bad = t.slice(img_row, 1).set_column(
        t.schema.get_field_index("payload"),
        "payload",
        __import__("pyarrow").array([b"not a ppm"], __import__("pyarrow").large_binary()),
    )
    res = DecodeStage(decoder="real")(bad)
    assert res["decode_ok"].to_pylist() == [False]


@pytest.mark.usefixtures("ray_session")
def test_latest_capture_with_cutoff(qri_crawl):
    from walk_ray.pipelines.query import latest_capture

    full = pq.read_table(qri_crawl["resources_dir"], columns=["url", "timestamp"]).to_pandas()
    cut = full["timestamp"].quantile(0.5)
    res = latest_capture(qri_crawl["resources_dir"], at=cut).to_pandas()
    assert (res["timestamp"] <= cut).all()
    # every url with any capture <= cut appears exactly once
    expect = full[full["timestamp"] <= cut]["url"].nunique()
    assert len(res) == expect and res["url"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_polite_crawl_respects_robots(tmp_path):
    from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
    from walk_ray.sources.testgen import generate_pages

    gen = generate_pages("qri_io_shaped", str(tmp_path / "gen"), seed=42)

    def run(polite):
        cfg = CrawlConfig.from_job_json(
            gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2, polite=polite
        )
        job = CrawlJob(cfg, gen["pages"], gen["pages_meta"],
                       str(tmp_path / f"run_{polite}"))
        res = job.run()
        t = pq.read_table(res["url_seen_path"])
        return set(t["url"].to_pylist())

    rude = run(False)
    polite = run(True)
    assert any("/company/" in u for u in rude)
    assert not any("/company/" in u for u in polite)
    # robots only removes disallowed paths
    assert polite <= rude


@pytest.mark.usefixtures("ray_session")
def test_stop_url(tmp_path):
    from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
    from walk_ray.sources.testgen import generate_pages

    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    cfg = CrawlConfig.from_job_json(
        {**gen["job"], "stop_url": "http://self.test"},
        n_frontier_shards=2, n_seen_shards=2, n_page_parts=2,
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp_path / "run"))
    res = job.run()
    # stopping at the seed means a/b/c never get fetched
    assert res["done_total"] == 1


@pytest.mark.usefixtures("ray_session")
def test_media_near_dup_composes_with_embedding_dedup():
    """Multimodal features flow through the IVF-blocked near-dup path;
    blocked pairs must be a subset of exact feature cosines with
    exactly-computed values."""
    import numpy as np

    from walk_ray.pipelines import multimodal

    pairs = multimodal.media_near_dup("/root/testdata/sf0.001", threshold=0.99).to_pandas()
    assert len(pairs) > 0
    feats = multimodal.decode_media(
        __import__("ray").data.from_arrow(multimodal.make_media_table(64))
    ).to_pandas()
    mat = np.asarray(feats["features"].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = feats["media_id"].to_numpy()
    pos = {int(v): i for i, v in enumerate(ids)}
    for a, b, c in zip(pairs["a"], pairs["b"], pairs["cosine"]):
        true_c = float(mat[pos[int(a)]] @ mat[pos[int(b)]])
        assert abs(true_c - c) < 1e-6
        assert true_c >= 0.99


@pytest.mark.usefixtures("ray_session")
def test_decode_stage_real_decoder_drop_in():
    """The stub codec's integration seam: a real-shaped decoder drops
    in as a DecodeStage subclass via decode_media(stage_cls=...) with
    no pipeline-code changes. The replacement returns raw 'pixel'
    arrays like pillow/ffmpeg would; the stage contract (FEATURE_DIM
    output, decode_ok surface on per-row decoder failure) holds
    unchanged through the actor pool."""
    import numpy as np

    from walk_ray.pipelines.multimodal import DecodeStage, decode_media, make_media_table

    class RealShapedDecoder(DecodeStage):
        # defined locally so cloudpickle ships it by value to the
        # actor-pool workers, exactly like a user plugin would ride
        def _decode(self, kind, payload):
            if len(payload) < 800:
                raise ValueError("corrupt file")  # decoder error surface
            # a "real" decoder yields pixels/samples proportional to
            # the payload, not a digest
            return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)

    import ray.data as rd

    out = decode_media(rd.from_arrow(make_media_table(48, seed=9)),
                       stage_cls=RealShapedDecoder).to_pandas()
    assert len(out) == 48
    # every row produced a FEATURE_DIM-length vector
    assert {len(f) for f in out["features"]} == {DecodeStage.FEATURE_DIM}
    # the error surface: short payloads decode_ok=False with zero
    # features, everything else ok
    bad = out[~out["decode_ok"]]
    assert len(bad) >= 1  # the generator makes some payloads < 800B
    assert all(list(f) == [0.0] * DecodeStage.FEATURE_DIM for f in bad["features"])
    assert out["decode_ok"].sum() == 48 - len(bad)


@pytest.mark.usefixtures("ray_session")
def test_dedup_keep_best_picks_highest_quality_copy():
    """The kept doc per cluster is the max-quality copy (tie -> min
    doc_id), verified against a pandas recomputation, and the result
    is batch-size independent (partial argmax is associative)."""
    from walk_ray.pipelines.dedup import dedup_keep_best
    from walk_ray.pipelines.text import quality_of

    import hashlib

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = dedup_keep_best(sf).to_pandas().sort_values("text_hash").reset_index(drop=True)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs["text_hash"] = [hashlib.md5((t or "").encode()).hexdigest() for t in docs["text"]]
    docs["quality"] = quality_of(docs["text"].fillna(""))
    want = (docs.sort_values(["text_hash", "quality", "doc_id"],
                             ascending=[True, False, True], kind="mergesort")
            .drop_duplicates("text_hash"))
    want = want.merge(docs.groupby("text_hash").size().rename("n_copies"),
                      on="text_hash")
    want = want[["text_hash", "doc_id", "quality", "n_copies"]] \
        .sort_values("text_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["text_hash", "doc_id", "quality", "n_copies"]],
        want.astype({"n_copies": "int64"}))
    # bucket count is a physical knob, not a semantic one
    out2 = dedup_keep_best(sf, n_buckets=7).to_pandas() \
        .sort_values("text_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
