"""write_partitioned: the resumable partitioned-parquet sink.

Pins the output contract a 100-TB job relies on: Hive-style one
directory per key value, per-partition _SUCCESS markers written after
the data, resume=True skipping finished partitions and rewriting torn
ones, and the read-back roundtrip through plain read_parquet (markers
and the _manifest dir invisible to readers)."""

import os

import numpy as np
import pandas as pd
import pytest

from walk_ray.stages.sink import write_partitioned

SF = "/root/testdata/sf0.001"


def _mk_ds(n_rows=2000, n_blocks=7, seed=11):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.arange(n_rows, dtype=np.int64),
        "grp": rng.choice(["en", "zh", "es", "fr", "de"], n_rows),
        "val": rng.integers(0, 1000, n_rows),
    })
    return rd.from_pandas(df).repartition(n_blocks), df


def _read_back(out_dir):
    import ray.data as rd

    return (rd.read_parquet(out_dir)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_and_markers(tmp_path):
    ds, df = _mk_ds()
    out = str(tmp_path / "out")
    summary = write_partitioned(ds, out, by="grp", n_buckets=8)

    assert summary["partitions_written"] == 5
    assert summary["partitions_skipped"] == 0
    assert summary["rows_written"] == len(df)
    for g in ["en", "zh", "es", "fr", "de"]:
        pdir = os.path.join(out, f"grp={g}")
        assert os.path.exists(os.path.join(pdir, "_SUCCESS"))
        assert any(f.endswith(".parquet") for f in os.listdir(pdir))
    # markers/_manifest invisible to a plain partitioned read; grp
    # column comes back from the directory names
    back = _read_back(out)
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == want["doc_id"].tolist()
    assert back["val"].tolist() == want["val"].tolist()
    assert back["grp"].tolist() == want["grp"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_done_and_rewrites_torn(tmp_path):
    ds, df = _mk_ds()
    out = str(tmp_path / "out")
    write_partitioned(ds, out, by="grp", n_buckets=8)

    # all partitions finished: a resumed run writes nothing
    s2 = write_partitioned(ds, out, by="grp", n_buckets=8, resume=True)
    assert s2["partitions_written"] == 0
    assert s2["partitions_skipped"] == 5
    assert s2["rows_skipped"] == len(df)

    # tear one partition (marker gone, stale partial data left behind):
    # resume rewrites exactly that one, and the roundtrip is whole again
    pdir = os.path.join(out, "grp=zh")
    os.unlink(os.path.join(pdir, "_SUCCESS"))
    data_files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    with open(os.path.join(pdir, data_files[0]), "w") as f:
        f.write("torn")
    s3 = write_partitioned(ds, out, by="grp", n_buckets=8, resume=True)
    assert s3["partitions_written"] == 1
    assert s3["partitions_skipped"] == 4
    back = _read_back(out)
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert back["val"].tolist() == want["val"].tolist()

    # without resume, everything is rewritten
    s4 = write_partitioned(ds, out, by="grp", n_buckets=8)
    assert s4["partitions_written"] == 5


@pytest.mark.usefixtures("ray_session")
def test_int_key_and_value_colocation(tmp_path):
    """Integer partition keys work, and every value lands in exactly
    one file (the exchange co-located it)."""
    ds, df = _mk_ds()
    import ray.data as rd

    df2 = df.assign(shard=(df["doc_id"] % 3).astype("int64"))
    out = str(tmp_path / "out")
    s = write_partitioned(rd.from_pandas(df2).repartition(5), out,
                          by="shard", n_buckets=4)
    assert s["partitions_written"] == 3
    for v in range(3):
        pdir = os.path.join(out, f"shard={v}")
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1  # one bucket owns the whole value


@pytest.mark.usefixtures("ray_session")
def test_prepare_corpus_write_through(tmp_path):
    """prepare_corpus(out_dir=...) writes the same rows the Dataset
    form returns, partitioned by split, and resumes clean."""
    from walk_ray.pipelines.prepare import prepare_corpus

    want = (prepare_corpus(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    out = str(tmp_path / "prep")
    summary = prepare_corpus(SF, out_dir=out)
    assert summary["rows_written"] == len(want)
    back = _read_back(out)
    assert back["doc_id"].tolist() == want["doc_id"].tolist()
    assert back["clean_text"].tolist() == want["clean_text"].tolist()
    assert sorted(back["split"].unique()) == sorted(want["split"].unique())

    s2 = prepare_corpus(SF, out_dir=out, resume=True)
    assert s2["partitions_written"] == 0
    assert s2["rows_skipped"] == len(want)


@pytest.mark.usefixtures("ray_session")
def test_cli_prepare(tmp_path, capsys, monkeypatch):
    """`walk_ray prepare` drives the write-through from the command
    line and prints the summary JSON; --resume skips everything."""
    import json

    import ray

    from walk_ray.cli import main

    # the CLI owns its Ray session and shuts it down on exit; keep the
    # test session alive
    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    out = str(tmp_path / "prep")
    assert main(["prepare", SF, out]) == 0
    s1 = json.loads(capsys.readouterr().out)
    assert s1["partitions_written"] >= 1 and s1["rows_written"] > 0
    assert main(["prepare", SF, out, "--resume"]) == 0
    s2 = json.loads(capsys.readouterr().out)
    assert s2["partitions_written"] == 0
    assert s2["rows_skipped"] == s1["rows_written"]
