"""pack_sequences conformance: the distributed packer equals a
pure-python next-fit reference, respects the budget, and is
deterministic (shard-independent by construction — bucket = doc_id
hash, packing in doc_id order within bucket)."""

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.text import pack_sequences

SF = "/root/testdata/sf0.001"
BUDGET = 512
NB = 16


def _reference(budget=BUDGET, n_buckets=NB):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = [
        (int(d), len((x or "").split()))
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ]
    rows = {}
    for b in range(n_buckets):
        sub = sorted((d, n) for d, n in docs if d % n_buckets == b)
        cur, fill = 0, 0
        fills: dict[int, int] = {}
        assign = []
        for d, n in sub:
            if fill and fill + n > budget:
                cur += 1
                fill = 0
            assign.append((d, n, cur))
            fill += n
            fills[cur] = fill
        for d, n, c in assign:
            rows[d] = (n, (b << 32) | c, fills[c])
    return rows


@pytest.mark.usefixtures("ray_session")
def test_pack_matches_reference_and_budget():
    out = pack_sequences(SF, budget=BUDGET, n_buckets=NB).to_pandas()
    ref = _reference()
    assert len(out) == len(ref)
    got = {
        int(r.doc_id): (int(r.n_tokens), int(r.bin_id), int(r.bin_tokens))
        for r in out.itertuples()
    }
    assert got == ref
    # budget honored except single-doc oversize bins
    per_bin = out.groupby("bin_id").agg(
        n_docs=("doc_id", "size"), fill=("bin_tokens", "first"),
        check=("n_tokens", "sum"))
    assert (per_bin["fill"] == per_bin["check"]).all()
    over = per_bin[per_bin["fill"] > BUDGET]
    assert (over["n_docs"] == 1).all()
    # packing is useful: bins are multi-doc on average for this corpus
    assert per_bin["n_docs"].mean() > 1.5


@pytest.mark.usefixtures("ray_session")
def test_pack_deterministic():
    a = pack_sequences(SF, budget=BUDGET, n_buckets=NB).to_pandas()
    b = pack_sequences(SF, budget=BUDGET, n_buckets=NB).to_pandas()
    key = ["doc_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
