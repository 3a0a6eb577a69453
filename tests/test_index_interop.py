"""Inverted-index (.index/.dict) interop vs golden reference artifacts."""

import os

import numpy as np

from rabbitkssd_tpu.formats import read_index, read_sketches, write_index

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _as_map(hashes, counts, postings):
    off = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    return {
        int(h): sorted(postings[off[i]: off[i + 1]].tolist())
        for i, h in enumerate(hashes)
    }


def test_index64_semantics_match_reference(tmp_path):
    """Our sparse 64-bit index holds identical posting lists to the one
    the reference binary wrote (hash order differs: robin_hood iteration
    vs sorted — both readers accept any order)."""
    sk = read_sketches(os.path.join(GOLDEN, "fa_k10s4l1.sketch"))
    assert sk.use64
    d, i = str(tmp_path / "o.dict"), str(tmp_path / "o.index")
    write_index(sk, d, i)
    oc, op, oh = read_index(d, i, True)
    gc, gp, gh = read_index(
        os.path.join(GOLDEN, "fa_k10s4l1.sketch.dict"),
        os.path.join(GOLDEN, "fa_k10s4l1.sketch.index"), True,
    )
    assert _as_map(oh, oc, op) == _as_map(gh, gc, gp)


def test_index32_bytes_match_reference(tmp_path):
    """Dense 32-bit index: ours must be byte-identical (counts are in
    hash order; postings genome-major per hash, both deterministic)."""
    sk = read_sketches(os.path.join(GOLDEN, "fa_k5s4l1.sketch"))
    assert not sk.use64
    d, i = str(tmp_path / "o.dict"), str(tmp_path / "o.index")
    write_index(sk, d, i)
    for ours, golden in ((d, "fa_k5s4l1.sketch.dict"),
                         (i, "fa_k5s4l1.sketch.index")):
        with open(ours, "rb") as a, open(os.path.join(GOLDEN, golden), "rb") as b:
            assert a.read() == b.read(), golden
