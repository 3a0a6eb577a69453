"""Distance engine vs golden reference-binary outputs (text-exact)."""

import os

import numpy as np
import pytest

from rabbitkssd_tpu.engine.dist_engine import run_alldist, run_dist
from rabbitkssd_tpu.formats import read_sketches
from rabbitkssd_tpu.ops.distance import common_counts

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _sorted_rows(path):
    with open(path) as f:
        lines = f.readlines()
    assert lines[0].startswith(" genome0\t") or lines[0].startswith(" referenceGenome\t")
    return lines[0], sorted(lines[1:])


@pytest.mark.parametrize(
    "sketch,golden,kw",
    [
        ("fa_k8s4l1.sketch", "fa_k8s4l1.alldist",
         dict(max_dist=1.0, containment=False)),
        ("fa_k10s4l1.sketch", "fa_k10s4l1.alldist",
         dict(max_dist=0.5, containment=False)),
        ("fa_k8s4l1.sketch", "fa_k8s4l1.allcont",
         dict(max_dist=1.0, containment=True)),
    ],
)
def test_alldist_golden(tmp_path, sketch, golden, kw):
    sk = read_sketches(os.path.join(GOLDEN, sketch))
    out = str(tmp_path / "out.dist")
    run_alldist(sk, out, **kw)
    got_h, got = _sorted_rows(out)
    want_h, want = _sorted_rows(os.path.join(GOLDEN, golden))
    assert got_h == want_h
    assert got == want


@pytest.mark.parametrize(
    "golden,kw",
    [
        ("fa_k8s4l1.dist", dict(max_dist=1.0, containment=False)),
        ("fa_k8s4l1.distN2",
         dict(max_dist=1.0, containment=False, max_neighbor=2)),
    ],
)
def test_dist_golden(tmp_path, golden, kw):
    ref = read_sketches(os.path.join(GOLDEN, "fa_k8s4l1.sketch"))
    query = read_sketches(os.path.join(GOLDEN, "faq_k8s4l1.sketch"))
    out = str(tmp_path / "out.dist")
    run_dist(ref, query, out, **kw)
    got_h, got = _sorted_rows(out)
    want_h, want = _sorted_rows(os.path.join(GOLDEN, golden))
    assert got_h == want_h
    assert got == want


def test_common_counts_vs_numpy(rng):
    """Device matmul counting == np.intersect1d on random sketches."""
    hashes = [
        np.unique(rng.integers(0, 5000, size=rng.integers(0, 800)).astype(np.uint32))
        for _ in range(23)
    ]
    common = common_counts(hashes, None)
    for i in range(23):
        for j in range(23):
            if i == j:
                continue
            want = np.intersect1d(hashes[i], hashes[j]).size
            assert common[i, j] == want, (i, j)


def test_common_counts_refquery(rng):
    ref = [np.unique(rng.integers(0, 3000, size=500).astype(np.uint64))
           for _ in range(9)]
    qry = [np.unique(rng.integers(0, 3000, size=200).astype(np.uint64))
           for _ in range(4)]
    common = common_counts(qry, ref)
    assert common.shape == (4, 9)
    for i in range(4):
        for j in range(9):
            assert common[i, j] == np.intersect1d(qry[i], ref[j]).size


def test_common_counts_chunked(rng):
    """Chunking over the vocab must not change counts."""
    hashes = [
        np.unique(rng.integers(0, 100000, size=3000).astype(np.uint32))
        for _ in range(6)
    ]
    a = common_counts(hashes, None)
    b = common_counts(hashes, None, chunk=1024)
    np.testing.assert_array_equal(a, b)


def test_write_rows_4gb_split(tmp_path, monkeypatch):
    """Outputs beyond the split threshold land in <out>.dir + <out>.index
    (reference dist.cpp:276-341)."""
    import rabbitkssd_tpu.engine.dist_engine as de

    monkeypatch.setattr(de, "MAX_SINGLE_FILE", 64)
    out = str(tmp_path / "big.dist")
    rows = [f"g{i}\tg{j}\t1|2|3\t0.100000\t0.200000\n"
            for i in range(6) for j in range(i)]
    de._write_rows(iter(rows), [f"g{i}" for i in range(6)], out)
    assert not os.path.exists(out)
    part = os.path.join(out + ".dir", "big.dist.0")
    assert os.path.exists(part)
    with open(part) as f:
        assert f.readlines() == rows
    with open(out + ".index") as f:
        idx = f.readlines()
    assert idx[0] == "genomeName\tdistFileName\n"
    assert len(idx) == 7


def test_alldist_row_blocked(tmp_path, monkeypatch):
    """Row-blocked path must emit identical rows to the monolithic one."""
    monkeypatch.setenv("KSSD_DIST_ROW_BLOCK", "3")
    sk = read_sketches(os.path.join(GOLDEN, "fa_k8s4l1.sketch"))
    out = str(tmp_path / "blk.dist")
    run_alldist(sk, out, max_dist=1.0, containment=False)
    got_h, got = _sorted_rows(out)
    want_h, want = _sorted_rows(os.path.join(GOLDEN, "fa_k8s4l1.alldist"))
    assert got_h == want_h
    assert got == want
