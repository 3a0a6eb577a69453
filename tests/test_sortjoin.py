"""Sorted-semijoin keep test (ops/kmer.py sortjoin_keep).

The large-kept-set configs (drlevel<3 and the use64 mammal configs,
e.g. L3K12's 262144 kept dims) replace the permutation-table gather
with one stable sort + running-max scan; these tests pin the op's
semantics against a numpy oracle and the end-to-end sketch equality
with the default strategy (reference keep test sketch.cpp:519-523).
"""

import numpy as np
import pytest

import jax

from rabbitkssd_tpu.ops.kmer import kept_dims_np, sortjoin_keep


def _oracle(key, kept_set):
    return np.array([k in kept_set for k in key], bool)


@pytest.mark.parametrize("dim_size,dim_end", [(1 << 12, 600), (1 << 16, 4096)])
def test_sortjoin_keep_oracle(rng, dim_size, dim_end):
    table = rng.permutation(dim_size).astype(np.int32)
    kept = kept_dims_np(table, dim_end)
    n = 50_000
    key = rng.integers(0, dim_size, size=n).astype(np.int32)
    # sprinkle invalid-window sentinels
    key[rng.integers(0, n, size=500)] = np.int32(0x7FFFFFFF)

    keep_sorted, pos_sorted = jax.jit(sortjoin_keep)(key, kept)
    keep_sorted = np.asarray(keep_sorted)
    pos_sorted = np.asarray(pos_sorted)

    # recover original-order membership from sorted space
    got = np.zeros(n, bool)
    surv_pos = pos_sorted[keep_sorted]
    assert (surv_pos >= 0).all()
    got[surv_pos] = True

    kept_set = set(kept[kept >= 0].tolist())
    expect = _oracle(key, kept_set)
    expect[key == np.int32(0x7FFFFFFF)] = False
    np.testing.assert_array_equal(got, expect)
    # every surviving slot references a distinct window
    assert len(surv_pos) == len(np.unique(surv_pos))


def test_sortjoin_keep_duplicates_and_empty(rng):
    # duplicate queries must each survive; all-miss batch yields none
    kept = np.array([3, 7, 1000, -1], np.int32)
    key = np.array([7, 7, 7, 2, 3, 999], np.int32)
    keep_sorted, pos_sorted = sortjoin_keep(key, np.sort(kept))
    got = np.sort(np.asarray(pos_sorted)[np.asarray(keep_sorted)])
    np.testing.assert_array_equal(got, [0, 1, 2, 4])

    miss = np.array([2, 4, 6], np.int32)
    ks, _ = sortjoin_keep(miss, np.sort(kept))
    assert not np.asarray(ks).any()


def test_sketch_with_sort_strategy(monkeypatch, rng):
    """Forced-sortjoin sketching equals the default strategy's output."""
    from rabbitkssd_tpu.engine.sketcher import DeviceSketcher
    from rabbitkssd_tpu.params import KssdParams
    from rabbitkssd_tpu.shuffle import generate_shuffle

    shuf = generate_shuffle(8, 6, 3)
    params = KssdParams(half_k=8, half_subk=6, drlevel=3)
    table = shuf.shuffled_dim
    genomes = [
        rng.integers(0, 4, size=n).astype(np.int8)
        for n in (5000, 700, 12000)
    ]
    genomes[1][50:70] = -1  # an N run

    def run():
        sk = DeviceSketcher(params, table, n_blocks=2, block=4096)
        hashes, n = sk.sketch_codes(iter([g.copy() for g in genomes]))
        return hashes, n

    base_h, base_n = run()
    monkeypatch.setenv("KSSD_KEEP_STRATEGY", "sort")
    sort_h, sort_n = run()
    assert base_n == sort_n == len(genomes)
    for a, b in zip(base_h, sort_h):
        np.testing.assert_array_equal(a, b)


def test_sketch_with_sort_strategy_use64(monkeypatch, rng):
    """The use64 (L3K12-like) hash path through the sortjoin branch."""
    from rabbitkssd_tpu.engine.sketcher import DeviceSketcher
    from rabbitkssd_tpu.params import KssdParams
    from rabbitkssd_tpu.shuffle import generate_shuffle

    shuf = generate_shuffle(12, 6, 3)
    params = KssdParams(half_k=12, half_subk=6, drlevel=3)
    assert params.use64
    table = shuf.shuffled_dim
    genomes = [rng.integers(0, 4, size=n).astype(np.int8)
               for n in (9000, 3000)]

    def run():
        sk = DeviceSketcher(params, table, n_blocks=2, block=4096)
        hashes, n = sk.sketch_codes(iter([g.copy() for g in genomes]))
        return hashes, n

    base_h, base_n = run()
    monkeypatch.setenv("KSSD_KEEP_STRATEGY", "sort")
    sort_h, sort_n = run()
    assert base_n == sort_n == len(genomes)
    for a, b in zip(base_h, sort_h):
        np.testing.assert_array_equal(a, b)
