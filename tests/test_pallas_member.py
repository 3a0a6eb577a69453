"""Pallas lane-partitioned kept-dims membership (ops/pallas_member.py).

Interpret mode exercises the kernel's exact semantics on any backend;
the stream-step test forces the lane representation end-to-end via
KSSD_KEEP_STRATEGY and asserts sketch equality with the default
strategy (the keep test of reference sketch.cpp:519-523).
"""

import numpy as np
import pytest

from rabbitkssd_tpu.ops.pallas_member import lane_table_np, member_lane


def test_lane_table_partition(rng):
    dim_size = 1 << 12
    table = rng.permutation(dim_size).astype(np.int32)
    dim_end = 600
    lt = lane_table_np(table, dim_end)
    assert lt.shape[1] == 128 and lt.shape[0] % 8 == 0
    kept = np.where(table < dim_end)[0]
    for lane in range(128):
        col = lt[:, lane]
        col = col[col >= 0]
        expect = kept[kept % 128 == lane]
        np.testing.assert_array_equal(np.sort(col), np.sort(expect))


@pytest.mark.parametrize("dim_size,dim_end", [(1 << 12, 600), (1 << 16, 4096)])
def test_member_lane_interpret(rng, dim_size, dim_end):
    table = rng.permutation(dim_size).astype(np.int32)
    lt = lane_table_np(table, dim_end)
    dims = rng.integers(0, dim_size, size=50_000).astype(np.int32)
    got = np.asarray(member_lane(dims, lt, interpret=True))
    expect = table[dims] < dim_end
    np.testing.assert_array_equal(got, expect)


def test_member_lane_fori_loop_path(rng):
    # R > _UNROLL_MAX exercises the lax.fori_loop branch
    dim_size = 1 << 17
    table = rng.permutation(dim_size).astype(np.int32)
    dim_end = 80 * 128  # R = 80 > 64 once spread over lanes
    lt = lane_table_np(table, dim_end)
    assert lt.shape[0] > 64
    dims = rng.integers(0, dim_size, size=32768).astype(np.int32)
    got = np.asarray(member_lane(dims, lt, interpret=True))
    np.testing.assert_array_equal(got, table[dims] < dim_end)


def test_sketch_with_lane_strategy(monkeypatch, rng):
    """Forced-lane sketching equals the default strategy's output."""
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
    monkeypatch.setenv("KSSD_KEEP_STRATEGY", "lane")
    lane_h, lane_n = run()
    assert base_n == lane_n == len(genomes)
    for a, b in zip(base_h, lane_h):
        np.testing.assert_array_equal(a, b)
