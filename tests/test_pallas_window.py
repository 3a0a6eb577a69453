"""Fused Pallas window+keep kernel (ops/pallas_window.py).

Pins the fused kernel against the XLA formulation (hash_windows_stream
+ member_lane) and end-to-end sketch equality with the default
strategy; interpret mode on CPU backends covers semantics."""

import numpy as np
import pytest

import jax

from rabbitkssd_tpu.params import KssdParams
from rabbitkssd_tpu.shuffle import generate_shuffle


@pytest.mark.parametrize("k,s,l", [(8, 6, 3), (10, 6, 3), (12, 6, 3)])
def test_fused_matches_xla_windows(rng, k, s, l):
    from rabbitkssd_tpu.ops.kmer import hash_windows_stream
    from rabbitkssd_tpu.ops.pallas_member import lane_table_np
    from rabbitkssd_tpu.ops.pallas_window import fused_window_keep

    shuf = generate_shuffle(k, s, l)
    params = KssdParams(half_k=k, half_subk=s, drlevel=l)
    lt = np.asarray(lane_table_np(shuf.shuffled_dim, params.dim_end))
    nb, nw = 2, 16 + 2
    words = rng.integers(0, 2 ** 32, size=(nb, nw),
                         dtype=np.uint64).astype(np.uint32)
    words[:, -2:] = 0
    L = 16 * (nw - 2)
    valid = np.ones((nb, L), bool)

    hasher = hash_windows_stream(params)
    uni_lo, uni_hi, dim_id, ok = jax.jit(hasher.windows)(
        words, valid)
    interp = jax.default_backend() != "tpu"
    hit, f_dim, f_lo, f_hi = fused_window_keep(words, lt, params,
                                               interpret=interp)
    np.testing.assert_array_equal(np.asarray(f_dim), np.asarray(dim_id))
    np.testing.assert_array_equal(np.asarray(f_lo), np.asarray(uni_lo))
    np.testing.assert_array_equal(np.asarray(f_hi), np.asarray(uni_hi))
    # membership oracle
    t = np.asarray(shuf.shuffled_dim)
    kept_mask = (t >= 0) & (t < params.dim_end)
    want_hit = kept_mask[np.asarray(dim_id)]
    np.testing.assert_array_equal(np.asarray(hit), want_hit)


def test_sketch_with_fused_strategy(monkeypatch, rng):
    """Forced-fused sketching equals the default strategy's output."""
    from rabbitkssd_tpu.engine.sketcher import DeviceSketcher

    shuf = generate_shuffle(8, 6, 3)
    params = KssdParams(half_k=8, half_subk=6, drlevel=3)
    genomes = [rng.integers(0, 4, size=n).astype(np.int8)
               for n in (5000, 700, 9000)]
    genomes[1][50:70] = -1  # an N run

    def run():
        sk = DeviceSketcher(params, shuf.shuffled_dim, n_blocks=2,
                            block=4096)
        return sk.sketch_codes(iter([g.copy() for g in genomes]))

    base_h, base_n = run()
    monkeypatch.setenv("KSSD_KEEP_STRATEGY", "fused")
    fused_h, fused_n = run()
    assert base_n == fused_n == len(genomes)
    for a, b in zip(base_h, fused_h):
        np.testing.assert_array_equal(a, b)


def test_sharded_sketch_with_fused_strategy(monkeypatch, rng):
    """The fused kernel composes under shard_map (multi-device mesh)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    from rabbitkssd_tpu.engine.sketcher import (DeviceSketcher,
                                                ShardedSketcher)

    shuf = generate_shuffle(8, 6, 3)
    params = KssdParams(half_k=8, half_subk=6, drlevel=3)
    genomes = [rng.integers(0, 4, size=n).astype(np.int8)
               for n in (6000, 2500)]
    monkeypatch.setenv("KSSD_KEEP_STRATEGY", "fused")
    sk = ShardedSketcher(params, shuf.shuffled_dim, n_blocks=1, block=2048)
    got, n = sk.sketch_codes(iter([g.copy() for g in genomes]))
    monkeypatch.delenv("KSSD_KEEP_STRATEGY")
    ref = DeviceSketcher(params, shuf.shuffled_dim, n_blocks=2, block=2048)
    want, _ = ref.sketch_codes(iter(genomes))
    assert n == len(genomes)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
