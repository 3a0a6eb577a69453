"""Pallas TPU kernel: fused k-mer window extraction + sampling keep test.

The stream step's device front half runs three logical passes in XLA —
bitstream window extraction (``ops/kmer.py hash_windows_stream``), the
canonical-min/dim_id math, and the lane-partitioned membership kernel
(``ops/pallas_member.py``).  This kernel fuses the WHOLE per-window hot
loop of the reference (/root/reference/src/sketch.cpp:491-532: rolling
codes, reverse complement, canonical min, substring extraction, keep
test) into one VMEM-resident pass:

    (a, b, c) word streams -> E bits -> fwd/rvs -> canonical ->
    dim_id -> R rounds of lane-local membership -> hit

per 2M-window batch this replaces ~2.7 ms of XLA passes (intermediates
round-tripping HBM) with a single kernel.  Everything is elementwise
VPU work except the membership rounds' ``tpu.dynamic_gather``.

Inputs are the three shifted u32 word streams the XLA formulation
already computes (a = W[(i-K+1)>>4] per position, b/c the next words;
hash_windows_stream lines them up with one repeat + three shifts), so
the surrounding step code and the post-compaction survivor math are
unchanged — the kernel only replaces the windows+membership middle.

Opt-in via KSSD_KEEP_STRATEGY=fused until validated on real TPU
hardware; interpret mode covers semantics on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_member import _lane_gather

_LANES = 128
_SUB = 256  # sublanes per grid step
_U32 = jnp.uint32


def _rev2_32(x):
    """Reverse the 16 2-bit groups in each uint32 lane."""
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    return (x << 16) | (x >> 16)


def _extract_field(lo, hi, start: int, width: int):
    assert 0 < width <= 32
    mask = jnp.uint32((1 << width) - 1) if width < 32 else jnp.uint32(
        0xFFFFFFFF)
    if start >= 32:
        v = hi >> (start - 32) if start > 32 else hi
    elif start + width <= 32:
        v = lo >> start if start > 0 else lo
    else:
        v = (lo >> start) | (hi << (32 - start))
    return v & mask


def _match_vma(x, like):
    """Give a kernel-internal constant the mesh-axis variance of an
    input (interpret mode replays the body under shard_map, where mixed
    vma operands are rejected; compiled Mosaic is unaffected)."""
    vma = tuple(getattr(jax.typeof(like), "vma", ()) or ())
    return jax.lax.pvary(x, vma) if vma else x


def _window_kernel(K: int, TB: int, hoc2: int, subk4: int,
                   dimsize_mask: int, R: int,
                   tab_ref, a_ref, b_ref, c_ref,
                   hit_ref, dim_ref, lo_ref, hi_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    a = a_ref[:]
    b = b_ref[:]
    c = c_ref[:]

    # per-position variable shift: s = pos - (K-1); sh = 2*(s & 15).
    # Rows are 16*w bases long, so pos % 16 == flat % 16 everywhere.
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
    pos = (i * _SUB + sub) * _LANES + lane
    sh = _match_vma((2 * ((pos - (K - 1)) & 15)).astype(_U32), a)
    nz = sh != 0
    ish = _U32(32) - sh
    e_lo = jnp.where(nz, (a >> sh) | (b << ish), a)
    e_hi = jnp.where(nz, (b >> sh) | (c << ish), b)

    def fwd_mask(lo, hi):
        if TB >= 64:
            return lo, hi
        if TB > 32:
            return lo, hi & jnp.uint32((1 << (TB - 32)) - 1)
        if TB == 32:
            return lo, jnp.zeros_like(hi)
        return lo & jnp.uint32((1 << TB) - 1), jnp.zeros_like(hi)

    e_lo, e_hi = fwd_mask(e_lo, e_hi)
    r_lo, r_hi = fwd_mask(e_lo ^ _U32(0xFFFFFFFF), e_hi ^ _U32(0xFFFFFFFF))

    t_lo, t_hi = _rev2_32(e_hi), _rev2_32(e_lo)
    shift = 64 - TB
    if shift == 0:
        f_lo, f_hi = t_lo, t_hi
    elif shift < 32:
        f_lo = (t_lo >> shift) | (t_hi << (32 - shift))
        f_hi = t_hi >> shift
    else:
        f_lo = t_hi >> (shift - 32) if shift > 32 else t_hi
        f_hi = jnp.zeros_like(t_hi)
    f_lo, f_hi = fwd_mask(f_lo, f_hi)

    use_fwd = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    uni_lo = jnp.where(use_fwd, f_lo, r_lo)
    uni_hi = jnp.where(use_fwd, f_hi, r_hi)

    dim_id = (_extract_field(uni_lo, uni_hi, hoc2, subk4)
              & jnp.uint32(dimsize_mask)).astype(jnp.int32)

    idx = dim_id & (_LANES - 1)
    acc = _match_vma(jnp.zeros(dim_id.shape, jnp.bool_), a)

    def compare_row(row, acc):
        tv = _lane_gather(jnp.broadcast_to(row, dim_id.shape), idx)
        return acc | (tv == dim_id)

    if R <= 64:
        for r in range(R):
            acc = compare_row(tab_ref[r: r + 1, :], acc)
    else:
        acc = jax.lax.fori_loop(
            0, R, lambda r, s: compare_row(tab_ref[pl.ds(r, 1), :], s),
            acc)

    hit_ref[:] = acc.astype(jnp.int8)
    dim_ref[:] = dim_id
    lo_ref[:] = uni_lo
    hi_ref[:] = uni_hi


@functools.partial(jax.jit, static_argnames=("K", "TB", "hoc2", "subk4",
                                              "dimsize_mask", "interpret"))
def _fused_call(a, b, c, lane_tab, K: int, TB: int, hoc2: int, subk4: int,
                dimsize_mask: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = a.shape[0]  # [M, 128]
    R = lane_tab.shape[0]
    # under shard_map the output avals must declare their mesh-axis
    # variance (jax >= 0.9 check_vma); inherit the inputs' vma
    vma = getattr(jax.typeof(a), "vma", frozenset())
    kern = functools.partial(_window_kernel, K, TB, hoc2, subk4,
                             dimsize_mask, R)
    with jax.enable_x64(False):
        grid = (M // _SUB,)
        tile = lambda i: (i, 0)  # noqa: E731
        word_spec = pl.BlockSpec((_SUB, _LANES), tile,
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, _LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                word_spec, word_spec, word_spec,
            ],
            out_specs=(
                pl.BlockSpec((_SUB, _LANES), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANES), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANES), tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANES), tile,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((M, _LANES), jnp.int8, vma=vma),
                jax.ShapeDtypeStruct((M, _LANES), jnp.int32, vma=vma),
                jax.ShapeDtypeStruct((M, _LANES), jnp.uint32, vma=vma),
                jax.ShapeDtypeStruct((M, _LANES), jnp.uint32, vma=vma),
            ),
            interpret=interpret,
        )(lane_tab, a, b, c)
    return out


def fused_window_keep(words, lane_tab, params, interpret: bool = False):
    """Fused windows + keep test over a packed word batch.

    words: u32[nb, nw] packed rows (hash_windows_stream layout, 2 zero
    pad words per row).  Returns (hit bool[nb, L], dim_id i32[nb, L],
    uni_lo u32[nb, L], uni_hi u32[nb, L]) with L = 16*(nw-2) — the same
    contract as ``hash_windows_stream(params).windows`` minus the ``ok``
    validity mask (computed by the caller from the exception list).
    """
    p = params
    K = p.kmer_size
    TB = 2 * K
    nb, nw = words.shape
    L = 16 * (nw - 2)

    # a = W[(i-K+1)>>4] per window position, b/c the following words —
    # one repeat + three shifted slices (fused by XLA into plain copies)
    wr = jnp.repeat(words, 16, axis=-1)

    def shift_right(x, t: int):
        n = x.shape[-1]
        if t == 0:
            return x
        if t > 0:
            return jnp.pad(x, ((0, 0), (t, 0)))[..., :n]
        return jnp.pad(x, ((0, 0), (0, -t)))[..., -t:]

    a = shift_right(wr, K - 1)[..., :L].reshape(-1)
    b = shift_right(wr, K - 1 - 16)[..., :L].reshape(-1)
    c = shift_right(wr, K - 1 - 32)[..., :L].reshape(-1)

    n = a.shape[0]
    pad = (-n) % (_SUB * _LANES)
    if pad:
        z = jnp.zeros((pad,), jnp.uint32)
        a, b, c = (jnp.concatenate([v, z]) for v in (a, b, c))
    a2 = a.reshape(-1, _LANES)
    b2 = b.reshape(-1, _LANES)
    c2 = c.reshape(-1, _LANES)

    hit, dim_id, uni_lo, uni_hi = _fused_call(
        a2, b2, c2, lane_tab, K, TB, 2 * p.half_outctx_len,
        4 * p.half_subk, p.dim_size - 1, interpret)

    def cut(x, dt):
        return x.reshape(-1)[:n].reshape(nb, L).astype(dt)

    return (cut(hit, jnp.bool_), cut(dim_id, jnp.int32),
            cut(uni_lo, jnp.uint32), cut(uni_hi, jnp.uint32))
