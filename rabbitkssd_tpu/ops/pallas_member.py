"""Pallas TPU kernel: kept-dims membership via lane-partitioned tables.

The sketch keep test asks, per k-mer window, whether its substring-space
``dim_id`` survives sampling — i.e. whether ``shuffled_dim[dim_id] <
dim_end`` (reference /root/reference/src/sketch.cpp:519-523).  Round 1
showed the two XLA formulations are both bandwidth/compute-poor on TPU:

* a random gather into the 16^subk-entry permutation table runs at
  XLA's flat ~7.5 ns/element (the table never stays resident), and
* the gather-free compare-all sweep against the kept set costs
  ``K`` vector compares per element (fine for K=4096, hopeless for the
  drlevel<3 configs where K = 16^(subk-drlevel) reaches 65536+).

This kernel exploits the one fast data-dependent addressing primitive
the VPU has: **lane-local dynamic gather** (``take_along_axis`` along
the 128-lane axis, Mosaic's DynamicGatherOp).  The kept set is
partitioned by ``dim % 128`` into an ``[R, 128]`` table whose column
``l`` holds the kept dims congruent to ``l``; a window's dim_id then
only needs comparing against its own lane's column — ``R ≈ K/128``
rounds of (broadcast row, lane-gather at ``dim & 127``, compare), a
128x compute reduction over compare-all, with the table resident in
VMEM.  This is the TPU analogue of the reference's L1-resident
single-load keep test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_SUB = 256  # tile sublanes; elements per grid step = _SUB * 128
_UNROLL_MAX = 64  # unroll the R-loop below this, lax.fori_loop above


def lane_table_np(table: np.ndarray, dim_end: int) -> np.ndarray:
    """Partition kept dims (``0 <= table[d] < dim_end``) by ``d % 128``.

    Returns int32[R, 128]: column l holds the kept dims congruent to l
    mod 128 (ascending), padded with -1; R is the max per-lane count,
    rounded up to a multiple of 8 sublanes.
    """
    t = np.asarray(table)
    kept = np.where((t >= 0) & (t < dim_end))[0].astype(np.int64)
    lanes = (kept % _LANES).astype(np.int64)
    counts = np.bincount(lanes, minlength=_LANES)
    R = max(8, int(-(-int(counts.max() if counts.size else 0) // 8) * 8))
    out = np.full((R, _LANES), -1, np.int32)
    order = np.argsort(lanes, kind="stable")  # kept is ascending per lane
    ls = lanes[order]
    vs = kept[order]
    rank = np.arange(len(vs)) - np.searchsorted(ls, ls, side="left")
    out[rank, ls] = vs
    return out


def _lane_gather(t, idx):
    """take_along_axis(t, idx, axis=1) with int32 indices (the jnp
    wrapper promotes indices to int64 under jax_enable_x64, which
    Mosaic cannot lower; the underlying lane-wise DynamicGatherOp is
    32-bit).  ``idx`` must already be in [0, t.shape[1])."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        t, idx[..., None].astype(jnp.int32), dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _member_kernel(R: int, tab_ref, d_ref, out_ref):
    from jax.experimental import pallas as pl

    dv = d_ref[:]
    idx = dv & (_LANES - 1)

    def compare_row(row, acc):
        tv = _lane_gather(jnp.broadcast_to(row, dv.shape), idx)
        return acc | (tv == dv)

    # interpret mode replays the body under shard_map, where constants
    # must carry the inputs' mesh-axis variance (vma)
    vma = tuple(getattr(jax.typeof(dv), "vma", ()) or ())
    acc = jnp.zeros(dv.shape, jnp.bool_)
    if vma:
        acc = jax.lax.pvary(acc, vma)
    if R <= _UNROLL_MAX:
        for r in range(R):
            acc = compare_row(tab_ref[r : r + 1, :], acc)
    else:
        acc = jax.lax.fori_loop(
            0, R,
            lambda r, a: compare_row(tab_ref[pl.ds(r, 1), :], a),
            acc,
        )
    out_ref[:] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _member_call(d2, lane_tab, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = d2.shape[0]
    R = lane_tab.shape[0]
    # under shard_map the output aval must declare which mesh axes it
    # varies over (jax >= 0.9 check_vma); inherit the input's vma
    vma = getattr(jax.typeof(d2), "vma", frozenset())
    # trace with x64 disabled: under jax_enable_x64 the BlockSpec index
    # maps produce i64 scalars, which Mosaic cannot lower; all kernel
    # dtypes here are explicit 32-bit so semantics are unchanged
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_member_kernel, R),
            grid=(M // _SUB,),
            in_specs=[
                pl.BlockSpec((R, _LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, _LANES), jnp.int32,
                                           vma=vma),
            interpret=interpret,
        )(lane_tab, d2)
    return out


def member_lane(dim_id, lane_tab, interpret: bool = False):
    """bool mask of each ``dim_id``'s membership in the kept set.

    ``dim_id``: any-shape integer array (values >= 0); ``lane_tab``
    from :func:`lane_table_np`.  Composable under jit/shard_map.
    """
    d = dim_id.astype(jnp.int32).reshape(-1)
    n = d.shape[0]
    pad = (-n) % (_SUB * _LANES)
    if pad:
        # pad value -2 can match neither kept dims (>= 0) nor table
        # pads (-1)
        d = jnp.concatenate([d, jnp.full((pad,), -2, jnp.int32)])
    d2 = d.reshape(-1, _LANES)
    out = _member_call(d2, lane_tab, interpret)
    return (out.reshape(-1)[:n] != 0).reshape(dim_id.shape)
