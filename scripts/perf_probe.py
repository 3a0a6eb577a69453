#!/usr/bin/env python
"""Component-level performance probe for the sketch+distance hot paths.

Measures each pipeline stage in isolation so regressions are
attributable (the numbers BASELINE.md quotes come from here):

  parse      native FASTA reader, one-shot + chunked (Mbase/s)
  feeder     WordTapeFeeder assembly incl. parse (Mbase/s)
  h2d        host->device batch transfer (MB/s)
  step:*     pipelined device stream step per config (ms/batch, Mbase/s)
  member:*   keep-test strategies on one batch of dim_ids (ms)
  flush      read_scalars + fused read_prefixes round trips (ms)
  counts     pair_counts tile (device matmul path) (ms)

Device stages are skipped (with a note) when no healthy accelerator is
attached; host stages always run.  Prints one JSON object per stage.

Usage: python scripts/perf_probe.py [--genomes 32] [--device-only|--host-only]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("KSSD_BENCH_DIR", "/tmp/kssd_bench")


def emit(stage: str, **kv):
    print(json.dumps({"stage": stage, **kv}), flush=True)


def device_healthy(timeout: int = 90) -> bool:
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # local backend (cpu/tpu-vm): trust it
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jax.block_until_ready(jax.jit(lambda v: v+1)(jnp.ones(128)));"
             "print('HEALTHY')"],
            capture_output=True, text=True, timeout=timeout)
        return "HEALTHY" in r.stdout
    except Exception:
        return False


def ensure_corpus(n_genomes: int, length: int) -> list[str]:
    root = os.path.join(BENCH_DIR, f"probe_n{n_genomes}_l{length}")
    marker = os.path.join(root, "DONE")
    files = [os.path.join(root, f"g{i:03d}.fna") for i in range(n_genomes)]
    if os.path.exists(marker):
        return files
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for p in files:
        seq = bases[rng.integers(0, 4, size=length, dtype=np.int8)]
        with open(p, "wb") as f:
            f.write(b">g\n")
            rows = seq[: length - length % 100].reshape(-1, 100)
            nl = np.full((rows.shape[0], 1), ord("\n"), np.uint8)
            f.write(np.hstack([rows, nl]).tobytes())
    with open(marker, "w") as f:
        f.write("ok")
    return files


def probe_host(files: list[str]) -> None:
    from rabbitkssd_tpu.native import fasta_packed, load_native
    from rabbitkssd_tpu.engine import sketcher as S
    from rabbitkssd_tpu.params import KssdParams

    # raw kernel page-fault throughput: first-touch of 2 GB of fresh
    # calloc pages, one thread.  Healthy hosts do several GB/s; the
    # round-3/4 container host measures 0.2-0.7 GB/s AND varies ~3x
    # run-to-run, which dominates any phase that faults multi-GB fresh
    # buffers (the config-5 index build, the reference's transSketches)
    # — quote this next to any such wall so the number is attributable
    t0 = time.time()
    a = np.zeros(500_000_000, np.uint32)
    a[::1024] = 1
    emit("fault_rate", gb_per_s=round(2.0 / (time.time() - t0), 2))
    del a

    if load_native() is None:
        emit("parse", skipped="no native toolchain")
        return
    t0 = time.time()
    total = sum(fasta_packed(p, 0)[1] for p in files)
    emit("parse", mbase_per_s=round(total / 1e6 / (time.time() - t0), 1),
         mbase=round(total / 1e6, 1))

    # parse-pool scaling (VERDICT r2 item 7): the sketch scheduler's
    # bounded parallel parse (sketcher.py gen(); the native parser
    # releases the GIL) should scale near-linearly to the core count
    # rather than contend — a TPU-VM host has ~100 cores to feed one
    # chip's 434 Mbase/s appetite
    from concurrent.futures import ThreadPoolExecutor

    ncpu = os.cpu_count() or 1
    for t in (1, 2, 4, 8, 16):
        if t > ncpu:
            break
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=t) as ex:
            tot = sum(r[1] for r in ex.map(lambda p: fasta_packed(p, 0),
                                           files))
        emit(f"parse_pool:t{t}",
             mbase_per_s=round(tot / 1e6 / (time.time() - t0), 1))

    params = KssdParams(half_k=10, half_subk=6, drlevel=3)
    halo = S.aligned_halo(params)
    t0 = time.time()
    feeder = S.WordTapeFeeder((fasta_packed(p, 0) for p in files),
                              n_blocks=16, block=1 << 17, halo=halo)
    nb = sum(1 for _ in feeder)
    emit("feeder", mbase_per_s=round(total / 1e6 / (time.time() - t0), 1),
         batches=nb)


def probe_device(files: list[str]) -> None:
    import jax
    import jax.numpy as jnp

    from rabbitkssd_tpu.engine import sketcher as S
    from rabbitkssd_tpu.ops.kmer import (kept_dims_np, member_kept,
                                         pad_exceptions, sortjoin_keep)
    from rabbitkssd_tpu.ops import hostxfer
    from rabbitkssd_tpu.params import KssdParams
    from rabbitkssd_tpu.shuffle import generate_shuffle

    backend = jax.default_backend()
    emit("device", backend=backend, n=len(jax.devices()))

    # h2d
    payload = np.zeros((16, 8196), np.uint32)
    jax.block_until_ready(jax.device_put(payload))
    t0 = time.time()
    for _ in range(10):
        d = jax.device_put(payload)
    jax.block_until_ready(d)
    dt = (time.time() - t0) / 10
    emit("h2d", mb_per_s=round(payload.nbytes / 1e6 / dt, 0))

    rng = np.random.default_rng(0)
    # every shipped .shuf regime (the reference's init_shuffle.sh 12
    # standard configs + the README's l=5 mammal setting + a use64
    # config), each with its expected auto keep-strategy on TPU:
    # drlevel>=3 keeps <=4096 dims -> Pallas lane table; drlevel=2
    # keeps 65536 -> sorted semijoin (lane table would need R>512
    # rounds); drlevel=5 keeps 16 -> lane.
    def _strategy(shape) -> str:
        if len(shape) == 2:
            return "gather" if tuple(shape) == (1, 1) else "lane"
        return "sort" if shape[0] > 8192 else "member"

    std = {f"L{l}K{k}": ((k, 6, l), "lane" if l >= 3 else "sort")
           for l, ks in ((4, (8, 9, 10, 11)), (3, (8, 9, 10, 11)),
                         (2, (7, 8, 9, 10)))
           for k in ks}
    configs = {**std, "L5K10": ((10, 6, 5), "lane"),
               "L3K12": ((12, 6, 3), "lane")}
    only = os.environ.get("KSSD_PROBE_CONFIGS")  # e.g. "L3K10,L2K8"
    if only:
        configs = {n: configs[n] for n in only.split(",") if n in configs}
    for name, ((k, s, l), want_strat) in configs.items():
        try:
            params = KssdParams(half_k=k, half_subk=s, drlevel=l)
        except ValueError as e:
            # the reference's own initParameter hard-errors on
            # half_subk - drlevel < 3 (common.cpp:37-39): the standard
            # L4*/L5* .shuf files (init_shuffle.sh, s=6) can be
            # GENERATED (shuffle.cpp only warns) but no binary —
            # reference or ours — can sketch with them.  Probe rows
            # document the dead regime instead of a step rate.
            emit(f"step:{name}", skipped=f"rejected by initParameter "
                 f"parity: {e}")
            continue
        shuf = generate_shuffle(k, s, l)
        sk = S.DeviceSketcher(params, shuf.shuffled_dim)
        halo = S.aligned_halo(params)
        nw = (1 << 17) // 16 + halo // 16 + 2
        words = rng.integers(0, 2 ** 32, size=(16, nw),
                             dtype=np.uint64).astype(np.uint32)
        d2 = jax.device_put(words)
        dexc = jax.device_put(
            pad_exceptions(np.empty(0, np.int32),
                           16 * ((1 << 17) + halo)))
        vu = jnp.int32(16 * (1 << 17))
        out = sk._step(d2, dexc, sk.tables, *sk._fresh_buffers(),
                       jnp.int32(0), vu)
        jax.block_until_ready(out)
        # marginal cost between queue depths 8 and 16: one final
        # sync costs a ~30 ms relay round trip and deep unsynced
        # queues hit erratic relay dispatch stalls, so neither a
        # synced loop nor a long pipelined loop measures the device
        # step itself; the depth-8 -> depth-16 delta cancels both
        # (methodology validated round 4)
        def run(depth):
            o = out
            t0 = time.time()
            for _ in range(depth):
                o = sk._step(d2, dexc, sk.tables, *o, jnp.int32(0),
                             vu)
            jax.block_until_ready(o)
            return time.time() - t0, o

        _, out = run(8)  # discard: absorbs queue-warmup stalls
        t8, out = run(8)
        t16, out = run(16)
        dt = (t16 - t8) / 8
        got_strat = _strategy(sk.tables[1].shape)
        if backend == "tpu" and got_strat != want_strat:
            emit(f"step:{name}", error=f"auto keep-strategy picked "
                 f"{got_strat}, expected {want_strat}")
            continue
        emit(f"step:{name}", ms_per_batch=round(dt * 1e3, 2),
             mbase_per_s=round(16 * (1 << 17) / 1e6 / dt, 0),
             keep_strategy=got_strat,
             keep_rep=list(sk.tables[1].shape))

    # membership strategies on one L3K10 batch of dim_ids
    shuf = generate_shuffle(10, 6, 3)
    params = KssdParams(half_k=10, half_subk=6, drlevel=3)
    kept = jnp.asarray(kept_dims_np(shuf.shuffled_dim, params.dim_end))
    table = jnp.asarray(shuf.shuffled_dim.astype(np.int32))
    dim_id = jnp.asarray(rng.integers(0, params.dim_size, size=(16, 131104),
                                      dtype=np.int64).astype(np.int32))
    strategies = {
        "member": jax.jit(lambda d: member_kept(d, kept).sum()),
        "gather": jax.jit(
            lambda d: (jnp.take(table, d.astype(jnp.int32), axis=0)
                       < params.dim_end).sum()),
        "sort": jax.jit(
            lambda d: sortjoin_keep(d.ravel(), kept)[0].sum()),
    }
    if backend == "tpu":
        from rabbitkssd_tpu.ops.pallas_member import (lane_table_np,
                                                      member_lane)

        lt = jnp.asarray(lane_table_np(shuf.shuffled_dim, params.dim_end))
        strategies["lane"] = jax.jit(lambda d: member_lane(d, lt).sum())
    for name, f in strategies.items():
        o = f(dim_id)
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(20):
            o = f(dim_id)
        jax.block_until_ready(o)
        emit(f"member:{name}", ms=round((time.time() - t0) / 20 * 1e3, 2))

    # flush read round trips
    buf = jnp.zeros(1 << 23, jnp.uint32)
    bufs = [buf, jnp.zeros(1 << 23, jnp.int32), jnp.zeros(1 << 23, jnp.int32)]
    hostxfer.read_prefixes(bufs, 32768)
    t0 = time.time()
    for _ in range(5):
        hostxfer.read_prefixes(bufs, 32768)
    emit("flush:prefixes", ms=round((time.time() - t0) / 5 * 1e3, 1))
    hostxfer.read_scalars(jnp.int32(1), jnp.bool_(False))
    t0 = time.time()
    for _ in range(5):
        hostxfer.read_scalars(jnp.int32(1), jnp.bool_(False))
    emit("flush:scalars", ms=round((time.time() - t0) / 5 * 1e3, 1))

    # distance tile
    from rabbitkssd_tpu.ops.distance import common_counts

    hashes = [np.unique(rng.integers(0, 1 << 24, size=500)
                        .astype(np.uint32)) for _ in range(256)]
    common_counts(hashes[:8], hashes[:8])  # warm
    t0 = time.time()
    out = common_counts(hashes, None)
    emit("counts:256x256", ms=round((time.time() - t0) * 1e3, 0),
         nnz=int((out > 0).sum()))


def probe_dp_scaling() -> None:
    """Fixed-work dp scaling of the sharded sketch step on virtual CPU
    meshes (the measured scaling factor in BASELINE.md's v5e-8
    projection).  Total work is constant — 16 blocks x 128 Kbase of
    random codes through make_sharded_sketch_step — while the mesh
    grows 1 -> 8 devices, each holding 16/n blocks.  Virtual devices
    are host threads, so on an m-core host the curve saturates at ~m;
    what the projection needs is the sub-core-count slope (the work
    division itself is exact and communication-free on dp)."""
    child = r"""
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np, jax
import jax.numpy as jnp
from rabbitkssd_tpu.params import KssdParams
from rabbitkssd_tpu.shuffle import generate_shuffle
from rabbitkssd_tpu.parallel.sharded import make_mesh, make_sharded_sketch_step

n = int(sys.argv[1])
params = KssdParams(half_k=10, half_subk=6, drlevel=3)
shuf = generate_shuffle(10, 6, 3)
table = jnp.asarray(shuf.shuffled_dim.astype(np.int32))
block, total_blocks, cap = 1 << 17, 16, 16384
halo = params.kmer_size - 1
rng = np.random.default_rng(0)
rows = rng.integers(0, 4, size=(total_blocks, block + halo), dtype=np.int8)
mesh = make_mesh(n)
step = make_sharded_sketch_step(params, mesh, total_blocks // n, block, cap)
out = step(rows, table)
jax.block_until_ready(out)
t0 = time.time()
iters = 5
for _ in range(iters):
    out = step(rows, table)
jax.block_until_ready(out)
dt = (time.time() - t0) / iters
print("MBASE", round(total_blocks * block / 1e6 / dt, 1))
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    base = None
    for n in (1, 2, 4, 8):
        r = subprocess.run([sys.executable, "-c", child, str(n)],
                           capture_output=True, text=True, env=env,
                           timeout=1200)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("MBASE")]
        if not line:
            emit(f"dp_scaling:n{n}", error=r.stderr[-400:])
            continue
        v = float(line[0].split()[1])
        base = base or v
        emit(f"dp_scaling:n{n}", mbase_per_s=v,
             speedup=round(v / base, 2))


def probe_phase_budget() -> None:
    """Itemized budget of the config-1 WARM sketch wall (the one phase
    the reference wins same-host, VERDICT r4 item 1): runs bench.py's
    corpus through a prewarmed DeviceSketcher and prints the
    per-component accumulators from sketch_codes plus derived rates.

    The pipeline is three threads (producer: feed+H2D; consumer:
    dispatch; flusher: readback+finalize), so components overlap — the
    bottleneck role is the one whose busy time ~= the wall."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", bench)
    spec.loader.exec_module(bench)

    from rabbitkssd_tpu.ops import _config
    from rabbitkssd_tpu.shuffle import read_shuffle_file
    from rabbitkssd_tpu.engine.sketcher import sketch_file_list

    list_path = bench.ensure_corpus()
    shuf_path = bench.ensure_shuffle()
    _config.wait_warm()
    sk = bench.prewarm_ours(shuf_path)
    if sk is None:
        emit("phase_budget", skipped="multi-device backend")
        return
    shuf = read_shuffle_file(shuf_path)
    t0 = time.time()
    out = sketch_file_list(list_path, shuf, sketcher=sk)
    wall = time.time() - t0
    total_bases = sum(s.size for s in out.sketches)  # survivors only
    b = dict(sk.last_budget)
    mb = b["h2d_bytes"] / 1e6
    emit("phase_budget", wall_s=round(wall, 3),
         corpus_mbase=round(bench.N_GENOMES * bench.GENOME_LEN / 1e6, 1),
         **{k: v for k, v in b.items() if k != "wall"},
         sketch_codes_wall=b["wall"],
         h2d_mb=round(mb, 1),
         h2d_link_mb_s=round(mb / max(b["h2d_put"] + b["h2d_wait"], 1e-9),
                             1),
         producer_busy=round(b["feed"] + b["h2d_put"] + b["h2d_wait"], 3),
         consumer_busy=round(b["dispatch"], 3),
         flusher_busy=round(b["flush_scalars"] + b["flush_collect"]
                            + b["finalize"], 3))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=32)
    ap.add_argument("--length", type=int, default=2_000_000)
    ap.add_argument("--host-only", action="store_true")
    ap.add_argument("--device-only", action="store_true")
    ap.add_argument("--dp-scaling", action="store_true",
                    help="fixed-work sharded-sketch scaling over 1/2/4/8"
                         "-device virtual CPU meshes (subprocesses)")
    ap.add_argument("--phase-budget", action="store_true",
                    help="itemized warm config-1 sketch wall budget")
    args = ap.parse_args()

    if args.dp_scaling:
        probe_dp_scaling()
        return 0
    if args.phase_budget:
        probe_phase_budget()
        return 0

    files = ensure_corpus(args.genomes, args.length)
    if not args.device_only:
        probe_host(files)
    if args.host_only:
        return 0
    if not device_healthy():
        emit("device", skipped="accelerator unhealthy/unreachable")
        return 0
    probe_device(files)
    return 0


if __name__ == "__main__":
    sys.exit(main())
