#!/usr/bin/env python
"""Config 4 (BASELINE.md): mammal/metagenome scale — multi-GB genomes,
L3K12 shuffle (half_k=12, half_subk=6, drlevel=3 -> use64; the
reference REJECTS s=6 drlevel>=4: common.cpp:37-39 requires
half_subk-drlevel>=3, so L4K10 from init_shuffle.sh is unusable for
sketching even by the reference binary itself), chunked streaming.  Runs ours and the reference binary on the same corpus,
asserts per-genome sketch SET equality, records wall clock + peak RSS.

Corpus: two ~1 GB single-record genomes (forces the chunked streaming
reader: KSSD_STREAM_THRESHOLD default 1 GiB) + one multi-record file
with N runs and lowercase bases (edge cases at scale).

Usage: python scripts/config4_run.py [--genome-mb 1024]
Prints one JSON line with the numbers for the BASELINE.md config-4 row.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.environ.get("KSSD_BENCH_DIR", "/tmp/kssd_bench")
REF_BIN = os.environ.get("REF_BIN", "/tmp/refbuild/rabbit_kssd")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def write_fasta(path: str, parts: list[np.ndarray], names: list[str]) -> None:
    with open(path, "wb") as f:
        for name, seq in zip(names, parts):
            f.write(b">" + name.encode() + b"\n")
            rows = seq[: len(seq) - len(seq) % 100].reshape(-1, 100)
            nl = np.full((rows.shape[0], 1), ord("\n"), np.uint8)
            f.write(np.hstack([rows, nl]).tobytes())
            tailseq = seq[len(seq) - len(seq) % 100 :]
            if len(tailseq):
                f.write(tailseq.tobytes() + b"\n")


def ensure_corpus(genome_mb: int) -> str:
    root = os.path.join(BENCH_DIR, f"config4_{genome_mb}mb")
    list_path = os.path.join(root, "mammal.list")
    if os.path.exists(os.path.join(root, "DONE")):
        return list_path
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", np.uint8)
    n = genome_mb * 1_000_000
    files = []
    t0 = time.time()
    anc = rng.integers(0, 4, size=n + 64, dtype=np.int8)
    for g in range(2):
        seq = anc[: n - (g * 1024)].copy()
        n_mut = n // 100
        pos = rng.integers(0, len(seq), size=n_mut)
        seq[pos] = (seq[pos] + rng.integers(1, 4, size=n_mut)) % 4
        ascii_seq = bases[seq]
        for _ in range(16):  # N runs (window resets at scale)
            st = int(rng.integers(0, len(seq) - 200))
            ascii_seq[st : st + int(rng.integers(1, 120))] = ord("N")
        path = os.path.join(root, f"mammal{g}.fna")
        write_fasta(path, [ascii_seq], [f"chr{g}"])
        files.append(path)
    # multi-record file: 20 x 5 Mb contigs, some lowercase
    parts, names = [], []
    for r in range(20):
        seq = bases[rng.integers(0, 4, size=5_000_000, dtype=np.int8)]
        if r % 3 == 0:
            seq = np.frombuffer(seq.tobytes().lower(), np.uint8).copy()
        parts.append(seq)
        names.append(f"contig{r}")
    path = os.path.join(root, "contigs.fna")
    write_fasta(path, parts, names)
    files.append(path)
    with open(list_path, "w") as f:
        f.write("\n".join(files) + "\n")
    with open(os.path.join(root, "DONE"), "w") as f:
        f.write("ok")
    log(f"corpus built in {time.time()-t0:.1f}s: "
        f"{sum(os.path.getsize(p) for p in files)/1e9:.2f} GB")
    return list_path


def ensure_shuffle() -> str:
    path = os.path.join(BENCH_DIR, "L3K12.shuf")
    if not os.path.exists(path):
        from rabbitkssd_tpu.shuffle import generate_shuffle, write_shuffle_file

        write_shuffle_file(generate_shuffle(12, 6, 3), path)
    return path


def run_ours(list_path: str, shuf_path: str, warm: bool = True) -> dict:
    from rabbitkssd_tpu.formats import save_sketches
    from rabbitkssd_tpu.engine.sketcher import sketch_file_list
    from rabbitkssd_tpu.shuffle import read_shuffle_file

    shuf = read_shuffle_file(shuf_path)
    t0 = time.time()
    sk = sketch_file_list(list_path, shuf)
    cold_wall = time.time() - t0
    wall = cold_wall
    if warm:
        # the tunnel-attached chip pays a one-time D2H channel setup
        # (minutes) plus remote compiles on the FIRST run of a process;
        # the steady-state number is the second run
        t0 = time.time()
        sk = sketch_file_list(list_path, shuf)
        wall = time.time() - t0
    assert sk.use64, "L3K12 must select the 64-bit hash path"
    out = list_path + ".sketch"
    save_sketches(sk, out)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    return {"wall_s": round(wall, 2), "cold_wall_s": round(cold_wall, 2),
            "peak_rss_gb": round(peak_gb, 2), "sketch": out}


def run_reference(list_path: str, shuf_path: str) -> dict | None:
    if not os.path.exists(REF_BIN):
        log("reference binary missing; skipping baseline")
        return None
    root = os.path.dirname(list_path)
    out = os.path.join(root, "ref.sketch")
    import bench  # repo-root module

    # -t 2: both 1 GB files stay on the kseq small-file path (the stub
    # RabbitFX build aborts on the big-file path) and run in parallel
    wall, rss_kb, r = bench.run_measured(
        [REF_BIN, "sketch", "-L", shuf_path, "-i",
         os.path.basename(list_path), "-o", os.path.basename(out),
         "-t", "2", "-q"], cwd=root)
    if r.returncode != 0:
        log(f"reference failed: {r.stderr[-500:]}")
        return None
    return {"wall_s": round(wall, 2),
            "peak_rss_gb": round(rss_kb / 1e6, 2), "sketch": out}


def set_equal(ours_path: str, ref_path: str) -> bool:
    from rabbitkssd_tpu.formats import read_sketches

    ours, ref = read_sketches(ours_path), read_sketches(ref_path)
    if ours.info.id != ref.info.id:
        log(f"id mismatch {ours.info.id} != {ref.info.id}")
        return False
    by_name_o = {s.name: s.hashes for s in ours.sketches}
    by_name_r = {s.name: s.hashes for s in ref.sketches}
    if set(by_name_o) != set(by_name_r):
        log(f"genome name sets differ")
        return False
    for name in by_name_o:
        if not np.array_equal(np.sort(by_name_o[name]),
                              np.sort(by_name_r[name])):
            log(f"hash set mismatch for {name}: "
                f"{len(by_name_o[name])} vs {len(by_name_r[name])}")
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    # default 1200 MB: genome files (~1.21 GB each) must EXCEED the
    # 1 GiB KSSD_STREAM_THRESHOLD so the chunked streaming reader is
    # the path under test, not the one-shot reader
    ap.add_argument("--genome-mb", type=int, default=1200)
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    list_path = ensure_corpus(args.genome_mb)
    shuf_path = ensure_shuffle()
    ours = run_ours(list_path, shuf_path)
    log(f"ours: {ours}")
    ref = None if args.skip_ref else run_reference(list_path, shuf_path)
    log(f"reference: {ref}")
    equal = set_equal(ours["sketch"], ref["sketch"]) if ref else None
    total_mb = 2 * args.genome_mb + 100
    print(json.dumps({
        "config": 4,
        "corpus_mbase": total_mb,
        "ours_wall_s": ours["wall_s"],
        "ours_cold_wall_s": ours["cold_wall_s"],
        "ours_peak_rss_gb": ours["peak_rss_gb"],
        "ours_mbase_per_s": round(total_mb / ours["wall_s"], 1),
        "ref_wall_s": ref["wall_s"] if ref else None,
        "ref_peak_rss_gb": ref["peak_rss_gb"] if ref else None,
        "set_equal": equal,
    }))
    return 0 if (equal in (True, None)) else 1


if __name__ == "__main__":
    sys.exit(main())
