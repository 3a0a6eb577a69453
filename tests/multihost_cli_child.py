"""Child for the 2-process CLI end-to-end test (CPU backend).

Runs the REAL CLI surface (`rabbitkssd_tpu.cli.main`) under
jax.distributed: ``sketch`` then ``alldist`` on the corpus the parent
prepared (argv[1] = genome list, argv[2] = .shuf file, argv[3] = output
directory private to this process).  Every process computes replicated
results (read_array gathers across hosts) and writes its own artifact
copies; the parent asserts all copies are byte-identical to a
single-process run — the pod-scale execution contract of BASELINE
config 5 proven through the user-facing entry point, not per-function.
"""

import os
import sys

from rabbitkssd_tpu.cli import main

list_path, shuf_path, outdir = sys.argv[1:4]
os.makedirs(outdir, exist_ok=True)
sketch_out = os.path.join(outdir, "corpus.sketch")
dist_out = os.path.join(outdir, "corpus.alldist")

rc = main(["sketch", "-L", shuf_path, "-i", list_path, "-o", sketch_out])
assert rc == 0, f"sketch failed with {rc}"
rc = main(["alldist", "-i", sketch_out, "-L", shuf_path,
           "-o", dist_out, "-D", "1.0"])
assert rc == 0, f"alldist failed with {rc}"
print("CLI-OK", flush=True)
sys.exit(0)
