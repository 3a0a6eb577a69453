"""Native C++ host components vs their Python fallbacks."""

import gzip
import os

import numpy as np
import pytest

from rabbitkssd_tpu.native import fasta_codes, load_native
from rabbitkssd_tpu.ops.kmer import encode_concat
from rabbitkssd_tpu.seqio import read_records

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module", autouse=True)
def native_available():
    if load_native() is None:
        pytest.skip("native toolchain unavailable")


def _python_codes(path, least_qual=0):
    recs = [(r.seq, r.qual) for r in read_records(path)]
    return encode_concat(recs, least_qual)


@pytest.mark.parametrize("name", ["g0.fna", "g3.fna", "r0.fq", "r1.fq"])
def test_native_matches_python(name):
    path = os.path.join(GOLDEN, "genomes", name)
    got = fasta_codes(path)
    want = _python_codes(path)
    np.testing.assert_array_equal(got, want)


def test_native_fastq_quality():
    path = os.path.join(GOLDEN, "genomes", "r0.fq")
    got = fasta_codes(path, least_qual=40)
    want = _python_codes(path, least_qual=40)
    np.testing.assert_array_equal(got, want)


def test_native_gzip(tmp_path):
    src = os.path.join(GOLDEN, "genomes", "g1.fna")
    gz = str(tmp_path / "g1.fna.gz")
    with open(src, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    np.testing.assert_array_equal(fasta_codes(gz), _python_codes(src))


def test_native_edge_cases(tmp_path):
    p = str(tmp_path / "edge.fa")
    with open(p, "w") as f:
        f.write(">a\nACGT\nNNttGG\n\n>b empty\n>c\nA\n>d\r\nACgtN\r\n")
    np.testing.assert_array_equal(fasta_codes(p), _python_codes(p))
