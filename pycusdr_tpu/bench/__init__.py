"""Benchmark harnesses: BER-vs-Eb/N0 acceptance sweep and throughput."""

from pycusdr_tpu.bench.ber import run_ber_sweep  # noqa: F401
