"""Smoke test of the subsystems hardware bench (bench/subsystems.py) at
tiny sizes on the CPU mesh: the channelizer tone-purity validity check
and the S-curve tracking pass must both run and report sane numbers."""

import numpy as np

from pycusdr_tpu.bench.subsystems import channelizer_bench, tracking_bench


def test_channelizer_bench_smoke():
    res = channelizer_bench(M=8, taps_per_branch=4, n_samples=1024,
                            batches=(1,), T=3)
    assert res["tone_purity"] > 0.9
    assert res["throughput"]["B1"]["wideband_msps"] > 0


def test_tracking_bench_smoke():
    import __graft_entry__ as g

    res = tracking_bench(spec=g.tiny_spec(), n_blocks=20, track_bins=8,
                         track_span_bins=16, time_graphs=True, T=3)
    assert res["lock_fraction_after_first"] > 0.5
    assert res["median_err_bins"] < 2.0
    assert res["track_bins"] < res["acquire_bins"]
    assert np.isfinite(res["track_speedup"])
