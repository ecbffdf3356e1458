"""Observability: stats post-pass analytics and stage timer."""

import os

import numpy as np


def test_stats_process_data(tmp_path, bench_conf):
    from pycusdr_tpu.obs import stats

    n = 50
    worker = {
        "workerId": "test-UHF",
        "timestamp": (1e9 + np.arange(n)).tolist(),
        "count": np.arange(n).tolist(),
        "doppler": (1000 * np.sin(np.linspace(0, 3, n))).tolist(),
        "doppler_std": np.ones(n).tolist(),
        "spSymEst": (16 + 0.01 * np.random.randn(n)).tolist(),
        "SNR": (10 + np.random.randn(n)).tolist(),
        "numSyncSig": np.random.rand(n).tolist(),
        "packetSuc": np.random.randint(0, 2, n).tolist(),
        "numBits": (7000 * np.ones(n)).tolist(),
        "packetFail": np.zeros(n).tolist(),
        "baudRate": (9600 * np.ones(n)).tolist(),
        "numSlaves": np.random.randint(0, 3, n).tolist(),
    }
    paths = stats.processData(bench_conf, [worker], startTime=0,
                              log_folder=str(tmp_path))
    assert os.path.exists(paths[0])  # pickle dump
    base = paths[1]
    assert os.path.exists(base + "_stats.npz")
    assert os.path.exists(base + "_stats.pdf")
    d = np.load(base + "_stats.npz")
    assert len(d["rangerate"]) == n
    # rangerate = -doppler/Fc*c
    assert d["rangerate"][3] * worker["doppler"][3] <= 0


def test_stage_timer():
    from pycusdr_tpu.obs.profiling import StageTimer

    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()
