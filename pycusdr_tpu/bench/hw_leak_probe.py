"""Host->device transfer-leak isolation probe (round-4 soak finding).

The 45-minute RSS-trended soak (``streaming_rt --rss-trend``) showed the
demod child growing linearly 0.8 -> 24 GB (~512 KB per block — exactly
the block-input transfer size) while the harness, modulator, and decoder
stayed flat. This probe isolates where:

* ``np_input``           — dispatch the jitted graph on a fresh numpy
                           block each call (what streaming does);
* ``reused_device_input``— same graph, ONE device-resident input reused;
* ``deleted_device_input``— explicit ``device_put`` + ``.delete()``;
* ``tiny_jit``           — a minimal ``jit(lambda a: (a*2).sum())``
                           on the same numpy block (rules our graph out).

Measured on the axon TPU tunnel: np_input leaks ~513 KB/iter, the
reused device input leaks 0, ``.delete()`` does not help, and the tiny
jit leaks identically -> the leak is the AXON CLIENT retaining every
host->device transfer buffer, not this framework (the true CPU backend
— ``jax.config.update('jax_platforms','cpu')``, the env var alone is
overridden by the axon sitecustomize — measures ~11 KB/iter). Until the
plugin is fixed, bound long passes with ``Main.maxWorkerRssMb``
(planned demod-child restart; see runtime/orchestrator.py).

Run:  python -m pycusdr_tpu.bench.hw_leak_probe [--iters 200]
"""

import argparse
import json
import os


def rss_mb():
    import psutil

    return psutil.Process(os.getpid()).memory_info().rss / 1e6


def probe(name, body, iters):
    body()  # settle / compile
    r0 = rss_mb()
    for _ in range(iters):
        body()
    kb = (rss_mb() - r0) / iters * 1000
    print(json.dumps({"probe": name, "kb_per_iter": round(kb, 1)}), flush=True)
    return kb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import numpy as np

    from __graft_entry__ import flagship_spec
    from pycusdr_tpu.dsp.block import build_process_block

    print(json.dumps({"backend": jax.default_backend()}))
    spec = flagship_spec()
    fn = build_process_block(spec, jit=True, latency_mode=True, packed=True)
    x = np.random.RandomState(0).randn(2, spec.Nfft).astype(np.float32)
    np.asarray(fn(x))  # compile

    tiny = jax.jit(lambda a: (a * 2).sum())
    float(tiny(x))

    probe("np_input", lambda: np.asarray(fn(x)), args.iters)

    xd = jax.device_put(x)
    probe("reused_device_input", lambda: np.asarray(fn(xd)), args.iters)

    def deleted():
        d = jax.device_put(x)
        r = np.asarray(fn(d))
        d.delete()
        return r

    probe("deleted_device_input", deleted, args.iters)
    probe("tiny_jit", lambda: float(tiny(x)), args.iters)


if __name__ == "__main__":
    main()
