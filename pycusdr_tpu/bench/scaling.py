"""Multi-chip scaling efficiency harness.

BASELINE.json requires scaling efficiency measured at 1 chip / 1 host /
N>=2 hosts. This harness times the sharded (channel x dopp) demod step
over growing mesh sizes and reports throughput + efficiency relative to
the single-device baseline. On a CPU host it exercises the virtual
device mesh (an efficiency number there measures COLLECTIVE OVERHEAD
only — the virtual devices share one host's cores); on a pod slice the
same code measures real ICI scaling.

Measurement honesty (same discipline as ``bench.py``): timing uses T
scan-chained steps inside one jitted computation whose carry feeds each
iteration's input, closed by a host fetch of the final scalar —
``jax.block_until_ready`` returns before execution completes on the
tunnelled TPU backend here, so dispatch-loop timing would report the
enqueue rate, not the device.

Run: ``python -m pycusdr_tpu.bench.scaling [--devices 1 2 4 8]``
"""

import argparse
import json
import time

import numpy as np


def measure_step(spec, mesh, n_channels, T=10, repeats=3, vote=True):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pycusdr_tpu.parallel import build_sharded_demod_step

    step = build_sharded_demod_step(spec, mesh, vote=vote)
    rng = np.random.RandomState(0)
    blocks = rng.randn(n_channels, 2, spec.Nfft).astype(np.float32)
    d = jax.device_put(blocks, NamedSharding(mesh, P("channel", None, None)))

    @jax.jit
    def bench_fn(blocks):
        def body(c, _):
            out = step(blocks + c * jnp.float32(1e-30))
            c2 = (c + out["bits"].sum().astype(jnp.float32) * jnp.float32(1e-30)
                  + out["spSym"].sum() * jnp.float32(1e-30))
            return c2, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=T)
        return c

    float(bench_fn(d))  # compile + warm

    def once():
        t0 = time.perf_counter()
        float(bench_fn(d))  # fetch = proof of execution
        return time.perf_counter() - t0

    samples = n_channels * (spec.Nfft - spec.sigOverlap) * T
    return samples, once


def run_scaling(device_counts=(1, 2, 4, 8), spec=None, channels_per_device=1):
    import jax

    from pycusdr_tpu.parallel import choose_mesh

    if spec is None:
        import __graft_entry__ as g

        spec = g.tiny_spec() if jax.default_backend() == "cpu" else g.flagship_spec()

    avail = len(jax.devices())
    results = []
    base_per_dev = None
    for n in device_counts:
        if n > avail:
            break
        mesh = choose_mesh(n, jax.devices()[:n])
        nc = mesh.shape["channel"] * channels_per_device
        # same graph minus the diversity-vote all_gather+vote (the only
        # channel-axis collective): the delta is the collective's cost.
        # On a virtual CPU mesh (devices share host cores) per-device
        # "efficiency" measures core contention, NOT scaling — the
        # vote_overhead column is the honest virtual-mesh metric; real
        # ICI efficiency needs a pod slice. Both variants are timed
        # interleaved (best-of over alternating calls) so host drift
        # hits them equally.
        smp_v, once_v = measure_step(spec, mesh, nc)
        smp_n, once_n = measure_step(spec, mesh, nc, vote=False)
        tv, tn = np.inf, np.inf
        for _ in range(8):  # interleaved so host drift hits both equally
            tv = min(tv, once_v())
            tn = min(tn, once_n())
        sps = smp_v / tv
        sps_novote = smp_n / tn
        if base_per_dev is None:
            base_per_dev = sps / n  # first measured count is the baseline
        eff = (sps / n) / base_per_dev
        results.append({"devices": n, "Msamples_per_s": round(sps / 1e6, 3),
                        "efficiency": round(eff, 3),
                        "vote_overhead_pct": round(
                            max(0.0, (1.0 - sps / sps_novote)) * 100, 1)})
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    for row in run_scaling(tuple(args.devices)):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
