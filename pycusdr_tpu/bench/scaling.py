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


def measure_step(spec, mesh, n_channels, T=10, repeats=3):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pycusdr_tpu.parallel import build_sharded_demod_step

    step = build_sharded_demod_step(spec, mesh)
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
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(bench_fn(d))  # fetch = proof of execution
        best = min(best, time.perf_counter() - t0)
    samples = n_channels * (spec.Nfft - spec.sigOverlap) * T
    return samples / best


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
        sps = measure_step(spec, mesh, nc)
        if base_per_dev is None:
            base_per_dev = sps / n  # first measured count is the baseline
        eff = (sps / n) / base_per_dev
        results.append({"devices": n, "Msamples_per_s": round(sps / 1e6, 3),
                        "efficiency": round(eff, 3)})
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
