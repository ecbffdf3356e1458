"""Offline whole-capture reprocessing rate: strided-framing batch route
vs the sequential lax.scan route (VERDICT r3 #3).

Both processors demodulate K overlap-save hops per dispatch with the
carry chained on device; timing uses the same paired T-vs-2T scan-chain
+ host-fetch discipline as bench.py (the carry feeds each iteration, so
XLA cannot hoist the body, and every output family is consumed).

Run on the chip:  python -m pycusdr_tpu.bench.capture_probe
"""

import argparse
import json

import numpy as np


def capture_msps(route, K=32, T=5, repeats=7, spec=None):
    import jax
    import jax.numpy as jnp

    from pycusdr_tpu.bench.profile_stages import measure_paired
    from pycusdr_tpu.dsp.block import build_process_capture, build_process_stream

    if spec is None:
        from __graft_entry__ import flagship_spec

        spec = flagship_spec()

    build = {"capture": build_process_capture,
             "scan": build_process_stream}[route]
    fn = build(spec, jit=False)
    ov = spec.sigOverlap
    hop = spec.Nfft - ov

    rng = np.random.RandomState(3)
    hops = jax.device_put(rng.randn(K, 2, hop).astype(np.float32))
    carry0 = jax.device_put(rng.randn(2, ov).astype(np.float32))

    def make(Tn):
        @jax.jit
        def bench_fn(hops, carry0):
            def body(c, _):
                res, carry = fn(hops + c[0, 0] * jnp.float32(1e-30), c)
                used = (res["bits"].sum().astype(jnp.float32)
                        + res["trust"].sum().astype(jnp.float32)
                        + res["symbols"].sum().astype(jnp.float32)
                        + res["centres"].sum().astype(jnp.float32)
                        + res["mags"].sum()
                        + res["doppler_hz"].sum()
                        + jnp.nan_to_num(res["snr_db"], neginf=-1.0).sum())
                return carry + used * jnp.float32(1e-30), None

            c, _ = jax.lax.scan(body, carry0, None, length=Tn)
            return c.sum()

        return bench_fn

    f1, f2 = make(T), make(2 * T)
    per_iter = measure_paired(lambda: f1(hops, carry0),
                              lambda: f2(hops, carry0), T, repeats=repeats)
    return K * hop / per_iter / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--T", type=int, default=5)
    ap.add_argument("--routes", nargs="+", default=["capture", "scan"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pycusdr_tpu.utils.device_info import wait_for_backend

    wait_for_backend()
    res = {"metric": "whole_capture_reprocessing", "K": args.K}
    for r in args.routes:
        res[f"{r}_msps"] = round(capture_msps(r, K=args.K, T=args.T), 1)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
