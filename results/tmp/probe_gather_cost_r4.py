"""Cost-model probe: how much does the symbol-slot row GATHER cost in
the full graph? B-arm replaces jnp.take(packed, A) with a contiguous
prefix read (INVALID results, identical traffic shape minus the
scatter) — interleaved in-window A/B."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import flagship_spec
from pycusdr_tpu.bench.profile_stages import measure_ab
from pycusdr_tpu.dsp.block import build_process_block, build_process_batch
import pycusdr_tpu.ops.demod_kernels as dk
from pycusdr_tpu.ops.cfft import c2ri

spec = flagship_spec()
eff = spec.Nfft - spec.sigOverlap

def chains(fn, B, T):
    rng = np.random.RandomState(1)
    blocks = np.stack([c2ri((rng.randn(spec.Nfft) + 1j * rng.randn(spec.Nfft)
                             ).astype(np.complex64)) for _ in range(B)])
    d = jax.device_put(blocks)
    def make(Tn):
        @jax.jit
        def f(batch):
            def body(c, _):
                out = fn(batch + c * jnp.float32(1e-30))
                used = (out["bits"].sum().astype(jnp.float32)
                        + out["symbols"].sum().astype(jnp.float32)
                        + out["centres"].sum().astype(jnp.float32)
                        + out["mags"].sum() + out["doppler_hz"].sum())
                return c + used * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=Tn)
            return c
        return f
    return (lambda f1=make(T): f1(d)), (lambda f2=make(2 * T): f2(d))

res = {}
for shape, B, T, builder in (
    ("b16_vmap", 16, 10, lambda: jax.vmap(build_process_block(spec, jit=False))),
    ("b64_chunk", 64, 5, lambda: build_process_batch(spec, jit=False)),
):
    fa = builder()
    a1, a2 = chains(fa, B, T)
    # B arm: contiguous prefix instead of the slot gather (cost model)
    orig = jnp.take
    def contig_take(arr, idx, axis=0, **kw):
        if axis == 0 and getattr(idx, "ndim", 0) == 1 and arr.ndim == 2:
            return jax.lax.dynamic_slice_in_dim(arr, 0, idx.shape[0], 0)
        return orig(arr, idx, axis=axis, **kw)
    dk.jnp.take = contig_take
    try:
        fb = builder()
        b1, b2 = chains(fb, B, T)
        # TRACE while patched: jnp.take is read at trace time, which
        # happens at the first jitted call, not at build
        float(b1())
        float(b2())
    finally:
        dk.jnp.take = orig
    sa, sb, r = measure_ab(a1, a2, b1, b2, T, repeats=15)
    res[shape] = {"gather_msps": round(B * eff / sa / 1e6, 1),
                  "contig_msps": round(B * eff / sb / 1e6, 1),
                  "contig_over_gather_time": round(r, 4),
                  "gather_cost_us_per_block": round((sa - sb) / B * 1e6, 1)}
    print(json.dumps(res), flush=True)
print(json.dumps({"metric": "gather_cost_r4", **res}))
