"""Deeper drift-robust fused-vs-p2: both label orders, B=16 whole-vmap
and B=64 chunked (the production path), 15 in-window pairs each."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import flagship_spec
from pycusdr_tpu.bench.profile_stages import measure_ab
from pycusdr_tpu.dsp.block import build_process_block, build_process_batch
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
                        + out["trust"].sum().astype(jnp.float32)
                        + out["symbols"].sum().astype(jnp.float32)
                        + out["centres"].sum().astype(jnp.float32)
                        + out["mags"].sum() + out["doppler_hz"].sum()
                        + jnp.nan_to_num(out["snr_db"], neginf=-1.0).sum())
                return c + used * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=Tn)
            return c
        return f
    f1, f2 = make(T), make(2 * T)
    return (lambda: f1(d)), (lambda: f2(d))

res = {}
for shape, B, T, builder in (
    ("b16_vmap", 16, 10, lambda kw: jax.vmap(build_process_block(spec, jit=False, **kw))),
    ("b64_chunk", 64, 5, lambda kw: build_process_batch(spec, jit=False, **kw)),
):
    fa = builder({})               # fused (default)
    fb = builder({"bank_route": "p2"})
    a1, a2 = chains(fa, B, T)
    b1, b2 = chains(fb, B, T)
    sa, sb, r = measure_ab(a1, a2, b1, b2, T, repeats=15)
    res[f"{shape}_fwd"] = {"fused_msps": round(B * eff / sa / 1e6, 1),
                           "p2_msps": round(B * eff / sb / 1e6, 1),
                           "p2_over_fused_time": round(r, 4)}
    print(json.dumps(res), flush=True)
    sa2, sb2, r2 = measure_ab(b1, b2, a1, a2, T, repeats=15)  # label swap
    res[f"{shape}_rev"] = {"p2_msps": round(B * eff / sa2 / 1e6, 1),
                           "fused_msps": round(B * eff / sb2 / 1e6, 1),
                           "fused_over_p2_time": round(r2, 4)}
    print(json.dumps(res), flush=True)
print(json.dumps({"metric": "ab2_fused_p2_r4", **res}))
