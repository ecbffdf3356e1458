"""Drift-robust interleaved A/B of the round-4 headline claims:
fused-vs-p2 bank route and bf16-vs-f32 operands, at B=16."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import flagship_spec
from pycusdr_tpu.bench.profile_stages import measure_ab
from pycusdr_tpu.dsp.block import build_process_block
from pycusdr_tpu.ops.cfft import c2ri

spec = flagship_spec()
B, T = 16, 10
rng = np.random.RandomState(1)
blocks = np.stack([c2ri((rng.randn(spec.Nfft) + 1j * rng.randn(spec.Nfft)
                         ).astype(np.complex64)) for _ in range(B)])
d = jax.device_put(blocks)

def chains(core):
    vf = jax.vmap(core)
    def make(Tn):
        @jax.jit
        def f(batch):
            def body(c, _):
                out = vf(batch + c * jnp.float32(1e-30))
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

eff = spec.Nfft - spec.sigOverlap
res = {}
for name, kwA, kwB in (
    ("fused_vs_p2", {}, {"bank_route": "p2"}),
    ("f32_vs_bf16", {}, {"fft_dtype": "bfloat16"}),
):
    a1, a2 = chains(build_process_block(spec, jit=False, **kwA))
    b1, b2 = chains(build_process_block(spec, jit=False, **kwB))
    sa, sb, r = measure_ab(a1, a2, b1, b2, T)
    res[name] = {"A_msps": round(B * eff / sa / 1e6, 1),
                 "B_msps": round(B * eff / sb / 1e6, 1),
                 "ratio_B_over_A": round(r, 4)}
    print(json.dumps({name: res[name]}), flush=True)
print(json.dumps({"metric": "ab_interleaved_b16_r4", **res}))
