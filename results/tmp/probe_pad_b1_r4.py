"""Interleaved pad8-vs-pad2 at B=1 (latency graph)."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import flagship_spec
from pycusdr_tpu.bench.profile_stages import measure_ab
from pycusdr_tpu.dsp.block import build_process_block
from pycusdr_tpu.ops.cfft import c2ri

spec = flagship_spec()
eff = spec.Nfft - spec.sigOverlap
T = 100
rng = np.random.RandomState(1)
d = jax.device_put(np.stack([c2ri((rng.randn(spec.Nfft) + 1j * rng.randn(spec.Nfft)).astype(np.complex64))]))

def chains(fn):
    vf = jax.vmap(fn)
    def make(Tn):
        @jax.jit
        def f(batch):
            def body(c, _):
                out = vf(batch + c * jnp.float32(1e-30))
                used = (out["bits"].sum().astype(jnp.float32)
                        + out["symbols"].sum().astype(jnp.float32)
                        + out["centres"].sum().astype(jnp.float32)
                        + out["mags"].sum() + out["doppler_hz"].sum())
                return c + used * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=Tn)
            return c
        return f
    return (lambda f1=make(T): f1(d)), (lambda f2=make(2 * T): f2(d))

a1, a2 = chains(build_process_block(spec, jit=False, latency_mode=True, gather_pad=8))
b1, b2 = chains(build_process_block(spec, jit=False, latency_mode=True))
sa, sb, r = measure_ab(a1, a2, b1, b2, T, repeats=15)
print(json.dumps({"metric": "pad_b1_r4",
                  "pad8_msps": round(eff / sa / 1e6, 1),
                  "pad2_msps": round(eff / sb / 1e6, 1),
                  "pad2_over_pad8_time": round(r, 4)}))
