"""Interleaved A/B: 8-col padded slot-gather source vs the 2-col one,
full graph, production shapes."""
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
    dk.GATHER_PAD_COLS = 8
    fa = builder(); a1, a2 = chains(fa, B, T); float(a1()); float(a2())
    dk.GATHER_PAD_COLS = 2
    fb = builder(); b1, b2 = chains(fb, B, T); float(b1()); float(b2())
    dk.GATHER_PAD_COLS = 8
    sa, sb, r = measure_ab(a1, a2, b1, b2, T, repeats=15)
    res[shape] = {"pad8_msps": round(B * eff / sa / 1e6, 1),
                  "pad2_msps": round(B * eff / sb / 1e6, 1),
                  "pad2_over_pad8_time": round(r, 4)}
    print(json.dumps(res), flush=True)
print(json.dumps({"metric": "pad_probe_r4", **res}))
