"""Raw gather microbench: rows x width tradeoff for the slot read,
vmapped over B=16 lanes, paired scan-chain timing."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pycusdr_tpu.bench.profile_stages import measure_paired

B = 16
N = 65543
rng = np.random.RandomState(0)

def bench(rows_total, K, Wd, T=20):
    """take from (rows_total, Wd) at K sorted indices, per lane."""
    data = jax.device_put(rng.randn(B, rows_total, Wd).astype(np.float32))
    idx = np.sort(rng.randint(0, rows_total, (B, K))).astype(np.int32)
    idxd = jax.device_put(np.sort(idx, axis=1))

    def make(Tn):
        @jax.jit
        def f(data, idxd):
            def body(c, _):
                d2 = data + c * jnp.float32(1e-30)
                out = jax.vmap(lambda d, i: jnp.take(d, i, axis=0))(d2, idxd)
                return c + out.sum() * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=Tn)
            return c
        return f
    f1, f2 = make(T), make(2 * T)
    sec = measure_paired(lambda: f1(data, idxd), lambda: f2(data, idxd), T)
    return sec / B * 1e6  # us per lane

out = {}
for rows_total, K, Wd in (
    (N, 4608, 2),      # the shipped slot read
    (N, 4608, 8),      # wider payload rows
    (N // 8, 576, 16),  # 8 slots per row, narrow
    (N // 8, 576, 512), # grouped-patch shape (width 2 tiles x 2 cols)
    (N // 16, 288, 1024),
    (N // 4, 1152, 256),
    (N, 4608, 1),
):
    key = f"rows{K}_w{Wd}"
    out[key] = round(bench(rows_total, K, Wd), 1)
    print(json.dumps({key: out[key]}), flush=True)
print(json.dumps({"metric": "gather_shapes_b16_r4", **out}))
