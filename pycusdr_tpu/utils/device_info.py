"""Device inventory helper.

Parity with the reference's GPU query (`lib/cudaConvertSMVer2Cores.py`,
used for kernel sizing): report what accelerators are attached and the
numbers that size our kernels (HBM, core kind, mesh shape hints).
"""

import logging

log = logging.getLogger("pycusdr_tpu." + __name__)


def device_inventory():
    """List of dicts describing each visible accelerator."""
    import jax

    out = []
    for d in jax.devices():
        info = {
            "id": d.id,
            "platform": d.platform,
            "device_kind": getattr(d, "device_kind", "unknown"),
            "process_index": d.process_index,
        }
        try:
            stats = d.memory_stats() or {}
            info["hbm_bytes"] = stats.get("bytes_limit")
            info["hbm_in_use"] = stats.get("bytes_in_use")
        except Exception:
            pass
        out.append(info)
    return out


def log_inventory():
    for info in device_inventory():
        log.info("device %s: %s (%s), HBM %s", info["id"], info["device_kind"],
                 info["platform"], info.get("hbm_bytes"))


def wait_for_backend(total_s=600, probe_s=60):
    """Fail fast (exit 1) instead of hanging forever when the tunnelled
    device backend is down: jax backend *init* blocks indefinitely
    during tunnel outages (observed 2026-08-17), so probe it in a
    subprocess with a hard timeout, retrying up to ``total_s`` seconds.
    Call this before any device work in a benchmark entry point."""
    import subprocess
    import sys
    import time

    deadline = time.monotonic() + total_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jax.jit(lambda x: (x*2).sum())(jnp.ones((4,4)))))"],
                timeout=probe_s, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print("device backend unreachable (tunnel down?); refusing to "
                  "hang", file=sys.stderr)
            sys.exit(1)
        time.sleep(20)
