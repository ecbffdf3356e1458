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
