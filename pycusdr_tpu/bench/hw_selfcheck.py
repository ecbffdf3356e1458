"""On-hardware numerical selfcheck — run on the REAL device backend.

The CI suite runs on the CPU backend, where every matmul is true f32 —
it is structurally unable to catch TPU-only precision hazards. This
check exists because of one that shipped: the "bit-exact" one-hot slot
select quantized its packed integer payloads at the TPU's default
matmul precision (operands truncated toward bfloat16), so every
latency-mode (streaming) block carried garbage bits on real hardware
while all 200+ CPU tests stayed green. Fixed with
``precision=HIGHEST`` (ops/demod_kernels.py ``_select_rows_onehot``);
this script pins the guarantee ON THE CHIP:

1. latency-mode graph == batch-mode graph, bit for bit, on a real
   CC11xx burst block (they differ only in exactness-critical routes);
2. the full decode chain finds and CRC-checks the packet from BOTH
   graphs' bits;
3. packed single-vector outputs decode to the dict graph's outputs.

Run: python -m pycusdr_tpu.bench.hw_selfcheck   (expects a TPU; works
on any backend). Prints one PASS/FAIL line per check and exits nonzero
on failure.
"""

import sys

import numpy as np


def main():
    from pycusdr_tpu.config.loader import load_modular_json
    from pycusdr_tpu.decode import Decoder
    from pycusdr_tpu.dsp.block import build_process_block, unpack_block_outputs
    from pycusdr_tpu.dsp.spec import build_spec
    from pycusdr_tpu.ops.cfft import c2ri
    from pycusdr_tpu.protocol import loadProtocol
    from pycusdr_tpu.tx.modulator import Modulator
    from pycusdr_tpu.utils.device_info import wait_for_backend
    import os

    wait_for_backend()
    import jax

    print(f"backend: {jax.devices()[0]}")
    conf = load_modular_json(os.path.join(
        os.path.dirname(__file__), "..", "config", "configs", "CC11xx.json"))
    protocol = loadProtocol("CC11xx")(conf=conf)
    spec = build_spec(conf, protocol, "UHF-H")
    mod = Modulator(conf, conf["Radios"]["Tx"]["UHF"], protocol)
    # 16-byte payload: the whole burst (preamble+sync+len+16+CRC at
    # 128 sp/sym = ~34k samples) must fit INSIDE one block for the
    # single-block decode check (a 48-byte burst would span two blocks
    # and need the streaming healer, which this check deliberately
    # bypasses)
    payload = np.random.RandomState(1234).randint(0, 256, 16).astype(np.uint8)
    wave = np.asarray(mod.encodeAndModulate(payload.tobytes()), np.complex64)
    rng = np.random.RandomState(7)
    block = (0.05 * (rng.randn(spec.Nfft) + 1j * rng.randn(spec.Nfft))
             ).astype(np.complex64)
    start = 2048
    block[start:start + len(wave)] += wave[: spec.Nfft - start]
    x = c2ri(block)

    lat = build_process_block(spec, jit=True, latency_mode=True, packed=True)
    bat = build_process_block(spec, jit=True, latency_mode=False, packed=True)
    bat_dict = build_process_block(spec, jit=True, latency_mode=False)
    rl = unpack_block_outputs(np.asarray(lat(x)), spec)
    rb = unpack_block_outputs(np.asarray(bat(x)), spec)
    rd = {k: np.asarray(v) for k, v in bat_dict(x).items()}

    failed = 0

    def check(name, ok):
        nonlocal failed
        print(f"{'PASS' if ok else 'FAIL'}  {name}")
        failed += 0 if ok else 1

    n = int(rl["nBits"])
    check("latency == batch graph (bits/symbols/centres/mags, bit-exact)",
          n == int(rb["nBits"]) and all(
              np.array_equal(np.asarray(rl[k])[:n], np.asarray(rb[k])[:n])
              for k in ("bits", "trust", "symbols", "centres", "mags")))
    check("packed == dict graph outputs",
          all(np.array_equal(np.asarray(rb[k]).astype(np.float32),
                             np.asarray(rd[k]).astype(np.float32))
              for k in ("bits", "trust", "symbols", "centres", "mags")))

    # CC11xx end-detection is FIXED length (267 bytes of air frame), so
    # the frame finder must be fed several blocks past the burst before
    # it emits — stream the burst block plus noise-floor followers
    # through each graph and chain the decoder across them.
    followers = [c2ri((0.05 * (rng.randn(spec.Nfft)
                               + 1j * rng.randn(spec.Nfft))
                       ).astype(np.complex64)) for _ in range(5)]
    for name, g in (("latency", lat), ("batch", bat)):
        dec = Decoder(conf.get("decoder", {}), protocol)
        ok = False
        for blk in [x] + followers:
            r = unpack_block_outputs(np.asarray(g(blk)), spec)
            pkts, _, _ = dec.findFrames(
                np.asarray(r["bits"])[: int(r["nBits"])], 0)
            for p in pkts:
                data, crcErr, _ = p.getBinaryData()
                if not crcErr and np.array_equal(np.asarray(data), payload):
                    ok = True
        check(f"{name}-mode bits decode the CC11xx packet CRC-clean", ok)

    if failed:
        print(f"{failed} selfcheck(s) FAILED")
        return 1
    print("all hardware selfchecks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
