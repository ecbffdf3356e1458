"""BER benchmark CLI (parity with the reference
``examples/benchmark/bench_modem.py`` + ``README.md`` run recipe):

    python examples/benchmark/bench_modem.py FSK 10 5 20 1 [--demods N]

sweeps SNR from 5 to 20 dB in 1 dB steps with 10 packets per point,
driving a full in-process modem, and writes
``bench_logs/<stamp>_bench_results_FSK.npz``.
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("modulation", choices=["FSK", "GFSK", "GMSK", "BPSK"])
    p.add_argument("nRuns", type=int)
    p.add_argument("snr_low", type=float)
    p.add_argument("snr_high", type=float)
    p.add_argument("snr_step", type=float)
    p.add_argument("--demods", type=int, default=1)
    p.add_argument("--out-dir", default="bench_logs")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    if args.cpu:
        os.environ["PYCUSDR_JAX_PLATFORM"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pycusdr_tpu.bench.ber import run_ber_sweep

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-16s %(message)s")
    os.makedirs(args.out_dir, exist_ok=True)
    stamp = time.strftime("%Y_%m_%d_%H_%M", time.gmtime())
    out = os.path.join(args.out_dir, f"{stamp}_bench_results_{args.modulation}")

    snrs = np.arange(args.snr_low, args.snr_high + args.snr_step, args.snr_step)
    res = run_ber_sweep(args.modulation, args.nRuns, snrs,
                        nDemodulators=args.demods, out_path=out)
    for s, e, n, b in zip(res["SNR"], res["EBN0"], res["numPackets"], res["BER"]):
        print(f"SNR {s:5.1f} dB\tEb/N0 {e:5.2f} dB\tpackets {n}\tavg BER {b:.5g}")


if __name__ == "__main__":
    main()
