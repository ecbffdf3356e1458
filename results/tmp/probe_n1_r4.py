"""Four-step N1-factorization probe at B=16 (fused bank, split4)."""
import json, sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import flagship_spec
from bench import sustained_msps
from pycusdr_tpu.dsp.block import build_process_block
import pycusdr_tpu.ops.cfft as cfft

spec = flagship_spec()
out = {}
for bias in (0, 1, -1, 2):
    cfft.FOUR_STEP_N1_LOG_BIAS = bias
    core = build_process_block(spec, jit=False)
    out[f"bias{bias}_n1_{cfft._pick_n1(spec.Nfft)}"] = round(
        sustained_msps(core, spec, 16, chunked=False), 1)
    print(json.dumps(out), flush=True)
cfft.FOUR_STEP_N1_LOG_BIAS = 0
print(json.dumps({"metric": "n1_probe_b16_r4", **out}))
