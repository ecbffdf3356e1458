"""N1 probe confirmation: reversed order + chunked B=64 + B=1."""
import json, sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import flagship_spec
from bench import sustained_msps
from pycusdr_tpu.dsp.block import build_process_block
import pycusdr_tpu.ops.cfft as cfft

spec = flagship_spec()
out = {}

def run(tag, bias, B, **kw):
    cfft.FOUR_STEP_N1_LOG_BIAS = bias
    chunked = kw.pop("chunked", False)
    core = build_process_block(spec, jit=False, **kw)
    out[tag] = round(sustained_msps(core, spec, B, chunked=chunked,
                                    **({"T": 100} if B == 1 else {})), 1)
    print(json.dumps(out), flush=True)

run("b16_bias1", 1, 16)
run("b16_bias0", 0, 16)
run("b64chunk_bias1", 1, 64, chunked=True)
run("b64chunk_bias0", 0, 64, chunked=True)
run("b1_bias1", 1, 1, latency_mode=True)
run("b1_bias0", 0, 1, latency_mode=True)
print(json.dumps({"metric": "n1_probe_confirm_r4", **out}))
