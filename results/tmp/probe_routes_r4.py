"""Route A/B probes at the production B=16 shape with the FUSED bank
(round 4): slot-select routes, window-scan routes, four-step block
route, bf16 operands. Paired scan-chain discipline via bench.sustained_msps."""
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from __graft_entry__ import flagship_spec
from bench import sustained_msps
from pycusdr_tpu.dsp.block import build_process_block
import pycusdr_tpu.ops.cfft as cfft

spec = flagship_spec()
out = {}

def probe(name, **kw):
    core = build_process_block(spec, jit=False, **kw)
    msps = sustained_msps(core, spec, 16, chunked=False)
    out[name] = round(msps, 1)
    print(json.dumps({name: out[name]}), flush=True)

probe("gather")                                   # shipped default
probe("grouped", select_route="grouped")
probe("blockscan_gather", centres_route="blockscan")
probe("bf16", fft_dtype="bfloat16")

cfft.FOUR_STEP_ROUTE = "block"
try:
    probe("fourstep_block")
finally:
    cfft.FOUR_STEP_ROUTE = "split4"

print(json.dumps({"metric": "route_probe_b16_fused_r4", **out}))
