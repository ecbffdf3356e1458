"""Multi-host (2-process jax.distributed) execution of the sharded
demod + vote over a global mesh — the BASELINE "N>=2 hosts" check,
run as two real OS processes talking Gloo on localhost."""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r'''
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=proc_id)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import __graft_entry__ as g
from pycusdr_tpu.parallel import build_sharded_demod_step
from pycusdr_tpu.parallel.multihost import make_global_mesh

spec = g.tiny_spec()
mesh = make_global_mesh(dopp=2)
assert mesh.devices.size == 8  # 2 processes x 4 virtual devices
step = build_sharded_demod_step(spec, mesh)
nc = mesh.shape["channel"]

rng = np.random.RandomState(0)
blocks = rng.randn(nc, 2, spec.Nfft).astype(np.float32)
sharding = NamedSharding(mesh, P("channel", None, None))
local = sharding.addressable_devices_indices_map(blocks.shape)
arrs = [jax.device_put(blocks[idx], d) for d, idx in local.items()]
garr = jax.make_array_from_single_device_arrays(blocks.shape, sharding, arrs)

res = step(garr)
jax.block_until_ready(res)
voted = np.asarray(res["bits_voted"].addressable_data(0))
np.save(sys.argv[3] + "/voted_%d.npy" % proc_id, voted)
print("WORKER_OK", proc_id)
'''


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo localhost test")
def test_two_process_distributed_sharded_demod(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    port = "36100"
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), port, str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out, f"worker {i} failed:\n{out[-2000:]}"

    v0 = np.load(tmp_path / "voted_0.npy")
    v1 = np.load(tmp_path / "voted_1.npy")
    np.testing.assert_array_equal(v0, v1)  # replicated result agrees

    # cross-check against a single-process run of the same mesh shape
    import jax

    import __graft_entry__ as g
    from pycusdr_tpu.parallel import build_sharded_demod_step, make_mesh

    spec = g.tiny_spec()
    mesh = make_mesh({"channel": 4, "dopp": 2})
    step = build_sharded_demod_step(spec, mesh)
    rng = np.random.RandomState(0)
    blocks = rng.randn(4, 2, spec.Nfft).astype(np.float32)
    ref = np.asarray(step(blocks)["bits_voted"])
    np.testing.assert_array_equal(v0, ref)
