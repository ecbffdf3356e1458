"""Control plane: XML-RPC monitoring/management server and the
hamlib-compatible rig server that lets gpredict steer Doppler."""

from pycusdr_tpu.control.rpc import RpcInterface, dummyModulator  # noqa: F401
from pycusdr_tpu.control.rig_server import Rig_server  # noqa: F401
from pycusdr_tpu.control.dummy_radios import DummyRadio  # noqa: F401
