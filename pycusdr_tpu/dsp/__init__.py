from pycusdr_tpu.dsp.spec import DemodSpec, build_spec
from pycusdr_tpu.dsp.reference import demod_block_numpy
from pycusdr_tpu.dsp.block import build_process_block

__all__ = ["DemodSpec", "build_spec", "demod_block_numpy", "build_process_block"]
