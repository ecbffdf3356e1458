"""UHF radio backend: full Doppler search, spike thresholding disabled.

Capability parity with ``pyCuSDR/demodulator/UHF.py:5-20``.
"""

import dataclasses

from pycusdr_tpu.dsp.spec import build_spec
from pycusdr_tpu.models.demodulator import Demodulator as _Base


class Demodulator(_Base):
    def __init__(self, conf, protocol, radioName, jit: bool = True):
        spec = build_spec(conf, protocol, radioName)
        spec = dataclasses.replace(spec, doppler_search=True, disable_peak_thresholding=True)
        super().__init__(conf, protocol, radioName, spec=spec, jit=jit)
