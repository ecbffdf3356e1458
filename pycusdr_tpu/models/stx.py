"""STX (S-band) radio backend: spike thresholding on, no Doppler search
(fixed IF offset shift).

Capability parity with ``pyCuSDR/demodulator/STX.py:6-24``.
"""

import dataclasses

from pycusdr_tpu.dsp.spec import build_spec
from pycusdr_tpu.models.demodulator import Demodulator as _Base


class Demodulator(_Base):
    def __init__(self, conf, protocol, radioName, jit: bool = True):
        spec = build_spec(conf, protocol, radioName)
        spec = dataclasses.replace(spec, doppler_search=False, disable_peak_thresholding=False)
        super().__init__(conf, protocol, radioName, spec=spec, jit=jit)
