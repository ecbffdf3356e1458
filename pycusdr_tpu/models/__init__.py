from pycusdr_tpu.models.demodulator import Demodulator
from pycusdr_tpu.models import uhf as UHF
from pycusdr_tpu.models import stx as STX
from pycusdr_tpu.models.tracking import DopplerTracker

__all__ = ["Demodulator", "UHF", "STX", "DopplerTracker"]
