from pycusdr_tpu.tx.modulator import Modulator
from pycusdr_tpu.tx.encoders import Encoder, CC11xxEncoder, RawEncoder
from pycusdr_tpu.tx.luts import BaseLUT, FSKmod, GFSK2mod, GMSKmod


class DataLengthError(ValueError):
    """Raised when a Tx payload exceeds the protocol's frame capacity."""


__all__ = [
    "Modulator",
    "Encoder",
    "CC11xxEncoder",
    "RawEncoder",
    "BaseLUT",
    "FSKmod",
    "GFSK2mod",
    "GMSKmod",
    "DataLengthError",
]
