from pycusdr_tpu.utils.filters import rrcosfilter, gaussian_filter
from pycusdr_tpu.utils.shift_registers import pn9, ssrg, barker_code
from pycusdr_tpu.utils.crc import crc16_cc, crc16_bytes_le
from pycusdr_tpu.utils.xcorr import custom_xcorr, custom_xcorr_fast
from pycusdr_tpu.utils.doppler import rangerate_from_freq, freq_from_rangerate
from pycusdr_tpu.utils.gmsk import gmsk_mod
from pycusdr_tpu.utils.binops import pack_bits_msb, unpack_bits_msb
from pycusdr_tpu.utils.graceful import GracefulKiller
from pycusdr_tpu.utils.nrzs import encode_nrzs, decode_nrzs

__all__ = [
    "rrcosfilter",
    "gaussian_filter",
    "pn9",
    "ssrg",
    "barker_code",
    "crc16_cc",
    "crc16_bytes_le",
    "custom_xcorr",
    "custom_xcorr_fast",
    "rangerate_from_freq",
    "freq_from_rangerate",
    "gmsk_mod",
    "pack_bits_msb",
    "unpack_bits_msb",
    "GracefulKiller",
    "encode_nrzs",
    "decode_nrzs",
]
