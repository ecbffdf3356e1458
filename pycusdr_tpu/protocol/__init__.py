"""Protocol registry.

Capability parity with ``pyCuSDR/protocol/loadProtocol.py:3-20`` — maps
protocol names (as used in config ``Main.protocols``) to classes.
"""

from pycusdr_tpu.protocol.base import (  # noqa: F401
    Packet,
    PacketEndDetect,
    PacketLenEndianness,
    ProtocolBase,
)


def loadProtocol(name: str):
    """Resolve a protocol name to its class."""
    key = name.lower()
    if key == "cc11xx":
        from pycusdr_tpu.protocol.cc11xx import CC11xx

        return CC11xx
    if key == "bench":
        from pycusdr_tpu.protocol.benchmark import BenchGMSK

        return BenchGMSK  # default bench modulation, cf. reference loadProtocol
    if key == "bench_fsk":
        from pycusdr_tpu.protocol.benchmark import BenchFSK

        return BenchFSK
    if key == "bench_gfsk":
        from pycusdr_tpu.protocol.benchmark import BenchGFSK

        return BenchGFSK
    if key == "bench_gmsk":
        from pycusdr_tpu.protocol.benchmark import BenchGMSK

        return BenchGMSK
    if key == "bench_bpsk":
        from pycusdr_tpu.protocol.benchmark import BenchBPSK

        return BenchBPSK
    if key == "ax25":
        from pycusdr_tpu.protocol.ax25 import AX25

        return AX25
    if key == "ccsds":
        from pycusdr_tpu.protocol.ccsds import CCSDS

        return CCSDS
    if key in ("ccsds_conv", "ccsds-conv"):
        from pycusdr_tpu.protocol.ccsds import CCSDSConv

        return CCSDSConv
    raise ValueError(f"Unknown protocol '{name}'")
