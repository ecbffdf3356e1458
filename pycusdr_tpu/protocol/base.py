"""Protocol plug-in API.

Capability parity with ``pyCuSDR/protocol/protocolBase.py:17-233``. A
protocol supplies everything the modem needs to speak one radio link:

Rx side
    * ``get_filter(Nfft, spsym, maskSize)`` — the matched-filter bank in
      the frequency domain (complex-conjugated FFTs, complex64),
    * ``get_symbolLUT2(maskLen)`` — symbol-index -> bit LUT (and an
      optional 3-D NRZ-S disambiguation LUT),
    * ``get_mask()`` / ``get_syncFlag()`` — ±1 sequences the frame
      finder correlates against,
    * ``decoderPreprocessor`` / ``decoderPostprocessor`` hooks,
    * a ``Packet`` factory that parses/validates received frames.

Tx side
    * ``getFramer`` / ``getModulator`` — encoder + LUT modulator classes,
    * ``initTxHeader`` / ``initTxTail`` — preamble/sync bit sequences.
"""

from enum import Enum

import numpy as np

from pycusdr_tpu.globals import printBytesAsHex
import logging

log = logging.getLogger("pycusdr_tpu." + __name__)

DEFAULT_NO_SYNC_FLAGS = 2


class PacketEndDetect(Enum):
    FLAGS = 0  # closing sync flags mark the end
    FIXED = 1  # fixed max packet length
    IN_DATA = 2  # a length field inside the packet


class PacketLenEndianness(Enum):
    LITTLE = True
    BIG = False


class ProtocolBase:
    name = "ProtocolBase"

    # Number of bits consecutive decoder blocks overlap so packets that
    # straddle a block boundary are still found.
    numBitsOverlap = 2 * 513
    packetEndDetectMode = PacketEndDetect.FLAGS

    # FIXED mode
    packetLen = None
    # IN_DATA mode
    packetEndLenField = None
    packetEndLenFieldNumBytes = None

    packet_sizes = ()  # allowable packet sizes for FLAGS mode

    # Doppler search strategy: sum correlation energy over all masks
    # before the search (robust for FSK-family aliasing) vs per-mask
    # top-2 voting. cf. cuda_kernels.cu:16-28 discussion in reference.
    SUM_ALL_MASKS_PYTHON = False

    # decoder thresholds (set by subclasses)
    numOnesSyncSig = 0
    numOnesHeader = 0
    syncSigTol = 2
    headerTol = 5

    def __init__(self, **kwargs):
        pass

    # ---------------- Rx: matched filters / symbol LUTs ----------------

    def _get_xcorrMasks(self, maskLen: int) -> np.ndarray:
        """All 2**maskLen binary bit patterns as a (2**maskLen, maskLen) array."""
        idx = np.arange(2**maskLen, dtype=np.int64)
        bits = (idx[:, None] >> np.arange(maskLen - 1, -1, -1)) & 1
        return bits.astype(np.float64)

    def get_filter(self, Nfft: int, spsym=None, maskSize: int = 0):
        """Return (num_masks, masks_f) where masks_f is the conj-FFT'd
        (num_masks, Nfft) complex64 matched-filter bank."""
        raise NotImplementedError("Protocol must implement get_filter")

    def get_symbolLUT2(self, maskLen: int):
        """Return (bitLUT, symbolLUT). bitLUT maps symbol index (the
        winning mask) to the centre bit; symbolLUT is the optional 3-D
        NRZ-S transition table (see bench_BPSK)."""
        raise NotImplementedError("Protocol must implement get_symbolLUT2")

    # ---------------- decoder hooks ----------------

    def get_mask(self):
        """±1 header correlation sequence (flipped for np.convolve)."""
        raise NotImplementedError

    def get_syncFlag(self):
        """±1 sync-flag correlation sequence."""
        raise NotImplementedError

    def decoderPreprocessor(self, bits, **kwargs):
        return bits

    def decoderPostprocessor(self, packet, **kwargs):
        return packet

    def packetDataProcessor(self, packet):
        """IN_DATA mode hook: undo whitening/interleaving over the length field."""

    def packetEndLenDecoder(self, bits, **kwargs):
        return 0

    def Packet(self, *args, **kwargs):
        return Packet(self, *args, **kwargs)

    # ---------------- Tx ----------------

    def getFramer(self, confRadio):
        return None

    def getModulator(self, confRadio):
        return None

    def initTxHeader(self, noFlags: int = DEFAULT_NO_SYNC_FLAGS):
        raise NotImplementedError

    def initTxTail(self, noFlags: int = DEFAULT_NO_SYNC_FLAGS):
        raise NotImplementedError

    def __repr__(self):
        return f"<Protocol {self.name}>"


class Packet:
    """Generic packet: raw bits with byte extraction, no CRC."""

    def __init__(self, protocol, bits, *args, **kwargs):
        self.protocol = protocol
        self.bits = np.asarray(bits)

    @property
    def bitsRaw(self):
        return self.bits

    def getBinaryData(self):
        nbytes = len(self.bits) // 8
        # NB the base packet packs LSB-first within a byte, mirroring the
        # reference's generic Packet (protocolBase.py:183).
        data = np.dot(
            self.bits[: nbytes * 8].reshape(nbytes, 8), 2 ** np.arange(8)
        ).astype(np.uint8)
        return data, 0, self.bits

    def getBinaryRawData(self):
        return self.bits

    def getAsciiAddress(self):
        return "ASCII_address"

    def printPacket(self, pre_str="", pos_str="", verbosity=0, **kwargs):
        log.info(
            f"{pre_str}\tlen: {len(self.bits)}\t Data:\n"
            f"{printBytesAsHex(self.getBinaryData()[0])}{pos_str}"
        )
