"""Tests: frame finder (FIXED + FLAGS modes), CC11xx packet codec
roundtrip, packet dedup, Reed-Solomon codec."""

import numpy as np
import pytest

from pycusdr_tpu.decode import Decoder, PacketHist, RSCodec
from pycusdr_tpu.decode.rs import RSError
from pycusdr_tpu.protocol import loadProtocol
from pycusdr_tpu.protocol.benchmark.bench_base import seeded_bits
from pycusdr_tpu.protocol.cc11xx import CC11xx
from pycusdr_tpu.tx.encoders import CC11xxEncoder


@pytest.fixture(scope="module")
def cc_protocol():
    conf = {
        "Radios": {
            "Protocol": {
                "rx_preamble": ["0xaa", "0xaa", "0xaa", "0xaa"],
                "rx_sync_seq": ["0xd6", "0xba", "0xd6", "0xba"],
                "tx_preamble": ["0xaa"],
                "tx_num_preambles": 10,
                "tx_sync_seq": ["0xd6", "0xba", "0xd6", "0xba"],
            }
        }
    }
    return CC11xx(conf=conf)


class TestCC11xxRoundtrip:
    def test_encode_decode_bits(self, cc_protocol):
        """encoder -> on-air bits -> PacketCC11xx must recover payload + CRC ok."""
        enc = CC11xxEncoder(cc_protocol, {"samplesPerSym": 16, "baud": 9600})
        payload = np.arange(1, 40, dtype=np.uint8)  # includes 'addr' byte
        bits = enc.encodeAndFrame(payload)

        # the rx mask matches the last 4 preamble bytes + sync: locate it
        mask = cc_protocol.get_mask()
        score = np.convolve(bits * 1.0, mask)
        start = int(np.argmax(score)) - len(mask) + 1
        pkt_bits = bits[start : start + cc_protocol.packetLen]

        pkt = cc_protocol.Packet(pkt_bits, 0, 0)
        data, crcError, _ = pkt.getBinaryData()
        assert not crcError
        assert np.array_equal(data, payload)

    def test_crc_detects_corruption(self, cc_protocol):
        enc = CC11xxEncoder(cc_protocol, {})
        payload = np.arange(1, 20, dtype=np.uint8)
        bits = enc.encodeAndFrame(payload)
        mask = cc_protocol.get_mask()
        score = np.convolve(bits * 1.0, mask)
        start = int(np.argmax(score)) - len(mask) + 1
        pkt_bits = bits[start:].copy()
        pkt_bits[9 * 8 + 3] ^= 1  # flip a payload bit
        pkt = cc_protocol.Packet(pkt_bits, 0, 0)
        _, crcError, _ = pkt.getBinaryData()
        assert crcError


class TestFrameFinderFixed:
    def test_finds_packet_across_blocks(self, bench_conf):
        protocol = loadProtocol("bench_FSK")(conf=bench_conf)
        protocol.packetLen = 1000
        dec = Decoder(bench_conf, protocol)

        # In the bench design the header mask IS the packet's first 128
        # bits (both seeded 123, reference bench_base.py:67-75,178-181),
        # so the detected packet starts at the mask match.
        payload = seeded_bits(1000, 123)
        rng = np.random.RandomState(7)
        stream = np.r_[rng.randint(0, 2, 700), payload, rng.randint(0, 2, 400)]

        # feed in two blocks, packet straddles the boundary
        split = 900
        pkts1, _, _ = dec.findFrames(stream[:split], 0)
        pkts2, _, _ = dec.findFrames(stream[split:], split)
        pkts = pkts1 + pkts2
        assert len(pkts) == 1
        assert pkts[0].checkPacketData() == 0

    def test_no_false_positives_on_noise(self, bench_conf):
        protocol = loadProtocol("bench_FSK")(conf=bench_conf)
        protocol.packetLen = 1000
        dec = Decoder(bench_conf, protocol)
        rng = np.random.RandomState(8)
        pkts, _, _ = dec.findFrames(rng.randint(0, 2, 5000), 0)
        assert len(pkts) == 0


class TestPacketHist:
    def test_dedup(self):
        ph = PacketHist(maxLen=10, timeout=10)
        p = np.array([1, 2, 3], dtype=np.uint8)
        assert ph.checkHash(p, numWorkers=2)
        assert not ph.checkHash(p, numWorkers=2)
        assert ph.checkHash(np.array([1, 2, 4], dtype=np.uint8), numWorkers=2)

    def test_timeout_allows_repeat(self):
        ph = PacketHist(maxLen=10, timeout=0.0)
        p = np.array([9, 9], dtype=np.uint8)
        assert ph.checkHash(p)
        import time

        time.sleep(0.01)
        assert ph.checkHash(p)


class TestReedSolomon:
    def test_roundtrip_clean(self):
        rs = RSCodec(255, 223)
        rng = np.random.RandomState(5)
        msg = rng.randint(0, 256, 223)
        cw = rs.encode(msg)
        dec, nerr = rs.decode(cw)
        assert nerr == 0
        assert np.array_equal(dec, msg.astype(np.uint8))

    @pytest.mark.parametrize("n_errors", [1, 5, 16])
    def test_corrects_errors(self, n_errors):
        rs = RSCodec(255, 223)
        rng = np.random.RandomState(6 + n_errors)
        msg = rng.randint(0, 256, 223)
        cw = rs.encode(msg).astype(np.int64)
        pos = rng.choice(255, n_errors, replace=False)
        cw[pos] ^= rng.randint(1, 256, n_errors)
        dec, nerr = rs.decode(cw)
        assert nerr == n_errors
        assert np.array_equal(dec, msg.astype(np.uint8))

    def test_uncorrectable_raises(self):
        rs = RSCodec(255, 223)
        rng = np.random.RandomState(9)
        msg = rng.randint(0, 256, 223)
        cw = rs.encode(msg).astype(np.int64)
        pos = rng.choice(255, 40, replace=False)  # > t = 16
        cw[pos] ^= rng.randint(1, 256, 40)
        with pytest.raises(RSError):
            rs.decode(cw)

    def test_short_code(self):
        rs = RSCodec(15, 11)  # still GF(256) symbols, shortened use
        msg = np.arange(11)
        cw = rs.encode(msg).astype(np.int64)
        cw[3] ^= 0x55
        dec, nerr = rs.decode(cw)
        assert nerr == 1
        assert np.array_equal(dec, msg.astype(np.uint8))


class TestInDataMode:
    """IN_DATA packet-end detection: length field inside the packet
    (the reference left this a stub, decoder.py:283-288)."""

    def _protocol(self):
        from pycusdr_tpu.protocol.base import PacketEndDetect, ProtocolBase

        class P(ProtocolBase):
            name = "in_data_test"
            packetEndDetectMode = PacketEndDetect.IN_DATA
            packetEndLenField = 2      # length byte sits 2 bytes in
            packetEndLenFieldNumBytes = 1
            numOnesHeader = 16
            headerTol = 2
            numOnesSyncSig = 16
            syncSigTol = 2
            numBitsOverlap = 64

            def get_mask(self):
                return np.ones(16)  # header: 16 ones

            def get_syncFlag(self):
                return np.ones(16)

            def packetEndLenDecoder(self, bits, **kwargs):
                return int(np.dot(bits, 2 ** np.arange(7, -1, -1)))

        return P()

    def test_length_field_slicing(self):
        from pycusdr_tpu.decode.frame_finder import Decoder

        proto = self._protocol()
        dec = Decoder({}, proto)

        rng = np.random.RandomState(3)
        payload_len = 5  # bytes
        hdr = np.ones(16, np.int8)  # = packetEndLenField 2 bytes
        len_byte = np.array([int(b) for b in f"{payload_len:08b}"], np.int8)
        payload = rng.randint(0, 2, payload_len * 8).astype(np.int8)
        frame = np.r_[hdr, len_byte, payload]
        filler = rng.randint(0, 2, 300).astype(np.int8)
        filler[::8] = 0  # no accidental 16-ones header in the filler
        stream = np.r_[filler, frame, filler].astype(np.int8)

        pkts, _, _ = dec.findFrames(stream, 0)
        assert len(pkts) >= 1
        total = 16 + 8 + payload_len * 8
        match = [p for p in pkts if len(p.bits) == total]
        assert match, f"no packet with expected length {total}: {[len(p.bits) for p in pkts]}"

    def test_waits_for_more_data(self):
        from pycusdr_tpu.decode.frame_finder import Decoder

        proto = self._protocol()
        dec = Decoder({}, proto)
        rng = np.random.RandomState(4)
        hdr = np.ones(16, np.int8)
        len_byte = np.array([0, 0, 0, 0, 1, 0, 1, 0], np.int8)  # len 10 bytes
        frame_head = np.r_[hdr, len_byte]
        # stream ends right after the length field: must hold, not emit
        stream = np.r_[np.zeros(100, np.int8), frame_head]
        pkts, _, _ = dec.findFrames(stream, 0)
        assert len(pkts) == 0
        # the continuation block supplies the payload
        payload = rng.randint(0, 2, 10 * 8).astype(np.int8)
        pkts, _, _ = dec.findFrames(np.r_[payload, np.zeros(200, np.int8)], 0)
        assert len(pkts) >= 1

    def test_holds_first_starving_candidate_not_last(self):
        """ADVICE r1 medium: a truncated frame at candidate i < last
        (followed by a junk sidelobe candidate) must be held from ITS
        start, even when its header sits more than numBitsOverlap bits
        from the block end — previously only the LAST candidate could
        trigger the hold and the frame start was discarded."""
        from pycusdr_tpu.decode.frame_finder import Decoder

        proto = self._protocol()
        dec = Decoder({}, proto)
        rng = np.random.RandomState(8)
        hdr = np.ones(16, np.int8)
        payload_len = 12
        len_byte = np.array([int(b) for b in f"{payload_len:08b}"], np.int8)
        payload = rng.randint(0, 2, payload_len * 8).astype(np.int8)
        # plant a header-like sidelobe INSIDE the payload: 16 ones
        # followed by a zero length byte (decodes to 0 -> invalid, so
        # the candidate is skipped, but it is a LATER candidate than
        # the real frame's header)
        payload[24:40] = 1
        payload[40:48] = 0

        # block ends 96 bits short of the real frame's end
        block1 = np.r_[np.zeros(100, np.int8), hdr, len_byte, payload[:48]]
        # the real header sits len(block1)-100 = 72 > numBitsOverlap=64
        # bits from the block end: without the hold it is unrecoverable
        assert len(block1) - 100 > proto.numBitsOverlap
        pkts, _, _ = dec.findFrames(block1, 0)
        assert len(pkts) == 0

        # continuation supplies the rest: the frame must decode intact
        pkts, _, _ = dec.findFrames(np.r_[payload[48:], np.zeros(80, np.int8)], 0)
        total = 16 + 8 + payload_len * 8
        match = [p for p in pkts if len(p.bits) == total]
        assert match, (
            f"truncated frame lost: {[len(p.bits) for p in pkts]}")
        got = np.asarray(match[0].bits[24:], np.int8)
        np.testing.assert_array_equal(got, payload)

    def test_complete_frame_behind_starving_candidate_emits_once(self):
        """A complete frame AFTER a starving candidate must decode in
        the same block and not be re-emitted when the held window is
        re-scanned on the next call."""
        from pycusdr_tpu.decode.frame_finder import Decoder

        proto = self._protocol()
        dec = Decoder({}, proto)
        rng = np.random.RandomState(9)
        hdr = np.ones(16, np.int8)

        # starving candidate: header at the END-ish of useful data with a
        # length that wants more bits than the block holds
        starving = np.r_[hdr, np.array([0, 0, 0, 1, 1, 1, 1, 1], np.int8)]
        # complete frame behind it
        payload_len = 4
        len_byte = np.array([int(b) for b in f"{payload_len:08b}"], np.int8)
        payload = rng.randint(0, 2, payload_len * 8).astype(np.int8)
        complete = np.r_[hdr, len_byte, payload]

        block1 = np.r_[np.zeros(30, np.int8), starving,
                       np.zeros(40, np.int8), complete, np.zeros(20, np.int8)]
        pkts1, _, _ = dec.findFrames(block1, 0)
        total = 16 + 8 + payload_len * 8
        assert [len(p.bits) for p in pkts1].count(total) == 1

        # next block: held window re-scanned; the complete frame must
        # NOT be emitted a second time
        pkts2, _, _ = dec.findFrames(np.zeros(400, np.int8), 0)
        assert [len(p.bits) for p in pkts2].count(total) == 0

    def test_no_reemission_while_candidate_keeps_starving(self):
        """Dedup memory must survive REPEATED holds: when the starving
        candidate stays starving across several calls, an already-emitted
        frame inside the held window must never re-emit (previously the
        emitted-offset set only lasted one call, so the frame re-emitted
        every other call)."""
        from pycusdr_tpu.decode.frame_finder import Decoder

        proto = self._protocol()
        dec = Decoder({}, proto)
        rng = np.random.RandomState(11)
        hdr = np.ones(16, np.int8)

        # starving candidate: wants 31 payload bytes (272 bits total)
        starving = np.r_[hdr, np.array([0, 0, 0, 1, 1, 1, 1, 1], np.int8)]
        payload_len = 4
        len_byte = np.array([int(b) for b in f"{payload_len:08b}"], np.int8)
        payload = rng.randint(0, 2, payload_len * 8).astype(np.int8)
        complete = np.r_[hdr, len_byte, payload]

        block1 = np.r_[np.zeros(30, np.int8), starving,
                       np.zeros(40, np.int8), complete, np.zeros(20, np.int8)]
        pkts1, _, _ = dec.findFrames(block1, 0)
        total = 16 + 8 + payload_len * 8
        assert [len(p.bits) for p in pkts1].count(total) == 1

        # drip-feed continuations too small to satisfy the starving
        # candidate: the window is held again each call, and the frame
        # must not reappear on ANY of them
        for i in range(4):
            pkts, _, _ = dec.findFrames(np.zeros(40, np.int8), 0)
            assert [len(p.bits) for p in pkts].count(total) == 0, (
                f"frame re-emitted on drip call {i + 1}")

        # once the candidate finally gets its data it resolves (to a
        # junk packet of zeros) and the frame STILL does not reappear
        pkts, _, _ = dec.findFrames(np.zeros(400, np.int8), 0)
        assert [len(p.bits) for p in pkts].count(total) == 0
