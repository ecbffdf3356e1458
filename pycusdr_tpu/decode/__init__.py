from pycusdr_tpu.decode.frame_finder import Decoder
from pycusdr_tpu.decode.packet_hist import PacketHist
from pycusdr_tpu.decode.rs import RSCodec

__all__ = ["Decoder", "PacketHist", "RSCodec"]
