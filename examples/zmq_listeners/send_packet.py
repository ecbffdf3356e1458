"""Send payload bytes into the modem's Tx path over ZMQ
(parity with examples/zmq_listeners in the reference).

    python send_packet.py tcp://localhost:15511 "hello world"
"""
import sys

import zmq


def main():
    addr = sys.argv[1] if len(sys.argv) > 1 else "tcp://localhost:15511"
    payload = (sys.argv[2] if len(sys.argv) > 2 else "hello pycusdr_tpu").encode()
    ctx = zmq.Context()
    sock = ctx.socket(zmq.PUSH)
    sock.connect(addr)
    sock.send(payload)
    print(f"sent {len(payload)} bytes to {addr}")
    sock.close()


if __name__ == "__main__":
    main()
