"""Listen for decoded packet bytes from the modem
(parity with examples/zmq_listeners in the reference).

    python recv_packets.py tcp://localhost:5502
"""
import sys

import zmq


def main():
    addr = sys.argv[1] if len(sys.argv) > 1 else "tcp://localhost:5502"
    ctx = zmq.Context()
    sock = ctx.socket(zmq.PULL)
    sock.connect(addr)
    print(f"listening on {addr} -- ctrl-c to stop")
    while True:
        data = sock.recv()
        print(f"packet: {len(data)} bytes: {data[:64].hex()}")


if __name__ == "__main__":
    main()
