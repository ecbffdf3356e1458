"""Hamlib daemon: boot a full modem per incoming hamlib connection.

Capability parity with ``start_pyCuSDR_hamlib_daemon.py:49-106``: for
each radio in ``hamlib_sockets.json`` a TCP listener waits for a
hamlib client (gpredict); on connect, a complete ``PyCuSDR`` instance
for that radio's config is started together with a ``Rig_server``
steering it, and everything is torn down when the client disconnects.

Run: ``python -m pycusdr_tpu.control.hamlib_daemon -c hamlib_sockets.json``
"""

import argparse
import logging
import os
import socket
import time

from pycusdr_tpu.config.loader import load_modular_json
from pycusdr_tpu.control.rig_server import Rig_server
from pycusdr_tpu.globals import LOG_NAME

log = logging.getLogger(LOG_NAME + "." + __name__)


def serve_radio(name, entry, base_dir, args):
    """Listen on this radio's hamlib port; one modem per connection."""
    from pycusdr_tpu.runtime.orchestrator import PyCuSDR

    addr, port = entry["addr"], int(entry["port"])
    cfg_path = os.path.join(base_dir, entry["config"])

    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind((addr, port))
    lsock.listen(1)
    log.info("[%s] hamlib listener on %s:%s (config %s)", name, addr, port, cfg_path)

    while True:
        sock, client = lsock.accept()
        log.info("[%s] client %s connected -- booting modem", name, client)
        sdr = PyCuSDR(cfg_path, args)
        sdr.start()
        rig = Rig_server(sock, client, sdr.demodulators, sdr.modulators)
        rig.start()
        try:
            while rig.is_alive() and sdr.is_alive():
                time.sleep(0.2)
        finally:
            log.info("[%s] client gone -- tearing down modem", name)
            rig.terminate()
            sdr.terminate()


def main(argv=None):
    p = argparse.ArgumentParser(prog="pycusdr_tpu-hamlib-daemon")
    p.add_argument("-c", "--configFile", required=True,
                   help="hamlib_sockets.json (per-radio ports + configs)")
    p.add_argument("-r", "--radio", default=None,
                   help="serve only this radio entry (default: first)")
    p.add_argument("-v", action="count", default=0, dest="v")
    args = p.parse_args(argv)

    sockets = load_modular_json(args.configFile)
    base_dir = os.path.dirname(os.path.abspath(args.configFile))
    name = args.radio or next(iter(sockets))
    serve_radio(name, sockets[name], base_dir, args)


if __name__ == "__main__":
    main()
