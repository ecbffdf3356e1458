"""The SoftCombiner process: collect per-channel soft bits, align,
vote, forward to the decoder.

Capability parity with the reference ``SoftCombiner(Process)``
(``softCombiner.py:457-958``): ZMQ PULL of demodulator dicts, a
``Worker`` per channel, periodic all-pairs compare where every worker
takes a turn as *master* (so N copies of each stream reach the decoder
and its dedup/CRC picks survivors), xcorr alignment + N-way/2-way vote,
hold-back of unmatched data for ``workerDataRequestThreshold`` cycles
or ``MAX_DATA_LEN_BEFORE_TRANSMIT`` bits, worker timeout cleanup, and
an Event+Queue channel serving active-worker stats to the RPC thread.

The reference paces compares with a SIGALRM timer
(``softCombiner.py:841-849``); a monotonic-clock deadline inside the
poll loop gives the same cadence without signal handlers.
"""

import logging
import queue
import signal
import time
import multiprocessing

# spawn, never fork (see runtime/decoder_process)
_mp = multiprocessing.get_context("spawn")
Event, Process, Queue = _mp.Event, _mp.Process, _mp.Queue

import numpy as np
import zmq

from pycusdr_tpu.combine.aligner import xcorr_peak
from pycusdr_tpu.combine.votes import do_vote2, do_voteN
from pycusdr_tpu.combine.worker import Worker

log = logging.getLogger("pycusdr_tpu." + __name__)

MAX_DATA_LEN_BEFORE_TRANSMIT = 6000  # bits (reference softCombiner.py:37)


class SoftCombiner(Process):
    def __init__(self, conf):
        Process.__init__(self)
        self.name = "softCombiner"
        self.conf = conf

        c = conf["SoftCombiner"]
        self.dataRequestThreshold = c["workerDataRequestThreshold"]
        self.demodInAddr = conf["Interfaces"]["Internal"]["demodIn"]
        self.decoderOutAddr = conf["Interfaces"]["Internal"]["decodeOut"]
        self.MIN_LENGTH = c["minProcessingLength"]
        self.pollingTimeout = c["pollingTimeout"]  # ms
        self.workerTimeout = c["workerTimeout"]  # s
        self.workerDataTimeout = c["workerDataTimeout"]  # s
        self.compareInterval = c["processingInterval"]  # s
        self.varMultiplier = c["varianceMultiplier"]
        self.masterVoteWeight = c["masterVoteWeight"]
        self.logLevel = log.getEffectiveLevel()

        self.getWorkerStatsFlag = Event()
        # set once the ZMQ sockets are bound: spawn-start takes ~1-2 s
        # (interpreter boot), so senders should wait on this instead of
        # sleeping — a burst backlog landing on a freshly-booted
        # combiner makes the first vote round span whole buffers
        self.ready = Event()
        self.workersSubmittedToRPCQueue = Queue()

        self.daemon = True
        self.runStatus = Event()
        self.runStatus.set()
        log.info("Starting SoftCombiner")

    def stop(self):
        log.info("Received request to stop")
        self.runStatus.clear()

    def getActiveWorkers(self, timeout=0.15):
        """Names of workers that submitted since the last query (serves
        the RPC thread; reference softCombiner.py:505-525)."""
        while not self.workersSubmittedToRPCQueue.empty():
            try:
                self.workersSubmittedToRPCQueue.get(False)
            except queue.Empty:
                break
        self.getWorkerStatsFlag.set()
        try:
            return self.workersSubmittedToRPCQueue.get(True, timeout=timeout)
        except queue.Empty:
            log.warning("querying active workers timed out -- returning empty list")
            return []

    # ---------------- ingest ----------------

    def receiveData(self, demodIn):
        data = demodIn.recv_pyobj(zmq.DONTWAIT)
        workerId = data.get("workerId")
        if workerId is None:
            log.error("Invalid data format: expected 'workerId'")
            return
        for worker in self.workers:
            if worker.workerId == workerId:
                worker.insertData(data)
                if worker not in self.workersSubmitted:
                    self.workersSubmitted.append(worker)
                return
        log.debug("registering new worker %s", workerId)
        worker = Worker(data, timestampTimeOut=self.workerDataTimeout)
        self.workers.append(worker)
        self.workersSubmitted.append(worker)

    # ---------------- compare ----------------

    def correlate(self, master, slaves):
        """One master-vs-slaves round (reference softCombiner.py:665-798).

        Returns the combined data dict to forward, or None to wait.
        """
        dataM = master.getSelf()
        if len(dataM["data"]) == 0:
            return None

        bitsM, trustM = dataM["data"], dataM["trust"]
        bitsS, trustS, nameS = [], [], []

        for s in (s for s in slaves if s.voteGroup == master.voteGroup):
            bitsT, trustT = s.getData()
            lag, ok = xcorr_peak(bitsT, bitsM, self.varMultiplier)
            if not ok:
                continue

            bitsT = bitsT[lag : lag + len(bitsM)]
            trustT = trustT[lag : lag + len(trustM)]
            if len(bitsT) < self.MIN_LENGTH:
                # matched segment too short: retry with more data next cycle
                master.updateIdx(len(bitsM), dataUsed=False)
                return None
            if len(bitsT) < len(bitsM):
                # slave buffer ends early: shrink this round to the match
                master.updateIdx(len(bitsM) - len(bitsT))
                bitsM = bitsM[: len(bitsT)]
                trustM = trustM[: len(bitsT)]
                bitsS = [b[: len(bitsT)] for b in bitsS]
                trustS = [t[: len(bitsT)] for t in trustS]

            bitsS.append(bitsT)
            trustS.append(trustT)
            nameS.append(s.workerId)

        if len(bitsS) > 1:
            bitsM, trustM = do_voteN(bitsM, trustM, bitsS, trustS, self.masterVoteWeight)
            dataM["data"], dataM["trust"] = bitsM, trustM
        elif len(bitsS) == 1:
            bitsM, trustM = do_vote2(bitsM, trustM, bitsS[0], trustS[0])
            dataM["data"], dataM["trust"] = bitsM, trustM
        else:
            # nothing aligned: hold the data unless it has waited long
            # enough or grown too large
            if len(dataM["data"]) > MAX_DATA_LEN_BEFORE_TRANSMIT:
                log.debug("too many unprocessed bits -- sending unvoted")
            elif master.getDataRequestCounter() < self.dataRequestThreshold:
                master.updateIdx(len(bitsM), dataUsed=False)
                return None

        master.clearDataRequestCounter()
        dataM["numSlaves"] = len(bitsS)
        dataM["slaveNames"] = nameS
        return dataM

    def compareWorkers(self):
        """Every worker takes a turn as master (softCombiner.py:807-838)."""
        for m in range(len(self.workers)):
            slaves = self.workers.copy()
            master = slaves.pop(m)
            data = self.correlate(master, slaves)
            if data is not None:
                try:
                    self.decodeOut.send_pyobj(data, zmq.NOBLOCK)
                except zmq.error.Again as e:
                    log.error("Failed to send data. Message [%s]", e)
        for m in self.workers:
            m.removeOldData()

    # ---------------- main loop ----------------

    def run(self):
        from pycusdr_tpu.utils.logger import child_logger_setup

        child_logger_setup(self.logLevel)
        time.sleep(0.5)
        ctx = zmq.Context()
        log.info("Registering demodulator input socket on %s", self.demodInAddr)
        demodIn = ctx.socket(zmq.PULL)
        demodIn.setsockopt(zmq.LINGER, 0)
        demodIn.bind(self.demodInAddr)

        log.info("Registering decoder output socket on %s", self.decoderOutAddr)
        self.decodeOut = ctx.socket(zmq.PUSH)
        self.decodeOut.connect(self.decoderOutAddr)
        self.ready.set()

        poller = zmq.Poller()
        poller.register(demodIn, zmq.POLLIN)

        self.workers = []
        self.workersSubmitted = []
        timeoutCount = 0.0
        nextCompare = time.monotonic() + self.compareInterval

        orig_sigterm = signal.getsignal(signal.SIGTERM)
        signal.signal(signal.SIGTERM, lambda *_: None)  # parent coordinates shutdown
        log.info(
            "SoftCombiner running: poll %s ms, worker timeout %s s, interval %s s",
            self.pollingTimeout, self.workerTimeout, self.compareInterval,
        )
        try:
            while self.runStatus.is_set():
                socks = poller.poll(self.pollingTimeout)
                if socks and socks[0][1] == zmq.POLLIN:
                    self.receiveData(demodIn)
                    timeoutCount = 0.0
                else:
                    timeoutCount += self.pollingTimeout / 1000.0
                    if timeoutCount > self.workerTimeout:
                        if self.workers:
                            log.info("Input silent %.1f s -- cleaning up workers", timeoutCount)
                            self.workers.clear()
                            self.workersSubmitted = []
                        timeoutCount = 0.0

                if time.monotonic() >= nextCompare and self.runStatus.is_set():
                    nextCompare = time.monotonic() + self.compareInterval
                    self.compareWorkers()

                if self.getWorkerStatsFlag.is_set():
                    self.getWorkerStatsFlag.clear()
                    names = [w.workerId for w in self.workersSubmitted]
                    log.info("Active workers: %s", names)
                    self.workersSubmittedToRPCQueue.put(names)
                    self.workersSubmitted = []
        except Exception as e:
            log.exception(e)
            raise
        finally:
            log.info("shutting down")
            self.workersSubmittedToRPCQueue.close()
            self.decodeOut.close()
            demodIn.close()
            signal.signal(signal.SIGTERM, orig_sigterm)
            log.info("closed")
