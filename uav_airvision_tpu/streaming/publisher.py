"""Real-time data publisher: replays a dataset iterable into a queue, pacing
wall-clock against dataset time (API-compatible with the reference
DataPublisher, src/streaming/publisher.py:8-53).

The batch path (streaming/prebatch.py + models/vio.run_sequence) is the fast
TPU path; this threaded publisher exists for the streaming/real-time API and
for drop-in compatibility with reference-style launch scripts.
"""

from __future__ import annotations

import time
from threading import Thread


class DataPublisher:
    def __init__(self, dataset, out_queue, duration=float("inf"), ratio=1.0):
        self.dataset = dataset
        self.dataset_starttime = dataset.starttime
        self.out_queue = out_queue
        self.duration = duration
        self.ratio = ratio
        self.starttime = None
        self.started = False
        self.stopped = False
        self.publish_thread = Thread(target=self.publish, daemon=True)

    def start(self, starttime):
        self.started = True
        self.starttime = starttime
        self.publish_thread.start()

    def stop(self):
        self.stopped = True
        if self.started:
            self.publish_thread.join()
        self.out_queue.put(None)

    def publish(self):
        it = iter(self.dataset)
        while not self.stopped:
            try:
                data = next(it)
            except StopIteration:
                self.out_queue.put(None)
                return
            interval = data.timestamp - self.dataset_starttime
            if interval < 0:
                continue
            while (time.time() - self.starttime) * self.ratio < interval + 1e-3:
                time.sleep(1e-3)
                if self.stopped:
                    return
            if interval <= self.duration + 1e-3:
                self.out_queue.put(data)
            else:
                self.out_queue.put(None)
                return
