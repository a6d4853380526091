"""Device input feed: stage stereo pairs onto the accelerator ahead of use.

The reference's input path is a per-frame ``cv::imread`` whose disk latency
the OS page cache hides (reference app/run_kitti_stereo.cpp:61-88).  The
TPU-native equivalent of that hidden overlap is an explicit input pipeline:
a background thread performs the host->device transfer of frame t+1..t+depth
while the device computes frame t, so the tunnel transfer cost disappears
from the frame loop.  ``jax.device_put`` releases the GIL during the wire
transfer, so one plain Python thread suffices — no native code needed here
(the native libpng prefetch loader, native/dataloader.cpp, feeds THIS feed
for on-disk KITTI input).

Usage::

    feed = DeviceFeed(((seq.left[t], seq.right[t], seq.timestamps[t])
                       for t in range(n)))
    for lr_dev, ts in feed:
        if not slam.process_staged(lr_dev, ts):
            break
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Tuple

import jax
import numpy as np

_SENTINEL = object()


class DeviceFeed:
    """Iterate ``(stacked_device_pair, timestamp)`` with background staging.

    Args:
      frames: iterable of ``(left, right, timestamp)`` host frames.
      depth: number of frames staged ahead (2-3 hides the transfer without
        holding many image buffers on device).
    """

    def __init__(self, frames: Iterable[Tuple[np.ndarray, np.ndarray, float]],
                 depth: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, int(depth)))
        self._err = None
        self._thread = threading.Thread(
            target=self._run, args=(iter(frames),), daemon=True
        )
        self._thread.start()

    def _run(self, it) -> None:
        try:
            for left, right, ts in it:
                lr = np.stack([np.asarray(left), np.asarray(right)]).astype(np.uint8)
                self._q.put((jax.device_put(lr), float(ts)))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator[Tuple[jax.Array, float]]:
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
