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
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(iter(frames),), daemon=True
        )
        self._thread.start()

    def _run(self, it) -> None:
        try:
            for left, right, ts in it:
                if self._stop.is_set():
                    return
                lr = np.stack([np.asarray(left), np.asarray(right)]).astype(np.uint8)
                item = (jax.device_put(lr), float(ts))
                # Bounded put that honors close(): a consumer that stops
                # iterating early (tracking LOST breaks the loop) must not
                # leave this thread parked forever on a full queue.
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._put_sentinel()

    def _put_sentinel(self) -> None:
        # The sentinel MUST reach the consumer (a dropped sentinel leaves
        # the consumer blocked on get() forever once the queue drains), so
        # it uses the same stop-aware bounded put as regular items: space
        # appears as the consumer drains; close() lets us give up.
        while not self._stop.is_set():
            try:
                self._q.put(_SENTINEL, timeout=0.2)
                return
            except queue.Full:
                continue

    def close(self) -> None:
        """Stop the producer thread and release staged buffers.  Idempotent;
        called automatically when iteration finishes OR is abandoned early."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=2.0)

    def __iter__(self) -> Iterator[Tuple[jax.Array, float]]:
        try:
            while True:
                item = self._q.get()
                if item is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            # Runs on normal exhaustion AND when the consumer abandons the
            # generator (break / exception): the generator's close() triggers
            # this finally, which shuts the producer down (ADVICE r3 #1).
            self.close()


class BatchFeed(DeviceFeed):
    """Staging feed for the batched multi-sequence pipeline
    (:class:`~stereoslam_tpu.parallel.multiseq.MultiSeqVO`): iterates
    ``(stacked_device_batch, ts_vector)`` where the batch is ONE
    (B, 2, H, W) uint8 buffer per frame step.

    Args:
      frames: iterable of ``(left_B, right_B, ts_B)`` host batches —
        left/right are (B, H, W) arrays, ts a length-B vector.
      sharding: optional ``NamedSharding`` to place the staged batch on a
        mesh data axis.
    """

    def __init__(self, frames, depth: int = 3, sharding=None):
        self._sharding = sharding
        super().__init__(frames, depth=depth)

    def _run(self, it) -> None:
        try:
            for left, right, ts in it:
                if self._stop.is_set():
                    return
                lr = np.stack(
                    [np.asarray(left), np.asarray(right)], axis=1
                ).astype(np.uint8)  # (B, 2, H, W)
                dev = (jax.device_put(lr, self._sharding)
                       if self._sharding is not None else jax.device_put(lr))
                item = (dev, np.asarray(ts, np.float32))
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            self._err = e
        finally:
            self._put_sentinel()
