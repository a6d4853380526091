"""DeviceFeed/BatchFeed lifecycle: exhaustion, early abandonment, errors.

Pins two failure modes: (1) the producer's end-of-stream sentinel must reach
the consumer even when the bounded queue is full at that moment (a dropped
sentinel leaves the consumer blocked on get() forever); (2) a consumer that
stops iterating early (tracking LOST breaks the loop) must not leak the
producer thread parked on a full queue (ADVICE r3 #1).
"""

import threading
import time

import numpy as np

from stereoslam_tpu.utils.feed import BatchFeed, DeviceFeed


def _frames(n, h=8, w=12):
    for t in range(n):
        yield (np.full((h, w), t, np.uint8), np.full((h, w), t, np.uint8),
               float(t))


def test_feed_full_drain_terminates():
    """Consumer slower than producer (queue saturates) still sees EOS."""
    feed = DeviceFeed(_frames(10), depth=2)
    seen = []
    for lr, ts in feed:
        time.sleep(0.01)  # let the producer fill the queue
        seen.append(int(ts))
    assert seen == list(range(10))
    feed._thread.join(timeout=5.0)
    assert not feed._thread.is_alive()


def test_feed_early_break_stops_producer():
    """Abandoning iteration mid-stream shuts the producer down."""
    n_before = threading.active_count()
    feed = DeviceFeed(_frames(100), depth=2)
    for i, (lr, ts) in enumerate(feed):
        if i == 3:
            break
    feed.close()
    assert not feed._thread.is_alive()
    assert threading.active_count() <= n_before + 1


def test_feed_propagates_producer_error():
    def bad():
        yield from _frames(2)
        raise RuntimeError("disk died")

    feed = DeviceFeed(bad(), depth=2)
    got = []
    try:
        for lr, ts in feed:
            got.append(ts)
        raised = False
    except RuntimeError:
        raised = True
    assert raised and len(got) == 2


def test_batch_feed_stacks_uint8():
    B, H, W = 3, 8, 12

    def batches():
        for t in range(5):
            yield (np.zeros((B, H, W)), np.ones((B, H, W)), np.full(B, t, float))

    feed = BatchFeed(batches(), depth=2)
    n = 0
    for lr, ts in feed:
        assert lr.shape == (B, 2, H, W) and str(lr.dtype) == "uint8"
        assert ts.shape == (B,)
        n += 1
    assert n == 5
    assert not feed._thread.is_alive()
