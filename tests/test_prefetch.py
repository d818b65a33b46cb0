"""DevicePrefetcher: the train loop's device-side input staging
(tacotron2_tpu/parallel/prefetch.py). The reference relies on CUDA-stream
H2D overlap (torch DataLoader + Lightning, reference run/train.py); here
the staging thread is explicit, so its ordering/shutdown/error contracts
need their own coverage."""

import threading
import time

import numpy as np
import pytest

from tacotron2_tpu.parallel import (
    DevicePrefetcher,
    DirectStream,
    make_mesh_for_batch,
    use_device_prefetch,
)


class ListLoader:
    """Epoch-iterable like TTSDataLoader: yields its batches each epoch."""

    def __init__(self, batches):
        self.batches = batches
        self.epochs = 0

    def __iter__(self):
        self.epochs += 1
        yield from self.batches


def _batches(n, batch=4):
    out = []
    for i in range(n):
        out.append({
            "mel": np.full((batch, 8, 3), float(i), np.float32),
            "mel_len": np.full((batch,), i + 1, np.int32),
            "meta": f"batch-{i}",  # non-ndarray fields pass through host-only
        })
    return out


def _alive_prefetch_threads():
    return [t for t in threading.enumerate()
            if t.name == "device-prefetch" and t.is_alive()]


@pytest.mark.parametrize("make_stream", [
    lambda loader, mesh: DevicePrefetcher(loader, mesh, depth=2),
    lambda loader, mesh: DirectStream(loader, mesh),
], ids=["prefetcher", "direct"])
def test_prefetch_order_content_and_epoch_chaining(make_stream):
    mesh = make_mesh_for_batch(4)
    loader = ListLoader(_batches(3))
    pf = make_stream(loader, mesh)
    got = []
    for device_batch, host_batch in pf:
        # device batch holds only ndarray fields, values/order intact
        assert set(device_batch) == {"mel", "mel_len"}
        np.testing.assert_array_equal(np.asarray(device_batch["mel"]), host_batch["mel"])
        got.append(host_batch["meta"])
        if len(got) == 7:  # 2 full epochs + 1 — epochs chain seamlessly
            break
    pf.close()
    assert got == [f"batch-{i % 3}" for i in range(7)]
    assert loader.epochs >= 3
    assert not _alive_prefetch_threads()


def test_prefetch_early_break_joins_thread():
    mesh = make_mesh_for_batch(4)
    pf = DevicePrefetcher(ListLoader(_batches(8)), mesh, depth=2)
    for _ in pf:
        break  # consumer abandons immediately; generator finally closes
    deadline = time.time() + 5
    while _alive_prefetch_threads() and time.time() < deadline:
        time.sleep(0.02)
    assert not _alive_prefetch_threads()


def test_prefetch_propagates_loader_error():
    class BoomLoader:
        def __iter__(self):
            yield _batches(1)[0]
            raise ValueError("decode failed")

    mesh = make_mesh_for_batch(4)
    pf = DevicePrefetcher(BoomLoader(), mesh, depth=2)
    it = iter(pf)
    next(it)
    with pytest.raises(ValueError, match="decode failed"):
        # the error may land after the queue drains; keep pulling
        for _ in range(4):
            next(it)
    pf.close()


@pytest.mark.parametrize("make_stream", [
    lambda loader, mesh: DevicePrefetcher(loader, mesh, depth=2),
    lambda loader, mesh: DirectStream(loader, mesh),
], ids=["prefetcher", "direct"])
def test_prefetch_empty_loader_raises(make_stream):
    mesh = make_mesh_for_batch(4)
    pf = make_stream(ListLoader([]), mesh)
    with pytest.raises(RuntimeError, match="no batches"):
        next(iter(pf))
    pf.close()


def test_staging_policy_core_count_adaptive():
    """use_device_prefetch (VERDICT r4 #6): core-count-adaptive default
    (threads starve a 1-core host — PERF.md staging decision table), env
    var is an explicit override in EITHER direction."""
    # adaptive default: inline below 4 cores, prefetch at >= 4
    assert use_device_prefetch(env=None, cores=1) is False
    assert use_device_prefetch(env=None, cores=2) is False
    assert use_device_prefetch(env=None, cores=4) is True
    assert use_device_prefetch(env=None, cores=64) is True
    # env forces ON even on a 1-core host (the old opt-in behavior) ...
    assert use_device_prefetch(env="1", cores=1) is True
    # ... and forces OFF even on a big host (new: override both ways)
    assert use_device_prefetch(env="0", cores=64) is False
    assert use_device_prefetch(env="off", cores=64) is False
    # the current host resolves without error either way
    assert use_device_prefetch() in (True, False)


def test_prefetch_close_join_is_bounded():
    """close() must not hang forever when the stage thread is stuck in a
    transfer (the documented hung-tunnel failure mode): after the bounded
    join it abandons the daemon thread instead of blocking shutdown."""
    mesh = make_mesh_for_batch(4)

    release = threading.Event()

    class StuckLoader:
        def __iter__(self):
            yield _batches(1)[0]
            release.wait(30)  # simulates a device_put stuck on the tunnel
            return

    pf = DevicePrefetcher(StuckLoader(), mesh, depth=1)
    it = iter(pf)
    next(it)  # thread is now inside the stuck "transfer"
    t0 = time.time()
    pf.close(join_timeout=0.3)
    assert time.time() - t0 < 5.0  # bounded, not the 30 s stall
    release.set()  # let the daemon thread exit cleanly


def test_prefetch_late_error_recorded_not_dropped():
    """An error raised after the consumer stopped must not vanish: it is
    stored on the object and re-raised by close() (ADVICE r4)."""
    mesh = make_mesh_for_batch(4)
    entered = threading.Event()

    class LateBoomLoader:
        def __iter__(self):
            yield _batches(1)[0]
            entered.set()
            time.sleep(0.2)  # let the consumer set _stop first
            raise ValueError("late transfer failure")

    pf = DevicePrefetcher(LateBoomLoader(), mesh, depth=1)
    it = iter(pf)
    next(it)
    entered.wait(5)
    pf._stop.set()  # consumer gone: _put will refuse the error tuple
    deadline = time.time() + 5
    while pf.error is None and time.time() < deadline:
        time.sleep(0.02)
    with pytest.raises(ValueError, match="late transfer failure"):
        pf.close()
