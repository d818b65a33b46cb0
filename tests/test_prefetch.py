"""DevicePrefetcher: the train loop's device-side input staging
(tacotron2_tpu/parallel/prefetch.py). The reference relies on CUDA-stream
H2D overlap (torch DataLoader + Lightning, reference run/train.py); here
the staging thread is explicit, so its ordering/shutdown/error contracts
need their own coverage."""

import threading
import time

import numpy as np
import pytest

from tacotron2_tpu.parallel import DevicePrefetcher, DirectStream, make_mesh_for_batch


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
