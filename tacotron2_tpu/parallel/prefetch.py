"""Training input staging: an endless (device_batch, host_batch) stream.

The reference feeds its model through a torch DataLoader whose workers
stop at host RAM; the CUDA runtime then overlaps H2D copies with compute
via streams for free (reference train path: run/train.py Trainer +
torch_data.DataLoader, model/tts_model.py training_step). Here the
staging is explicit, and which variant wins depends on the host:

- :class:`DirectStream` (default): stage inline on the loop thread.
  The fast ``shard_batch`` (plain per-device puts) already overlaps
  in-flight executes when issued between dispatches (+2.6 ms/step for a
  5.3 MB flagship batch; tools/transfer_fence_probe.py mode B), and on
  the 1-core harness every extra host thread starves the transport's
  own RPC processing.
- :class:`DevicePrefetcher` (opt-in, ``TACOTRON2_DEVICE_PREFETCH=1``):
  stage ``depth`` batches ahead on a background thread. On THIS 1-core
  harness it measured neutral at num_workers=8 and sharply negative at
  num_workers=1 (83k vs 161k frames/s; tools/train_loop_probe.py ABAB
  rounds) — kept as an option for multi-core hosts, where loader
  decode/collate and the transfer genuinely overlap device compute.

Both stream epochs continuously (the loader reshuffles per epoch via its
own epoch counter) so short epochs pay no per-epoch restart, and both
raise if the loader yields no batches (the old loop would spin).
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time
from typing import Iterator, Optional, Tuple

import numpy as np

from tacotron2_tpu.parallel.mesh import shard_batch


def use_device_prefetch(env: Optional[str] = None, cores: Optional[int] = None) -> bool:
    """Staging policy: thread-staged :class:`DevicePrefetcher` vs inline
    :class:`DirectStream`.

    Core-count-adaptive like ``data.loader.default_num_workers`` (VERDICT
    r4 #6): the measured facts are that a background staging thread
    STARVES a 1-core host's transport RPC processing (83k vs 161k
    frames/s at num_workers=1; tools/train_loop_probe.py) but genuinely
    overlaps loader decode + H2D with device compute when spare cores
    exist. Policy: prefetch on hosts with >= 4 cores; the env var
    ``TACOTRON2_DEVICE_PREFETCH`` (``1``/``0``) is an explicit OVERRIDE
    in either direction, no longer the only switch.
    """
    if env is None:
        env = os.environ.get("TACOTRON2_DEVICE_PREFETCH")
    if env is not None and env != "":
        return env not in ("0", "false", "no", "off")
    if cores is None:
        cores = os.cpu_count() or 1
    return cores >= 4


class DirectStream:
    """The no-thread twin of :class:`DevicePrefetcher`: an endless
    ``(device_batch, host_batch)`` stream staged inline on the caller's
    thread. This is the DEFAULT training input path — on the 1-core
    harness every extra host thread steals CPU from the transport's own
    RPC processing (measured: direct 161k vs thread-staged 83k frames/s
    at num_workers=1, neutral at 8; tools/train_loop_probe.py), and the
    fast ``shard_batch`` put already overlaps in-flight executes when
    issued between dispatches (tools/transfer_fence_probe.py mode B:
    +2.6 ms/step for a 5.3 MB batch)."""

    def __init__(self, loader, mesh):
        self.loader = loader
        self.mesh = mesh

    def __iter__(self) -> Iterator[Tuple[dict, dict]]:
        while True:
            n = 0
            for batch in self.loader:
                np_batch = {
                    k: v for k, v in batch.items() if isinstance(v, np.ndarray)
                }
                yield shard_batch(np_batch, self.mesh), batch
                n += 1
            if n == 0:
                raise RuntimeError(
                    "DirectStream: loader produced no batches (empty dataset "
                    "or batch_size > len(dataset) with drop_last)"
                )

    def close(self) -> None:  # interface parity with DevicePrefetcher
        pass


class DevicePrefetcher:
    """An endless ``(device_batch, host_batch)`` stream over a loader.

    ``device_batch`` is the loader batch's ndarray fields placed with
    ``shard_batch`` (leading axis over the mesh's "data" axis);
    ``host_batch`` is the untouched host batch (the loop still needs
    ``mel_len`` for the honest frames counter). The stream never ends on
    its own — the consumer stops via ``break`` (the generator's
    ``finally`` closes the stage thread) or an explicit ``close()``.

    Exceptions raised by the loader or the transfer surface on the
    consumer thread at the next ``next()``.
    """

    def __init__(self, loader, mesh, depth: int = 2):
        assert depth >= 1
        self.loader = loader
        self.mesh = mesh
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.error: Optional[BaseException] = None  # late failure, see _work

    # -- producer ---------------------------------------------------------
    def _put(self, item) -> bool:
        # bounded put that aborts when the consumer is gone (a plain
        # blocking put would leak this thread — same pattern as
        # data/loader.py's producer)
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _work(self) -> None:
        try:
            while not self._stop.is_set():
                n = 0
                for batch in self.loader:
                    if self._stop.is_set():
                        return
                    np_batch = {
                        k: v for k, v in batch.items() if isinstance(v, np.ndarray)
                    }
                    staged = shard_batch(np_batch, self.mesh)
                    if not self._put(((staged, batch), None)):
                        return
                    n += 1
                if n == 0:
                    raise RuntimeError(
                        "DevicePrefetcher: loader produced no batches "
                        "(empty dataset or batch_size > len(dataset) with "
                        "drop_last)"
                    )
        except BaseException as e:  # surface on the consumer thread
            if not self._put((None, e)):
                # consumer already stopped: nothing will drain the queue,
                # so record the failure instead of dropping it silently —
                # close() re-raises it and shutdown logs still show it
                self.error = e
                print(f"DevicePrefetcher: error during shutdown: {e!r}",
                      file=sys.stderr)

    # -- consumer ---------------------------------------------------------
    def __iter__(self) -> Iterator[Tuple[dict, dict]]:
        if self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(
                target=self._work, name="device-prefetch", daemon=True
            )
            self._thread.start()
        try:
            while True:
                item, err = self._q.get()
                if err is not None:
                    raise err
                yield item
        finally:
            self.close()

    def close(self, join_timeout: float = 5.0) -> None:
        """Stop the stage thread and drain staged batches (idempotent).

        The join is BOUNDED: the stage thread may be blocked inside a
        ``device_put`` through a hung tunnel (documented ~15-min axon
        failure mode, CLAUDE.md) — an unbounded ``while is_alive()``
        loop would then hang the train loop's ``finally`` forever. After
        ``join_timeout`` seconds the daemon thread is abandoned with a
        warning instead of blocking shutdown.
        """
        self._stop.set()
        t = self._thread
        if t is None:
            return
        deadline = time.monotonic() + join_timeout
        while t.is_alive():
            try:  # wake a producer blocked on a full queue
                self._q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.1)
            if t.is_alive() and time.monotonic() > deadline:
                print(
                    "DevicePrefetcher.close(): stage thread still alive after "
                    f"{join_timeout:.1f}s (transfer stuck on a hung device "
                    "transport?) — abandoning daemon thread",
                    file=sys.stderr,
                )
                break
        self._thread = None
        if self.error is not None:
            err, self.error = self.error, None
            raise err
