"""Checkpoint / resume via Orbax.

Reference behavior to reproduce (SURVEY §5.4): Lightning embeds
hyperparameters in the ckpt (model/tts_model.py:46); resume restores
optimizer/scheduler/step (run/train.py:245-250); explicit ``final.ckpt`` /
``finetuned.ckpt`` saves (run/train.py:252-255).

Our layout (one checkpoint = one directory):
    <dir>/config.json   — the full 4-section config + num_chars (the
                          "save_hyperparameters" analog)
    <dir>/model/        — Orbax: {"params", "model_state"}
    <dir>/train/        — Orbax: {"opt_state", "step"} (resume only)

Inference loads ``model/`` with no optimizer; resume additionally restores
``train/`` against the live optimizer's abstract state.
"""

from __future__ import annotations

import json
import os
from os import path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(
    ckpt_dir: str,
    params,
    model_state,
    config_dict: Optional[Dict[str, Any]] = None,
    opt_state=None,
    step: Optional[int] = None,
) -> str:
    ckpt_dir = path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = _checkpointer()
    # gather to host numpy before saving: checkpoints must be topology-free
    # (a ckpt written on an 8-device mesh must load in any process)
    host = lambda tree: jax.tree.map(lambda x: np.asarray(x), tree)
    ckptr.save(
        path.join(ckpt_dir, "model"),
        {"params": host(params), "model_state": host(model_state)},
        force=True,
    )
    if opt_state is not None:
        ckptr.save(
            path.join(ckpt_dir, "train"),
            {"opt_state": host(opt_state), "step": np.asarray(step if step is not None else 0)},
            force=True,
        )
    if config_dict is not None:
        with open(path.join(ckpt_dir, "config.json"), "w") as f:
            json.dump(config_dict, f, indent=2)
    ckptr.wait_until_finished()
    return ckpt_dir


class AsyncSaver:
    """Non-blocking periodic checkpointing for the train loop.

    ``save(...)`` snapshots the pytrees by DEVICE-SIDE COPY on the
    caller's thread (see the comment in ``save`` — a by-reference
    snapshot races with the train step's buffer donation) and runs the
    device→host gather + Orbax write in a background thread, so training
    keeps stepping during the ~100 MB fetch that a synchronous periodic
    save stalls on (several seconds through the tunnel every 5000
    steps). Saves serialize: a new ``save`` first joins the previous one
    (at a 45 ms/step cadence the previous save is long done), and
    ``wait()`` must be called before the final synchronous save. Errors
    surface on the NEXT save/wait rather than being lost.

    The thread is deliberately NON-daemon: Orbax's ``force=True``
    removes the existing ``last.ckpt`` before finalizing the new one, so
    an interpreter exit mid-save (train loop raised, Ctrl-C) must let
    the in-flight save FINISH — a daemon thread would be killed between
    the delete and the finalize, destroying the one checkpoint an
    interrupted run needs for resume. The driver also wait()s in a
    finally block so the error path still joins promptly.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, ckpt_dir: str, params, model_state, config_dict=None,
             opt_state=None, step=None):
        import threading

        self.wait()

        # Snapshot by DEVICE-SIDE COPY, not by reference: the train step
        # donates its params/opt_state buffers (make_sharded_train_step
        # donate=True), so once the loop dispatches the next step the
        # originals are DELETED — a background gather still holding them
        # raises "Array has been deleted". The copies are enqueued here,
        # BEFORE the loop's next dispatch, so in-order device execution
        # reads the buffers while they are still valid; the copies
        # themselves are never step inputs, so never donated. (Found by
        # the 50k-step hardware burn-in at the step-10000 save; invisible
        # on CPU tests, where donation is a no-op.) Host numpy leaves
        # (e.g. a restored step counter) pass through unchanged.
        snap = lambda tree: jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, tree
        )
        params, model_state = snap(params), snap(model_state)
        opt_state = snap(opt_state) if opt_state is not None else None

        def run():
            try:
                save_checkpoint(ckpt_dir, params, model_state, config_dict,
                                opt_state=opt_state, step=step)
            except Exception as exc:  # re-raised from the train loop thread
                self._error = exc

        self._thread = threading.Thread(target=run, daemon=False)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def _restore_numpy(item_path: str):
    """Restore a pytree saved by save_checkpoint (host numpy — topology-free;
    device placement is the caller's job)."""
    return _checkpointer().restore(item_path)


def load_model(ckpt_dir: str) -> Tuple[Any, Any, Dict[str, Any]]:
    """-> (params, model_state, saved_config_dict) as host numpy arrays."""
    ckpt_dir = path.abspath(ckpt_dir)
    restored = _restore_numpy(path.join(ckpt_dir, "model"))
    cfg = {}
    cfg_path = path.join(ckpt_dir, "config.json")
    if path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    return restored["params"], restored["model_state"], cfg


def load_train(ckpt_dir: str, abstract_opt_state) -> Tuple[Any, int]:
    """Resume: restore (opt_state, step) as host numpy in the live
    optimizer's structure; the caller places it on its mesh.

    Validation is per-leaf shape AND dtype, not just leaf count — a
    same-count/different-shape tree would otherwise unflatten into garbage
    and fail deep inside optax instead of here."""
    ckpt_dir = path.abspath(ckpt_dir)
    restored = _restore_numpy(path.join(ckpt_dir, "train"))
    flat_restored = jax.tree.leaves(restored["opt_state"])
    flat_live, treedef = jax.tree.flatten(abstract_opt_state)
    if len(flat_restored) != len(flat_live):
        raise ValueError(
            f"optimizer state in checkpoint does not match the current "
            f"optimizer: {len(flat_restored)} leaves vs {len(flat_live)}"
        )
    for i, (r, live) in enumerate(zip(flat_restored, flat_live)):
        r_shape = getattr(r, "shape", ())
        live_shape = getattr(live, "shape", ())
        if tuple(r_shape) != tuple(live_shape):
            raise ValueError(
                f"optimizer state in checkpoint does not match the current "
                f"optimizer: leaf {i} shape {tuple(r_shape)} vs {tuple(live_shape)}"
            )
        r_dtype = getattr(r, "dtype", None)
        live_dtype = getattr(live, "dtype", None)
        if r_dtype is not None and live_dtype is not None and np.dtype(r_dtype) != np.dtype(live_dtype):
            raise ValueError(
                f"optimizer state in checkpoint does not match the current "
                f"optimizer: leaf {i} dtype {r_dtype} vs {live_dtype}"
            )
    opt_state = jax.tree.unflatten(treedef, flat_restored)
    return opt_state, int(restored["step"])


def has_train_state(ckpt_dir: str) -> bool:
    return path.exists(path.join(path.abspath(ckpt_dir), "train"))
