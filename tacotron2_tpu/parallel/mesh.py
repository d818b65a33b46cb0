"""Device mesh + sharding layer.

The reference is single-process single-GPU (SURVEY §2.8: Trainer pinned to
``devices=[device]``, run/train.py:236-239; no NCCL/Gloo/MPI anywhere). The
TPU-native scaling story replaces that with:

- a ("data", "model") ``jax.sharding.Mesh``; batch axes sharded over "data"
  (DP), the fat decoder matmuls optionally sharded over "model" (TP hooks —
  not needed for parity at ~28M params, SURVEY §2.8, but the partition specs
  are wired so larger configs shard without code changes)
- placement-driven GSPMD: params are ``device_put`` with their shardings
  BEFORE ``tx.init`` so optimizer moments inherit the layout; ``jax.jit``
  then compiles one SPMD program and XLA inserts the psum gradient
  all-reduce over ICI. Multi-host runs the same code after
  ``jax.distributed.initialize`` (DCN). No collective library: XLA emits
  the collectives (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1- or 2-D ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def make_mesh_for_batch(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Largest data-parallel mesh whose size divides the global batch.
    Warns loudly when devices have to be dropped (e.g. batch 31 on 8
    devices would silently train on 1 chip otherwise)."""
    devices = jax.devices()
    n = len(devices) // model_parallel * model_parallel
    while n > model_parallel and batch_size % (n // model_parallel) != 0:
        n -= model_parallel
    n = max(n, model_parallel)
    if n < len(devices):
        import warnings

        warnings.warn(
            f"batch_size={batch_size} is not divisible across "
            f"{len(devices)} devices (model_parallel={model_parallel}); "
            f"using only {n} device(s) — {len(devices) - n} idle. "
            f"Pick a batch size divisible by the data-parallel degree.",
            stacklevel=2,
        )
    return make_mesh(n_devices=n, model_parallel=model_parallel)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def _spec_for_param(path: tuple, leaf) -> P:
    """TP partition specs: LSTM gate projections (in, 4H) shard the output
    dim over "model" (column parallel); small tensors stay replicated. With
    model_parallel=1 these collapse to replication."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    key = names[-1] if names else ""
    if key in ("w_ih", "w_hh") and getattr(leaf, "ndim", 0) == 2:
        return P(None, "model")
    if key in ("b_ih", "b_hh"):
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings for the param pytree (divisibility-checked)."""

    def to_sharding(path, leaf):
        spec = _spec_for_param(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def place_params(params, mesh: Mesh):
    """device_put params with their TP/replicated shardings. Do this BEFORE
    ``tx.init`` / ``TrainState.create`` so optimizer state inherits layout."""
    sh = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, sh)


def place_replicated(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch with its leading axis sharded over "data".

    Multi-host (SURVEY §5.8): when the mesh spans processes the target
    sharding is not fully addressable, so each process contributes its
    addressable shards from the (identical, deterministically-ordered)
    host copy via make_array_from_callback — the DCN-ready input path.

    Single-process: plain per-device ``device_put`` pieces wrapped with
    ``make_array_from_single_device_arrays`` instead of the sharded
    ``device_put(v, NamedSharding)`` path — on the tunneled transport the
    sharded put is host-synchronous (~+20 ms/step at flagship batch
    shapes vs +2.6 ms for plain puts; tools/transfer_fence_probe.py modes
    B/E), while plain puts overlap in-flight executes. The result carries
    the identical NamedSharding, so jitted-step signatures (and the
    compile cache) are unaffected."""
    sh = batch_sharding(mesh)
    import numpy as np

    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_callback(
                np.shape(v), sh, lambda idx, v=v: np.asarray(v)[idx]
            )
            for k, v in batch.items()
        }
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        idx_map = sh.addressable_devices_indices_map(v.shape)
        pieces = [jax.device_put(v[idx], d) for d, idx in idx_map.items()]
        out[k] = jax.make_array_from_single_device_arrays(v.shape, sh, pieces)
    return out


def make_sharded_train_step(model, tx, mesh: Mesh, donate: bool = True,
                            prosody=None, pallas_train=None):
    """DP/TP train step: same pure step as single-chip, jitted; sharding
    comes from argument placement (place_params/shard_batch). The loss/BN
    means over the DP-sharded batch axis compile to psums over ICI.

    On >1-device meshes the launch-resident Pallas training kernels run
    per data shard under ``jax.shard_map`` (decode has no cross-batch
    ops; weight cotangents psum over ICI) — per-device batch B/ndev must
    satisfy the kernel's own dispatch guards, so global B <= 256 on 8
    devices keeps the full fwd+bwd kernel. TP meshes ("model" > 1) and
    indivisible batches fall back to the XLA hoisted scan automatically
    (the dispatch lives in Tacotron2.forward_teacher).

    ``prosody``: optional frozen-predictor style-loss triple (see
    training/step.py:build_train_step). ``pallas_train``: tri-state
    override forwarded to the model (None = auto by backend/VMEM)."""
    from tacotron2_tpu.training.step import build_train_step

    step = build_train_step(
        model, tx, prosody=prosody, pallas_train=pallas_train,
        shard_mesh=mesh if mesh.size > 1 else None,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())
