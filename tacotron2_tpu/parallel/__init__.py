from tacotron2_tpu.parallel.prefetch import (
    DevicePrefetcher,
    DirectStream,
    use_device_prefetch,
)
from tacotron2_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    make_sharded_train_step,
    param_shardings,
    place_params,
    place_replicated,
    replicated,
    shard_batch,
)

__all__ = [
    "DevicePrefetcher",
    "DirectStream",
    "use_device_prefetch",
    "make_mesh",
    "make_mesh_for_batch",
    "batch_sharding",
    "param_shardings",
    "place_params",
    "place_replicated",
    "replicated",
    "shard_batch",
    "make_sharded_train_step",
]
