"""Multi-host worker: one simulated host of a 2-process DCN training run.

Invoked by tests/test_multihost.py as
    python multihost_worker.py <process_id> <coordinator_port> <workdir>

Each process gets 4 virtual CPU devices (2 hosts x 4 = 8 global devices,
gloo cross-process collectives — JAX's CPU stand-in for DCN). It then runs
the REAL training driver (run.train.do_train) on the tiny corpus staged in
<workdir>; the SPMD step, batch sharding, checkpointing, and logging are
exactly the production path (SURVEY §5.8: multi-host = same code after
jax.distributed.initialize).
"""

import json
import os
import sys

# backend choices must land before first backend use (jax is already
# imported by sitecustomize; init is lazy — same trick as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# share the suite's persistent compile cache (tests/conftest.py): the two
# workers' cold train-step compiles dominate the test's ~3 min otherwise
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    workdir = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from run.train import do_train
    from tacotron2_tpu.config import config_from_dict

    with open(os.path.join(workdir, "config.json")) as f:
        raw = json.load(f)
    cfg = config_from_dict(raw)

    out = do_train(
        cfg, raw, 0,
        speech_dir=os.path.join(workdir, "speech"),
        results_dir=os.path.join(workdir, "results_multihost"),
        resume_ckpt=None,
        log_every=1,
    )
    print(f"worker {pid}: done, ckpt {out}", flush=True)


if __name__ == "__main__":
    main()
