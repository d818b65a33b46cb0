"""Attribute the real train-loop's per-step wall (run/train.py loop) on
hardware: loader-next vs shard_batch vs step-dispatch vs residual (device
drain at the window fetch). The burn-in's honest counter (~150k frames/s
fixed-shape) sits ~2x under the chained-step device bound (45.4 ms/step,
PERF.md) — this finds the serializer.

    python tools/train_loop_probe.py [steps=120]
Uses the fixed-shape corpus at /tmp/t2t_burnin_fixed (tools notes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.expanduser("~/.cache/tacotron2_tpu/jax")
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from tools.burnin_run import burnin_raw_config


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    workdir = "/tmp/t2t_burnin_fixed"
    assert os.path.exists(os.path.join(workdir, "train.csv")), (
        "build the fixed corpus first (see session notes)"
    )
    from run.common import build_model, read_manifest
    from run.train import _dataset_kwargs
    from tacotron2_tpu.config import config_from_dict
    from tacotron2_tpu.data import TTSDataLoader, TTSDataset
    from tacotron2_tpu.parallel import (
        make_mesh_for_batch, make_sharded_train_step, place_params,
        place_replicated, shard_batch,
    )
    from tacotron2_tpu.training.optimizer import make_optimizer
    from tacotron2_tpu.training.train_state import TrainState

    raw = burnin_raw_config(workdir, 10**6)
    cfg = config_from_dict(raw)
    jax.config.update("jax_default_matmul_precision", "high")
    df = read_manifest(cfg.dataset.train)
    ds = TTSDataset(
        filenames=list(df.wav), texts=list(df.text),
        base_dir=os.path.join(workdir, "speech"),
        cache_dir=os.path.join(workdir, "results", "mel_cache"),
        description_embeddings_dim=768,
        **_dataset_kwargs(cfg.dataset.preprocessing),
    )
    loader = TTSDataLoader(ds, batch_size=32,
                           num_workers=int(os.environ.get("PROBE_WORKERS", "8")),
                           shuffle=True,
                           drop_last=True, bucket_chars=32, bucket_frames=128)
    model = build_model(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 1e-6, grad_clip=1.0)
    mesh = make_mesh_for_batch(32)
    params = place_params(params, mesh)
    mstate = place_replicated(mstate, mesh)
    ts = TrainState.create(params, mstate, tx)
    train_step = make_sharded_train_step(model, tx, mesh)
    rng = jax.random.PRNGKey(1)

    def run_direct(steps):
        nonlocal ts
        t_loader = t_put = t_disp = t_host = 0.0
        done, t0, metrics = 0, None, None
        while done < steps:
            it = iter(loader)
            while done < steps:
                ta = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                tb = time.perf_counter()
                db = shard_batch(
                    {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}, mesh
                )
                tc = time.perf_counter()
                ts, metrics = train_step(ts, db, rng)
                td = time.perf_counter()
                _ = int(np.sum(batch["mel_len"]))
                te = time.perf_counter()
                done += 1
                if done == 20:  # skip warm/compile for the attribution window
                    float(metrics["loss"])  # drain
                    t_loader = t_put = t_disp = t_host = 0.0
                    t0 = time.perf_counter()
                else:
                    t_loader += tb - ta
                    t_put += tc - tb
                    t_disp += td - tc
                    t_host += te - td
        float(metrics["loss"])  # drain the pipeline
        wall = time.perf_counter() - t0
        n = steps - 20
        print(f"direct loop: {n} steps, wall {wall:.2f}s = {wall/n*1e3:.1f} ms/step",
              flush=True)
        for name, v in (("loader next", t_loader), ("shard_batch", t_put),
                        ("step dispatch", t_disp), ("host rest", t_host)):
            print(f"  {name}: {v/n*1e3:6.1f} ms/step")
        print(f"  residual (device drain): "
              f"{(wall - t_loader - t_put - t_disp - t_host)/n*1e3:6.1f} ms/step",
              flush=True)
        return wall / n

    def run_prefetch(steps):
        nonlocal ts
        from tacotron2_tpu.parallel import DevicePrefetcher

        pf = DevicePrefetcher(loader, mesh, depth=2)
        t_next = 0.0
        done, t0, metrics = 0, None, None
        for db, batch in pf:
            tc = time.perf_counter()
            ts, metrics = train_step(ts, db, rng)
            _ = int(np.sum(batch["mel_len"]))
            done += 1
            if done == 20:
                float(metrics["loss"])
                t_next, t0 = 0.0, time.perf_counter()
            else:
                t_next += time.perf_counter() - tc
            if done >= steps:
                break
        pf.close()
        float(metrics["loss"])
        wall = time.perf_counter() - t0
        n = steps - 20
        print(f"prefetch loop: {n} steps, wall {wall:.2f}s = {wall/n*1e3:.1f} ms/step "
              f"(host-visible {t_next/n*1e3:.1f} ms/step)", flush=True)
        return wall / n

    def run_host_prefetch(steps):
        # stage only the HOST loader on a thread; shard_batch + dispatch on
        # the main thread (the fence-probe mode-B pattern: puts issued
        # right after a dispatch return measured +4 ms/step)
        nonlocal ts
        import queue as _q
        import threading as _t

        hq: "_q.Queue" = _q.Queue(maxsize=2)
        stop = _t.Event()

        def work():
            while not stop.is_set():
                for b in loader:
                    while not stop.is_set():
                        try:
                            hq.put(b, timeout=0.1)
                            break
                        except _q.Full:
                            continue
                    if stop.is_set():
                        return

        th = _t.Thread(target=work, daemon=True)
        th.start()
        done, t0, metrics = 0, None, None
        t_host = 0.0
        try:
            while done < steps:
                ta = time.perf_counter()
                batch = hq.get()
                db = shard_batch(
                    {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                    mesh,
                )
                ts, metrics = train_step(ts, db, rng)
                _ = int(np.sum(batch["mel_len"]))
                done += 1
                if done == 20:
                    float(metrics["loss"])
                    t_host, t0 = 0.0, time.perf_counter()
                else:
                    t_host += time.perf_counter() - ta
        finally:
            stop.set()
            while th.is_alive():
                try:
                    hq.get_nowait()
                except _q.Empty:
                    pass
                th.join(timeout=0.1)
        float(metrics["loss"])
        wall = time.perf_counter() - t0
        n = steps - 20
        print(f"host-prefetch loop: {n} steps, wall {wall:.2f}s = "
              f"{wall/n*1e3:.1f} ms/step (host-visible {t_host/n*1e3:.1f} ms/step)",
              flush=True)
        return wall / n

    # A/B/A/B rounds against tunnel-latency drift (CLAUDE.md timing protocol)
    variants = {"direct": run_direct, "prefetch": run_prefetch,
                "host-prefetch": run_host_prefetch}
    want = [v.strip() for v in os.environ.get(
        "PROBE_VARIANTS", "direct,prefetch,host-prefetch").split(",")]
    rounds = int(os.environ.get("PROBE_ROUNDS", "1"))
    walls = {k: [] for k in want}
    for _ in range(rounds):
        for k in want:
            walls[k].append(variants[k](steps))
    B, F = 32, 474  # real frames per fixed-corpus utterance (5.5 s)
    for k, v in walls.items():
        t = float(np.median(v))
        print(f"{k}: median {t*1e3:.1f} ms/step = "
              f"{B*F/t/1e3:.0f}k real mel frames/s")


if __name__ == "__main__":
    main()
