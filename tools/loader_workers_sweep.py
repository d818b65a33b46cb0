"""Interleaved loader-workers sweep: the direct flagship train loop with
num_workers in {1,2,4,8}, fixed-shape corpus, 2 A/B rounds, median per
count (PERF.md input-staging study; basis for data/loader.py's
default_num_workers). Needs the fixed-duration corpus at
/tmp/t2t_burnin_fixed (build: tools/burnin_corpus.py with dur pinned).

    python tools/loader_workers_sweep.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
_cache = os.path.expanduser("~/.cache/tacotron2_tpu/jax")
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from tools.burnin_run import burnin_raw_config
from run.common import build_model, read_manifest
from run.train import _dataset_kwargs
from tacotron2_tpu.config import config_from_dict
from tacotron2_tpu.data import TTSDataLoader, TTSDataset
from tacotron2_tpu.parallel import (make_mesh_for_batch, make_sharded_train_step,
                                    place_params, place_replicated, shard_batch)
from tacotron2_tpu.training.optimizer import make_optimizer
from tacotron2_tpu.training.train_state import TrainState

workdir = '/tmp/t2t_burnin_fixed'
raw = burnin_raw_config(workdir, 10**6)
cfg = config_from_dict(raw)
jax.config.update("jax_default_matmul_precision", "high")
df = read_manifest(cfg.dataset.train)
ds = TTSDataset(filenames=list(df.wav), texts=list(df.text),
                base_dir=os.path.join(workdir, 'speech'),
                cache_dir=os.path.join(workdir, 'results', 'mel_cache'),
                description_embeddings_dim=768,
                **_dataset_kwargs(cfg.dataset.preprocessing))
model = build_model(cfg)
params, mstate = model.init(jax.random.PRNGKey(0))
tx, _ = make_optimizer(1e-3, 1e-6, grad_clip=1.0)
mesh = make_mesh_for_batch(32)
params = place_params(params, mesh); mstate = place_replicated(mstate, mesh)
ts = TrainState.create(params, mstate, tx)
train_step = make_sharded_train_step(model, tx, mesh)
rng = jax.random.PRNGKey(1)
loaders = {w: TTSDataLoader(ds, batch_size=32, num_workers=w, shuffle=True,
                            drop_last=True, bucket_chars=32, bucket_frames=128)
           for w in (1, 2, 4, 8)}

def run(loader, steps=100):
    global ts
    done, t0, metrics = 0, None, None
    while done < steps:
        for batch in loader:
            if done >= steps: break
            db = shard_batch({k: v for k, v in batch.items()
                              if isinstance(v, np.ndarray)}, mesh)
            ts, metrics = train_step(ts, db, rng)
            done += 1
            if done == 15:
                float(metrics["loss"]); t0 = time.perf_counter()
    float(metrics["loss"])
    return (time.perf_counter() - t0) / (steps - 15)

run(loaders[8], 20)  # warm/compile
walls = {w: [] for w in loaders}
for r in range(2):
    for w, ld in loaders.items():
        t = run(ld)
        walls[w].append(t)
        print(f"round {r} workers={w}: {t*1e3:.1f} ms/step", flush=True)
for w, ws in walls.items():
    t = float(np.median(ws))
    print(f"workers={w}: median {t*1e3:.1f} ms/step = {32*474/t/1e3:.0f}k frames/s")
