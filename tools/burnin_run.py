"""Sustained production burn-in runner (PERF.md "production burn-in").

Trains the flagship vanilla dims (B=32, the reference's 100k-step budget —
/root/reference/run/train.py Trainer(max_steps) via the vanilla config) on
the synthetic 64-utterance corpus (tools/burnin_corpus.py) on the REAL
device, end to end through `run.train.do_train`: bucketed input pipeline,
async 5000-step `last.ckpt` saves, TB scalars/histograms, validation every
2500 steps (an int cadence — the corpus is 2 steps/epoch, so the reference's
every-epoch default would validate every 2 steps).

A mid-run kill (deliberate or a tunnel outage) resumes from the last
periodic save:

    python tools/burnin_run.py <workdir> <max_steps>            # fresh
    python tools/burnin_run.py <workdir> <max_steps> --resume   # from last.ckpt

Digest the TB logs afterwards with ``tools/burnin_report.py <workdir>/results``
(it merges event files across the original run and resumes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache, same policy as main.py:49-57
_cache = os.environ.get(
    "TACOTRON2_COMPILE_CACHE", os.path.expanduser("~/.cache/tacotron2_tpu/jax")
)
if _cache and jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def burnin_raw_config(workdir: str, max_steps: int) -> dict:
    return {
        "dataset": {
            "train": os.path.join(workdir, "train.csv"),
            "val": os.path.join(workdir, "val.csv"),
            "test": os.path.join(workdir, "test.csv"),
            "preprocessing": {
                "allowed_chars": "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz",
                "end_token": "^", "num_mels": 80, "trim": False,
                "cache": True, "silence": 0, "sample_rate": 22050,
                "expand_abbreviations": True,
            },
        },
        "training": {
            "lr": 1e-3, "batch_size": 32, "weight_decay": 1e-6,
            "precision": "16-mixed", "name": "burnin",
            "float32_matmul_precision": "high",
            "args": {"max_steps": max_steps, "val_check_interval": 2500},
        },
        "model": {
            "scheduler_milestones": [0.5, 0.75],
            "args": {"prenet_dim": 256, "att_rnn_dim": 1024, "att_dim": 128,
                     "rnn_hidden_dim": 1024, "postnet_dim": 512,
                     "dropout": 0.5, "encoded_dim": 512,
                     "encoder_kernel_size": 5},
        },
        "extensions": {"speaker_tokens": {"active": False},
                       "controls": {"active": False}},
    }


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/t2t_burnin"
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    resume = "--resume" in sys.argv

    if not os.path.exists(os.path.join(workdir, "train.csv")):
        from tools.burnin_corpus import main as build_corpus

        build_corpus(workdir)

    from tacotron2_tpu.config import config_from_dict
    from run.train import do_train

    raw = burnin_raw_config(workdir, max_steps)
    cfg = config_from_dict(raw)
    results = os.path.join(workdir, "results")

    resume_ckpt = None
    if resume:
        last = os.path.join(results, "last.ckpt")
        if os.path.isdir(last):
            resume_ckpt = last
            print(f"resuming from {last}")
        else:
            print("no last.ckpt yet — starting fresh")

    ckpt = do_train(
        cfg, raw, 0, os.path.join(workdir, "speech"), results, resume_ckpt,
    )
    print("BURN-IN TRAIN DONE:", ckpt, flush=True)


if __name__ == "__main__":
    main()
