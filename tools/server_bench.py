"""Serving throughput A/B on real hardware: the warm server's dynamic
micro-batching (run/server.py::_synthesize_batch, one batched fused decode
+ one batched vocoder call) vs the same requests served one at a time.

Flagship-dim Tacotron2 (vanilla-ljspeech-stop config sizes) + UNIVERSAL_V1
HiFi-GAN, random-init with the gate biased to never fire so EVERY request
decodes exactly max_len frames — a deterministic, length-controlled
workload. Timing is honest wall-clock around the full server-side work
(text norm -> batched decode -> batched vocode -> wav write): that is what
a request actually waits for. Sequential serving pays the ~28 ms tunnel
transport per request; batched pays it once — both are the real serving
behavior on this link.

Usage: python tools/server_bench.py [K max_len rounds]  (default 16 256 3)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get(
    "TACOTRON2_COMPILE_CACHE", os.path.expanduser("~/.cache/tacotron2_tpu/jax")
)
if _cache and jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"

TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank.",
    "a second request arrives only microseconds after the first one.",
    "dynamic batching turns concurrent requests into one kernel launch.",
    "the matrix unit is happiest when every lane carries real work.",
]


def build_bundle(max_len: int):
    from run.common import build_model
    from tacotron2_tpu.config import config_from_dict
    from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
    from tacotron2_tpu.models.layers import Policy

    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                      "num_mels": 80, "trim": False,
                                      "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 32, "weight_decay": 0.0,
                     "precision": "16-mixed", "name": "srvbench",
                     "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 256, "att_rnn_dim": 1024,
                           "att_dim": 128, "rnn_hidden_dim": 1024,
                           "postnet_dim": 512, "dropout": 0.5,
                           "encoded_dim": 512, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False},
                       "controls": {"active": False}},
    }
    cfg = config_from_dict(raw_cfg)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # never fire -> every request runs exactly max_len frames
    params["decoder"]["gate"]["b"] = jnp.full_like(
        params["decoder"]["gate"]["b"], 5.0
    )
    voc = HiFiGAN(HiFiGANConfig(), Policy.from_string("bf16-mixed"))
    voc_params = voc.init(jax.random.PRNGKey(1))
    entry = {"name": "srvbench", "max_len": max_len}
    return (cfg, model, params, state, voc, voc_params, entry, None, None)


def main():
    args = [int(x) for x in sys.argv[1:]]
    K = args[0] if len(args) >= 1 else 16
    max_len = args[1] if len(args) >= 2 else 256
    rounds = args[2] if len(args) >= 3 else 3

    from run.server import _synthesize_batch

    bundle = build_bundle(max_len)
    outdir = "/tmp/server_bench"
    os.makedirs(outdir, exist_ok=True)

    def make_reqs(tag):
        return [
            {"text": TEXTS[i % len(TEXTS)], "seed": i,
             "out_path": f"{outdir}/{tag}_{i}.wav", "use_vocoder": True}
            for i in range(K)
        ]

    # warm both program shapes (batch 1 and batch K) + vocoder buckets
    print("warming (compiles)...", flush=True)
    _synthesize_batch(bundle, make_reqs("w1")[:1])
    _synthesize_batch(bundle, make_reqs("wk"))

    seq_times, bat_times = [], []
    for r in range(rounds):
        reqs = make_reqs(f"s{r}")
        t0 = time.perf_counter()
        for q in reqs:
            _synthesize_batch(bundle, [q])
        seq_times.append(time.perf_counter() - t0)

        reqs = make_reqs(f"b{r}")
        t0 = time.perf_counter()
        _synthesize_batch(bundle, reqs)
        bat_times.append(time.perf_counter() - t0)
        print(f"round {r}: sequential {seq_times[-1]*1e3:.0f} ms, "
              f"batched {bat_times[-1]*1e3:.0f} ms", flush=True)

    seq, bat = min(seq_times), min(bat_times)
    frames = K * (max_len - 1)
    audio_s = frames / 86.13
    print(json.dumps({
        "K": K, "max_len": max_len,
        "sequential_ms": round(seq * 1e3, 1),
        "batched_ms": round(bat * 1e3, 1),
        "speedup": round(seq / bat, 2),
        "sequential_rps": round(K / seq, 1),
        "batched_rps": round(K / bat, 1),
        "batched_audio_xRT": round(audio_s / bat, 1),
    }))


if __name__ == "__main__":
    main()
