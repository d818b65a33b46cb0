"""Phase-level timing of the warm server's batched synthesis path on real
hardware — where does a batched /generate window actually spend its time?

Replays the exact `_synthesize_batch` flow (same bundle builder as
tools/server_bench.py) but with a perf_counter around each phase:

  prep    host text-norm + encode + bucket padding
  decode  jitted fused decode call + the n_frames/gates/mels fetches
  stack   host-side cut/pad/stack of the vocoder input
  vocode  jitted batched HiFi-GAN call (dispatch only — jax is async)
  fetch   np.asarray(batch_wav) device->host of the waveforms
  write   wav_write of every request

Usage: python tools/server_phase_probe.py [K max_len rounds]
"""

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


def main():
    args = [int(x) for x in sys.argv[1:]]
    K = args[0] if len(args) >= 1 else 16
    max_len = args[1] if len(args) >= 2 else 256
    rounds = args[2] if len(args) >= 3 else 3

    from tools.server_bench import build_bundle, TEXTS
    from run.common import jitted_vocoder
    from run.server import _DECODE_JIT
    from tacotron2_tpu.audio.io import write_wav
    from tacotron2_tpu.text.cleaners import normalize_text
    from tacotron2_tpu.text.encoder import CharEncoder

    bundle = build_bundle(max_len)
    cfg, model, params, model_state, hifigan, hifi_params, entry, packed = bundle
    prep = cfg.dataset.preprocessing
    outdir = "/tmp/server_probe"
    os.makedirs(outdir, exist_ok=True)

    reqs = [
        {"text": TEXTS[i % len(TEXTS)], "seed": i,
         "out_path": f"{outdir}/{i}.wav", "use_vocoder": True}
        for i in range(K)
    ]

    def run(tag):
        t = {}
        t0 = time.perf_counter()
        encoder = CharEncoder(prep.allowed_chars, prep.end_token)
        norms = [
            normalize_text(r["text"], prep.allowed_chars, prep.end_token, False)
            for r in reqs
        ]
        chars, lens = encoder.encode_batch(norms)
        B, L = chars.shape
        Lb = max(128, -(-L // 128) * 128)
        chars = np.pad(chars, ((0, 0), (0, Lb - L)))
        row_keys = jnp.asarray(np.stack([
            np.asarray(jax.random.PRNGKey(r["seed"])) for r in reqs
        ]))
        t["prep"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        sig = (id(model), chars.shape, max_len, False, ())
        fn = _DECODE_JIT.get(sig)
        if fn is None:
            def fn(params_, state_, chars_, lens_, row_keys_, kw):
                return model.forward_infer_fast(
                    params_, state_, chars_, lens_, max_len,
                    rng=row_keys_[0], row_rngs=row_keys_, **kw)
            fn = jax.jit(fn)
            _DECODE_JIT[sig] = fn
        out = fn(params, model_state, jnp.asarray(chars), jnp.asarray(lens),
                 row_keys, {})
        n = int(out.n_frames)
        gates = np.asarray(out.gates)[..., 0]
        mels_post = np.asarray(out.mels_post)
        t["decode+fetch"] = time.perf_counter() - t0

        neg = gates < 0.0
        first_fire = np.where(neg.any(1), neg.argmax(1), gates.shape[1])
        cuts = [max(min(int(first_fire[b]), n - 1), 1) for b in range(len(reqs))]

        for margin_tag, margin in (("rf", hifigan.mel_receptive_field()),
                                   ("nomargin", 0)):
            t0 = time.perf_counter()
            Tb = -(-(max(cuts) + margin) // 128) * 128
            stack = np.stack([
                np.pad(mels_post[b, : cuts[b]], ((0, Tb - cuts[b]), (0, 0)))
                for b in range(len(reqs))
            ])
            t[f"stack[{margin_tag}:T{Tb}]"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            batch_wav_dev = jitted_vocoder(hifigan)(hifi_params, stack)
            t[f"vocode[{margin_tag}]"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            batch_wav = np.asarray(batch_wav_dev)
            t[f"wavfetch[{margin_tag}:{batch_wav.nbytes >> 20}MB]"] = (
                time.perf_counter() - t0)

        t0 = time.perf_counter()
        factor = batch_wav.shape[1] // Tb
        for b, r in enumerate(reqs):
            write_wav(r["out_path"], batch_wav[b, : cuts[b] * factor],
                      prep.sample_rate)
        t["write"] = time.perf_counter() - t0

        total = sum(t.values())
        print(f"{tag}: total {total*1e3:7.1f} ms  " +
              "  ".join(f"{k} {v*1e3:.1f}" for k, v in t.items()), flush=True)

    print("warming (compiles)...", flush=True)
    run("warm")
    for r in range(rounds):
        run(f"round{r}")


if __name__ == "__main__":
    main()
