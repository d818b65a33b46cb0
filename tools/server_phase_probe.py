"""Phase-level timing of the warm server's batched synthesis path on real
hardware — where does a batched /generate window actually spend its time?

Replays the `_synthesize_batch` flow (same bundle builder as
tools/server_bench.py) with a perf_counter around each phase, in BOTH
generations so the transfer rework stays quantified:

OLD (pre-r4d host-stack flow, kept here as the A/B baseline):
  prep    host text-norm + encode + bucket padding + per-request
          jax.random.PRNGKey (one tunnel dispatch EACH)
  decode+fetch  decode call + separate n/gates fetches + the FULL f32
          mel block device->host
  stack   host-side cut/pad/stack, then re-UPLOAD inside the vocode call
  vocode  jitted batched HiFi-GAN (dispatch only — jax is async)
  wavfetch  np.asarray of the f32 waveforms
  write   wav_write of every request

NEW (current run/server.py flow):
  prep    same host prep but host_prng_keys (zero device dispatches)
  decode+fetch  decode call + ONE combined (n, gates) device_get; the
          mel block stays on device
  epilogue  jitted_cut_vocoder dispatch (row gather + cut mask +
          HiFi-GAN + PCM16 quantize in one launch)
  wavfetch  np.asarray of the int16 waveforms (4x fewer bytes than old,
          and no mel ever crossed)
  write   wav_write (int16 passthrough)

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
    from run.common import host_prng_keys, jitted_cut_vocoder, jitted_vocoder
    from run.server import _DECODE_JIT
    from tacotron2_tpu.audio.io import write_wav
    from tacotron2_tpu.text.cleaners import normalize_text
    from tacotron2_tpu.text.encoder import CharEncoder

    bundle = build_bundle(max_len)
    (cfg, model, params, model_state, hifigan, hifi_params, entry, packed,
     _mesh) = bundle
    prep = cfg.dataset.preprocessing
    outdir = "/tmp/server_probe"
    os.makedirs(outdir, exist_ok=True)

    reqs = [
        {"text": TEXTS[i % len(TEXTS)], "seed": i,
         "out_path": f"{outdir}/{i}.wav", "use_vocoder": True}
        for i in range(K)
    ]

    def run(tag, flow):
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
        if flow == "old":  # one device dispatch PER REQUEST
            row_keys = jnp.asarray(np.stack([
                np.asarray(jax.random.PRNGKey(r["seed"])) for r in reqs
            ]))
        else:
            row_keys = jnp.asarray(host_prng_keys([r["seed"] for r in reqs]))
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
        if flow == "old":
            n = int(out.n_frames)
            gates = np.asarray(out.gates)[..., 0]
            mels_post = np.asarray(out.mels_post)  # full f32 mel block
            t[f"decode+fetch[{mels_post.nbytes >> 20}MB]"] = (
                time.perf_counter() - t0)
        else:
            n, gates = jax.device_get((out.n_frames, out.gates))
            n = int(n)
            gates = gates[..., 0]
            t["decode+fetch"] = time.perf_counter() - t0

        neg = gates < 0.0
        first_fire = np.where(neg.any(1), neg.argmax(1), gates.shape[1])
        cuts = [max(min(int(first_fire[b]), n - 1), 1) for b in range(len(reqs))]
        margin = hifigan.mel_receptive_field()
        Tb = -(-(max(cuts) + margin) // 128) * 128

        if flow == "old":
            t0 = time.perf_counter()
            stack = np.stack([
                np.pad(mels_post[b, : cuts[b]], ((0, Tb - cuts[b]), (0, 0)))
                for b in range(len(reqs))
            ])
            t[f"stack[T{Tb}]"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            batch_wav_dev = jitted_vocoder(hifigan)(hifi_params, stack)
            t["vocode"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            batch_wav = np.asarray(batch_wav_dev)  # f32 waveforms
            t[f"wavfetch[{batch_wav.nbytes >> 20}MB]"] = (
                time.perf_counter() - t0)
        else:
            t0 = time.perf_counter()
            row_idx = jnp.asarray(np.arange(len(reqs), dtype=np.int32))
            cuts_dev = jnp.asarray(np.asarray(cuts, np.int32))
            batch_wav_dev = jitted_cut_vocoder(hifigan)(
                hifi_params, out.mels_post, row_idx, cuts_dev, Tb)
            t[f"epilogue[T{Tb}]"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            batch_wav = np.asarray(batch_wav_dev)  # int16 waveforms
            t[f"wavfetch[{batch_wav.nbytes >> 20}MB]"] = (
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
        return total

    print("warming (compiles)...", flush=True)
    run("warm-old", "old")
    run("warm-new", "new")
    best = {}
    for r in range(rounds):  # ABAB so tunnel drift hits both flows
        for flow in ("old", "new"):
            tot = run(f"round{r}-{flow}", flow)
            best[flow] = min(best.get(flow, float("inf")), tot)
    print(f"best: old {best['old']*1e3:.1f} ms  new {best['new']*1e3:.1f} ms  "
          f"speedup {best['old'] / best['new']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
