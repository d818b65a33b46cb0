"""Hardware smoke: full train -> checkpoint -> say (default + int8) -> batch
test on the REAL accelerator, with a synthetic corpus. ~3 minutes on a v5e.

    python tools/tpu_smoke.py [workdir]

Exercises the flagship-dims model end to end on whatever device JAX sees —
this is the script that caught the axon-transport issues (a failed complex
FFT wedging the device; sharded checkpoints failing cross-topology).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(workdir: str = "/tmp/tacotron2_tpu_smoke") -> None:
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    from tacotron2_tpu.audio.io import read_wav, write_wav
    from tacotron2_tpu.config import config_from_dict

    os.makedirs("speech", exist_ok=True)
    rows = []
    for i in range(8):
        t = np.arange(int(22050 * (0.4 + 0.1 * i))) / 22050
        wav = (0.3 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        write_wav(f"speech/u{i}.wav", wav, 22050)
        rows.append(f"synthetic utterance number {i}|u{i}.wav")
    for split, sel in (("train", rows), ("val", rows[:2]), ("test", rows[:2])):
        with open(f"{split}.csv", "w") as f:
            f.write("text|wav\n" + "\n".join(sel) + "\n")

    raw = {
        "dataset": {"train": "train.csv", "val": "val.csv", "test": "test.csv",
                     "preprocessing": {
                         "allowed_chars": "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz",
                         "end_token": "^", "num_mels": 80, "trim": False,
                         "cache": True, "silence": 0}},
        "training": {"lr": 1e-3, "batch_size": 4, "weight_decay": 1e-6,
                      "precision": "bf16-mixed", "name": "tpu-smoke",
                      "float32_matmul_precision": "high",
                      "args": {"max_steps": 15}},
        "model": {"scheduler_milestones": [0.5],
                   "args": {"prenet_dim": 256, "att_rnn_dim": 1024, "att_dim": 128,
                            "rnn_hidden_dim": 1024, "postnet_dim": 512,
                            "dropout": 0.5, "encoded_dim": 512,
                            "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False},
                        "controls": {"active": False}},
    }
    cfg = config_from_dict(raw)

    from run.train import do_train

    # fresh results dir: a rerun in the same workdir would APPEND a second
    # TB event file and the loss-drop gate below would compare scalars
    # across different runs (EventAccumulator's restart purge is
    # nondeterministic about which survive)
    import shutil

    shutil.rmtree("results", ignore_errors=True)
    ckpt = do_train(cfg, raw, 0, "speech", "results", None, log_every=5)
    print("TRAIN OK:", ckpt, flush=True)

    # --- convergence / health gates (VERDICT r2 #8): catch the regression
    # class gradient-agreement tests can't — wrong data, wrong masking,
    # wrong schedule all produce self-consistent gradients ---------------
    from tacotron2_tpu.utils.diagnostics import (
        alignment_metrics,
        gate_accuracy,
        tb_scalar_series,
    )

    losses = tb_scalar_series("results/lightning_logs/tpu-smoke*", "training_loss")
    first, last = losses[0][1], losses[-1][1]
    assert last < 0.7 * first, (
        f"training loss did not drop: {first:.3f} -> {last:.3f} "
        f"(expected >= 30% drop in {len(losses)} logged steps)"
    )
    print(f"LOSS-DROP OK: {first:.3f} -> {last:.3f}", flush=True)

    import jax

    from run.common import build_model, load_tacotron_checkpoint
    from tacotron2_tpu.data import TTSDataLoader, TTSDataset

    params, model_state, _ = load_tacotron_checkpoint(ckpt)
    model = build_model(cfg)
    prep = cfg.dataset.preprocessing
    ds = TTSDataset(
        filenames=[f"u{i}.wav" for i in range(8)],
        texts=[r.split("|")[0] for r in rows],
        base_dir="speech",
        allowed_chars=prep.allowed_chars, end_token=prep.end_token,
        num_mels=prep.num_mels, trim=False, cache=False,
    )
    batch = next(iter(TTSDataLoader(ds, batch_size=8, shuffle=False)))
    out, _ = model.forward_teacher(
        params, model_state, batch["chars_idx"], batch["chars_len"],
        batch["mel"], batch["mel_len"], rng=jax.random.PRNGKey(0), train=False,
    )
    am = alignment_metrics(out.alignments, batch["chars_len"], batch["mel_len"])
    ga = gate_accuracy(out.gates, batch["gate"], batch["mel_len"])
    print(f"HEALTH: pad_mass={am['pad_mass']:.2e} diagonality="
          f"{am['diagonality']:.3f} entropy={am['entropy']:.2f} "
          f"gate_acc={ga:.3f}", flush=True)
    # the mask gate is unconditional (broken masking shows up untrained);
    # gate accuracy converges within the 15 smoke steps (BCE on almost-
    # all-ones targets); diagonality needs real training -> report only
    assert am["pad_mass"] < 1e-3, f"attention mass on padded chars: {am}"
    assert ga > 0.8, f"gate accuracy {ga:.3f} <= 0.8 after training"
    print("HEALTH OK", flush=True)

    from run.say import do_say

    do_say(cfg, 0, ckpt, "hello from the accelerator", "out.wav",
           random_seed=3, max_len_override=128)
    wav, sr = read_wav("out.wav")
    print(f"SAY OK: {len(wav) / sr:.2f}s @ {sr}", flush=True)

    do_say(cfg, 0, ckpt, "int8 fast mode check", "out8.wav",
           random_seed=3, max_len_override=128, quantize_int8=True)
    print("SAY INT8 OK", flush=True)

    from run.test import do_test

    do_test(cfg, 0, "speech", ckpt, None, results_dir="results_test",
            max_len_override=128)
    print("TEST OK", flush=True)
    print("smoke complete:", workdir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tacotron2_tpu_smoke")
