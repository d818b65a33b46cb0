"""End-to-end pipeline tests: train a tiny config -> checkpoint -> say ->
test, exercising the whole stack the way ``main.py`` wires it (SURVEY §4
plan: 'tiny-config train step loss-drop; say end-to-end on a seeded tiny
checkpoint')."""

import json
import os

import numpy as np
import pytest

from tacotron2_tpu.audio.io import read_wav, write_wav
from tacotron2_tpu.config import config_from_dict

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


@pytest.fixture(scope="module")
def tiny_project(tmp_path_factory):
    """A miniature corpus + manifests + config, in the reference's layout."""
    root = tmp_path_factory.mktemp("proj")
    speech = root / "speech"
    speech.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    texts = ["hello world.", "testing speech.", "one more clip!", "the fourth one."]
    for i, t in enumerate(texts):
        dur = 0.25 + 0.08 * i
        wav = (0.3 * np.sin(2 * np.pi * (200 + 60 * i) * np.arange(int(22050 * dur)) / 22050)).astype(np.float32)
        name = f"clip{i}.wav"
        write_wav(str(speech / name), wav, 22050)
        rows.append(f"{t}|{name}")

    for split, sel in [("train", rows), ("val", rows[:2]), ("test", rows[2:])]:
        with open(root / f"{split}.csv", "w") as f:
            f.write("text|wav\n")
            f.write("\n".join(sel) + "\n")

    raw_cfg = {
        "dataset": {
            "train": str(root / "train.csv"),
            "test": str(root / "test.csv"),
            "val": str(root / "val.csv"),
            "preprocessing": {
                "allowed_chars": LJ_CHARS,
                "expand_abbreviations": True,
                "end_token": "^",
                "silence": 0,
                "trim": False,
                "num_mels": 20,
                "cache": True,
            },
        },
        "training": {
            "lr": 0.001, "batch_size": 2, "weight_decay": 0.000001,
            "precision": "32-true", "name": "tiny-e2e",
            "float32_matmul_precision": "high",
            "args": {"max_steps": 4},
        },
        "model": {
            "scheduler_milestones": [0.5],
            "args": {
                "prenet_dim": 16, "att_rnn_dim": 32, "att_dim": 16,
                "rnn_hidden_dim": 32, "postnet_dim": 16, "dropout": 0.1,
                "encoded_dim": 32, "encoder_kernel_size": 5,
            },
        },
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False}},
    }
    cfg_path = root / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(raw_cfg, f)
    return root, speech, raw_cfg, cfg_path


def test_train_say_test_roundtrip(tiny_project, tmp_path):
    root, speech, raw_cfg, cfg_path = tiny_project
    cfg = config_from_dict(raw_cfg)

    from run.train import do_train

    results = tmp_path / "results"
    ckpt = do_train(cfg, raw_cfg, 0, str(speech), str(results), None, log_every=1)
    assert os.path.isdir(ckpt)
    assert os.path.exists(os.path.join(ckpt, "config.json"))
    # tensorboard event files written
    tb = results / "lightning_logs" / "tiny-e2e"
    assert any(tb.rglob("events*"))

    # say: griffin-lim path (no vocoder checkpoint)
    from run.say import do_say

    out_wav = str(tmp_path / "say.wav")
    do_say(cfg, 0, ckpt, "hello there", out_wav, random_seed=7, max_len_override=24)
    wav, sr = read_wav(out_wav)
    assert sr == 22050
    assert len(wav) > 0

    # say is seed-reproducible (AlwaysDropout under explicit PRNG)
    out_wav2 = str(tmp_path / "say2.wav")
    do_say(cfg, 0, ckpt, "hello there", out_wav2, random_seed=7, max_len_override=24)
    a, _ = read_wav(out_wav)
    b, _ = read_wav(out_wav2)
    np.testing.assert_array_equal(a, b)

    # batch test driver
    from run.test import do_test

    test_dir = do_test(cfg, 0, str(speech), ckpt, None,
                       results_dir=str(tmp_path / "results_test"), max_len_override=24)
    wrote = [f for f in os.listdir(test_dir) if f.endswith(".wav")]
    failures = os.path.exists(os.path.join(test_dir, "failures.csv"))
    assert wrote or failures  # every utterance accounted for

    # mel export driver
    from run.train_mel_export import do_train_mel_export

    export_dir = do_train_mel_export(cfg, 0, str(speech), ckpt,
                                     results_dir=str(tmp_path / "mels"))
    mels = [f for f in os.listdir(export_dir) if f.endswith(".npy")]
    assert len(mels) == 4  # train(4) + val(2) overlap by filename
    m = np.load(os.path.join(export_dir, mels[0]))
    assert m.ndim == 2 and m.shape[1] == 20


def test_resume_training(tiny_project, tmp_path):
    root, speech, raw_cfg, cfg_path = tiny_project
    cfg = config_from_dict(raw_cfg)
    from run.train import do_train

    r1 = tmp_path / "r1"
    ckpt = do_train(cfg, raw_cfg, 0, str(speech), str(r1), None, log_every=10)
    r2 = tmp_path / "r2"
    ckpt2 = do_train(cfg, raw_cfg, 0, str(speech), str(r2), ckpt,
                     log_every=10, max_steps_override=6)
    from tacotron2_tpu.training.checkpoint import load_model

    _, _, saved = load_model(ckpt2)
    assert saved["training"]["name"] == "tiny-e2e"


def _load_our_cli():
    """Import OUR main.py explicitly — parity tests put /root/reference on
    sys.path, whose main.py would shadow ours under plain `import main`."""
    import importlib.util
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("tts_cli_main", os.path.join(repo_root, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cli_surface():
    """All reference subcommands exist with the reference flags."""
    from click.testing import CliRunner

    cli = _load_our_cli()

    r = CliRunner().invoke(cli.main, ["--help"], obj={})
    assert r.exit_code == 0
    for cmd in ("train", "say", "test", "test-correlation", "train-mel-export",
                "preprocess", "server", "convert"):
        assert cmd.replace("-", "_") in r.output.replace("-", "_")
    r = CliRunner().invoke(cli.main, ["say", "--help"], obj={})
    for flag in ("--checkpoint", "--text", "--out", "--hifi-gan-checkpoint",
                 "--random-seed", "--speaker-id", "--controls", "--description",
                 "--bert-checkpoint", "--gst-reference"):
        assert flag in r.output


def test_cli_preprocess_ljspeech(tmp_path):
    """main.py preprocess --dataset ljspeech end-to-end through click."""
    from click.testing import CliRunner

    from tacotron2_tpu.audio.io import write_wav

    speech = tmp_path / "LJ"
    (speech / "wavs").mkdir(parents=True)
    t = np.arange(int(22050 * 0.6)) / 22050
    wav = (0.3 * np.sin(2 * np.pi * 160 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t) ** 2)).astype(np.float32)
    write_wav(str(speech / "wavs" / "LJ001.wav"), wav, 22050)
    with open(speech / "metadata.csv", "w") as f:
        f.write("LJ001|Some text|some text normalized\n")

    cli = _load_our_cli()
    r = CliRunner().invoke(
        cli.main,
        ["preprocess", "--dataset", "ljspeech", "--speech-dir", str(speech),
         "--out-dir", str(tmp_path), "--out-postfix", "t", "--n-jobs", "1"],
        obj={},
    )
    assert r.exit_code == 0, r.output
    assert (tmp_path / "ljspeech-t.csv").exists()


def test_cli_say_requires_config():
    from click.testing import CliRunner

    cli = _load_our_cli()

    r = CliRunner().invoke(
        cli.main, ["say", "--checkpoint", "x", "--text", "hi"], obj={}
    )
    assert r.exit_code != 0


def test_cli_sets_persistent_compile_cache(tmp_path, monkeypatch):
    """main.py enables the persistent XLA compilation cache (322 s -> 21 s
    cold `say` on the tunnel, PERF.md); honor TACOTRON2_COMPILE_CACHE and
    its empty-string disable."""
    import jax
    from click.testing import CliRunner

    cli = _load_our_cli()
    cache = str(tmp_path / "jc")
    monkeypatch.setenv("TACOTRON2_COMPILE_CACHE", cache)
    prev = jax.config.jax_compilation_cache_dir  # conftest's test cache
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        # --help short-circuits the group callback; a (failing) subcommand
        # invocation runs it
        r = CliRunner().invoke(cli.main, ["say"], obj={})
        assert r.exit_code == 2  # missing required --checkpoint/--text
        assert jax.config.jax_compilation_cache_dir == cache

        # an already-configured cache dir (tests, power users) is respected
        jax.config.update("jax_compilation_cache_dir", "/tmp/elsewhere")
        CliRunner().invoke(cli.main, ["say"], obj={})
        assert jax.config.jax_compilation_cache_dir == "/tmp/elsewhere"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
