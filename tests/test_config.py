"""Config loading tests — the reference's 4-section JSON schema must load
unchanged, including stale-alias handling (SURVEY §5.6)."""

import json

import pytest

from tacotron2_tpu.config import config_from_dict, load_config

VANILLA = {
    "dataset": {
        "train": "data/ljspeech-train-v4.csv",
        "test": "data/ljspeech-test-v4.csv",
        "val": "data/ljspeech-val-v4.csv",
        "preprocessing": {
            "allowed_chars": "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz",
            "expand_abbreviations": True,
            "end_token": "^",
            "silence": 512,
            "trim": False,
            "num_mels": 80,
            "cache": False,
        },
    },
    "training": {
        "lr": 0.001,
        "batch_size": 32,
        "weight_decay": 0.000001,
        "precision": "16-mixed",
        "name": "vanilla-ljspeech-stop",
        "float32_matmul_precision": "high",
        "stopping_val_loss_threshold": None,
        "args": {"max_steps": 100000},
    },
    "model": {
        "scheduler_milestones": [0.5, 0.75],
        "args": {
            "prenet_dim": 256,
            "att_rnn_dim": 1024,
            "att_dim": 128,
            "rnn_hidden_dim": 1024,
            "postnet_dim": 512,
            "dropout": 0.5,
            "char_embedding_dim": 512,  # stale alias for encoded_dim
            "encoder_kernel_size": 5,
        },
    },
    "extensions": {
        "speaker_tokens": {"active": False},
        "controls": {"active": False},
    },
}


def test_vanilla_reference_config_loads():
    cfg = config_from_dict(VANILLA)
    assert cfg.model.encoded_dim == 512  # via char_embedding_dim alias
    assert cfg.training.max_steps == 100000
    assert cfg.training.precision == "bf16-mixed"  # 16-mixed -> TPU policy
    assert cfg.dataset.preprocessing.end_token == "^"
    # num_chars = len(allowed) + 1 for end token (run/train.py:218-219)
    assert cfg.num_chars == len("!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz") + 1
    assert cfg.scheduler_milestones_steps() == [50000, 75000]
    assert cfg.controls_dim == 0


def test_controls_dim():
    raw = dict(VANILLA)
    raw["extensions"] = {
        "speaker_tokens": {"active": True, "num_speakers": 11},
        "controls": {"active": True, "features": ["a_norm", "b_norm", "c_norm"]},
    }
    cfg = config_from_dict(raw)
    assert cfg.controls_dim == 3
    assert cfg.extensions.speaker_tokens.num_speakers == 11


def test_force_speaker_with_active_tokens_rejected():
    raw = json.loads(json.dumps(VANILLA))
    raw["extensions"]["speaker_tokens"] = {"active": True, "force_speaker": 92}
    with pytest.raises(ValueError):
        config_from_dict(raw)


def test_force_speaker_requires_speaker_norm_controls():
    raw = json.loads(json.dumps(VANILLA))
    raw["extensions"]["speaker_tokens"] = {"active": False, "force_speaker": 92}
    raw["extensions"]["controls"] = {"active": True, "features": ["pitch_mean_norm"]}
    with pytest.raises(ValueError):
        config_from_dict(raw)
    raw["extensions"]["controls"]["features"] = ["pitch_mean_speaker_norm_clip"]
    config_from_dict(raw)  # ok


def test_unknown_keys_rejected():
    raw = json.loads(json.dumps(VANILLA))
    raw["model"]["args"]["bogus_dim"] = 7
    with pytest.raises(ValueError):
        config_from_dict(raw)


def test_all_reference_configs_load(tmp_path):
    # every shipped reference config must parse (config/*.json, 14 files)
    import glob
    import os

    ref_cfgs = sorted(glob.glob("/root/reference/config/*.json"))
    assert len(ref_cfgs) >= 14
    for p in ref_cfgs:
        if os.path.basename(p) == "server.json":
            continue  # empty placeholder {}
        with open(p) as f:
            raw = json.load(f)
        cfg = config_from_dict(raw)
        assert cfg.model.encoded_dim > 0


def test_end_token_in_allowed_chars_rejected():
    raw = json.loads(json.dumps(VANILLA))
    raw["dataset"]["preprocessing"]["end_token"] = "a"
    with pytest.raises(ValueError):
        config_from_dict(raw)
