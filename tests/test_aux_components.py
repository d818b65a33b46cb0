"""Tests for the smaller inventory components: ProsodyDataset, MRF
resblocks, speaker-ID encoder, profiling utils, CCC loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_prosody_dataset_segments(tmp_path):
    from tacotron2_tpu.audio.io import write_wav
    from tacotron2_tpu.data.prosody_dataset import ProsodyDataset

    rng = np.random.default_rng(0)
    t = np.arange(22050) / 22050
    wav = (0.3 * np.sin(2 * np.pi * 180 * t) + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    write_wav(str(tmp_path / "a.wav"), wav, 22050)
    ds = ProsodyDataset(["a.wav"], str(tmp_path), trim=False, seed=0)
    item = ds[0]
    assert item["mel_segment"].shape == (64, 80)
    assert item["wav_segment"].shape == (64 * 256,)
    assert item["features"].shape == (18,)
    assert np.isfinite(item["features"]).all()


def test_mrf_mean_of_resblocks():
    from tacotron2_tpu.models.resblock import mrf_apply, mrf_init, resblock2_apply

    params = mrf_init(jax.random.PRNGKey(0), channels=8, kernel_sizes=(3, 7),
                      dilations=((1, 3), (1, 3)))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 8)), jnp.float32)
    out = mrf_apply(params, x)
    assert out.shape == x.shape
    a = resblock2_apply(params["blocks"][0], x)
    b = resblock2_apply(params["blocks"][1], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray((a + b) / 2), atol=1e-6)


def test_resblock2_matches_reference_torch():
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.resblock import ResBlock2 as TorchRB2

    from tacotron2_tpu.models.resblock import resblock2_apply

    torch.manual_seed(0)
    trb = TorchRB2(channels=8, kernel_size=3, dilation=(1, 3))
    trb.eval()
    sd = trb.state_dict()
    params = {
        "convs": [
            {
                "w": sd[f"convs.{j}.weight"].numpy().transpose(2, 1, 0),
                "b": sd[f"convs.{j}.bias"].numpy(),
            }
            for j in range(2)
        ],
        "kernel_size": 3,
        "dilation": (1, 3),
    }
    x = np.random.default_rng(1).standard_normal((2, 8, 16)).astype(np.float32)
    with torch.no_grad():
        ref = trb(torch.tensor(x)).numpy()
    ours = np.asarray(resblock2_apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-5)


def test_speaker_id_encoder(tmp_path):
    from tacotron2_tpu.utils.speaker_ids import get_encoder

    p = str(tmp_path / "speakers.csv")
    with open(p, "w") as f:
        f.write("9017\n92\n6097\n")
    enc = get_encoder(p)
    assert enc.transform(["6097", "92", "9017"]) == [0, 2, 1]  # sorted-string order
    assert enc.inverse_transform([0]) == ["6097"]
    assert get_encoder(p) is enc  # memoized


def test_phase_timer():
    from tacotron2_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.summary()


def test_ccc_loss():
    from tacotron2_tpu.training.losses import concordance_correlation_coefficient_loss as ccc

    x = jnp.asarray(np.random.default_rng(0).standard_normal(100), jnp.float32)
    assert float(ccc(x, x)) < 1e-5  # perfect agreement -> loss 0
    assert float(ccc(x, -x)) > 1.5  # anti-correlated -> loss ~2
    assert float(ccc(x, x + 10.0)) > 0.5  # mean shift penalized


def test_diagnostics_catch_broken_mask():
    """tools/tpu_smoke.py's health gates (VERDICT r2 #8): the pad-mass
    metric must flag attention leaking onto padded char positions (the
    deliberately-broken-mask regression), pass a clean masked alignment,
    and the diagonality metric must separate diagonal from uniform."""
    import numpy as np

    from tacotron2_tpu.utils.diagnostics import alignment_metrics, gate_accuracy

    B, T, L = 2, 12, 10
    chars_len = np.array([6, 8])
    mel_len = np.array([12, 10])

    # broken mask: softmax ran over ALL L positions (uniform)
    broken = np.full((B, T, L), 1.0 / L)
    m = alignment_metrics(broken, chars_len, mel_len)
    assert m["pad_mass"] > 0.1  # 4/10 resp. 2/10 of the mass on pads

    # clean: uniform over the VALID positions only
    clean = np.zeros((B, T, L))
    for b in range(B):
        clean[b, :, : chars_len[b]] = 1.0 / chars_len[b]
    m2 = alignment_metrics(clean, chars_len, mel_len)
    assert m2["pad_mass"] < 1e-12

    # diagonal attention scores far better diagonality than uniform
    diag = np.zeros((B, T, L))
    for b in range(B):
        ml = int(mel_len[b])
        for t in range(ml):
            pos = int(round(t / (ml - 1) * (chars_len[b] - 1)))
            diag[b, t, pos] = 1.0
    m3 = alignment_metrics(diag, chars_len, mel_len)
    assert m3["diagonality"] < 0.05 < m2["diagonality"]
    assert m3["entropy"] < 0.01

    # gate sign accuracy
    gates = np.full((B, T, 1), 3.0)
    gates[0, 5] = -2.0  # one wrong frame in 12+10 valid
    target = np.ones((B, T, 1))
    acc = gate_accuracy(gates, target, mel_len)
    np.testing.assert_allclose(acc, 21 / 22)
