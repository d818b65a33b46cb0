"""Parity tests for the auxiliary model family: GST and EmbeddingEncoder vs
the reference torch modules (converted weights); self-tests for the prosody
predictor (the reference file is import-broken, SURVEY §2.5)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tacotron2_tpu.convert import (  # noqa: E402
    convert_embedding_encoder_state_dict,
    convert_gst_state_dict,
)
from tacotron2_tpu.models.embedding_encoder import EmbeddingEncoder  # noqa: E402
from tacotron2_tpu.models.gst import GST  # noqa: E402
from tacotron2_tpu.models.prosody import ProsodyPredictor, compute_deltas  # noqa: E402


def test_gst_parity():
    from model.gst import GST as TorchGST

    torch.manual_seed(0)
    tg = TorchGST()
    tg.eval()
    params, state = convert_gst_state_dict(tg.state_dict())
    ours = GST()

    rng = np.random.default_rng(0)
    # reference __main__ feeds (N, 80, T); forward views to (N, 1, -1, 80) —
    # i.e. it consumes a (N, T, 80) frames-major stream. Use T divisible so
    # both see identical windows.
    mels = rng.standard_normal((3, 64, 80)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(mels.reshape(3, -1)).view(3, 64, 80)).numpy()
    out, _ = ours.apply(params, state, jnp.asarray(mels))
    assert out.shape == ref.shape == (3, 1, 256)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_gst_train_mode_updates_bn():
    ours = GST()
    params, state = ours.init(jax.random.PRNGKey(0))
    mels = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 80)), jnp.float32)
    out, new_state = ours.apply(params, state, mels, train=True)
    before = np.asarray(state["reference_encoder"]["bns"][0]["mean"])
    after = np.asarray(new_state["reference_encoder"]["bns"][0]["mean"])
    assert not np.allclose(before, after)


def test_embedding_encoder_parity():
    from model.embedding_encoder import EmbeddingEncoder as TorchEE

    torch.manual_seed(1)
    te = TorchEE(
        embedding_dim=16, encoder_out_dim=24, encoder_num_layers=2,
        encoder_dropout=0.0, attention_dim=12,
    )
    te.eval()
    ours = EmbeddingEncoder(
        embedding_dim=16, encoder_out_dim=24, encoder_num_layers=2,
        encoder_dropout=0.0, attention_dim=12,
    )
    params = convert_embedding_encoder_state_dict(te.state_dict(), num_layers=2)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 9, 16)).astype(np.float32)
    lengths = np.array([9, 6, 4], dtype=np.int64)
    with torch.no_grad():
        ref_pooled, ref_scores = te(torch.tensor(x), torch.tensor(lengths))
    pooled, scores = ours.apply(params, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy(), atol=2e-5)


def test_compute_deltas_matches_definition():
    # least-squares slope over +-2 window, replicate padding (torchaudio)
    x = np.arange(10, dtype=np.float32)[None, None, :]  # linear ramp -> slope 1
    d = np.asarray(compute_deltas(jnp.asarray(x)))
    np.testing.assert_allclose(d[0, 0, 2:-2], 1.0, atol=1e-6)


def test_prosody_predictor_shapes_and_masking():
    model = ProsodyPredictor(num_features=7)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mels = rng.standard_normal((2, 128, 80)).astype(np.float32)
    lens = np.array([128, 40], dtype=np.int64)
    feats, low, mid, high = model.apply(params, jnp.asarray(mels), jnp.asarray(lens))
    assert feats.shape == (2, 7)
    assert np.all(np.abs(np.asarray(feats)) <= 1.0)  # tanh head
    assert low.shape == (2, 128, 2560)  # conv_out_dim contract
    assert mid.shape == (2, 128, 256)
    assert high.shape == (2, 256)
    # masking: frames past length + conv receptive field (~±22 frames, same
    # unmasked-conv property as the reference) must not affect the features
    mels2 = mels.copy()
    mels2[1, 96:] = 99.0
    feats2, *_ = model.apply(params, jnp.asarray(mels2), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2), atol=2e-5)
