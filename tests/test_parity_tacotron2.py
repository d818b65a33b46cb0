"""Numerical parity gate vs the reference PyTorch Tacotron2.

Loads the reference modules read-only from /root/reference (torch CPU),
converts the state dict with tacotron2_tpu.convert, and asserts our JAX
forward matches within the BASELINE.md budget (mel MAE < 1e-3; we gate much
tighter elementwise). AlwaysDropout is neutralized (p=0) on the torch side /
``prenet_dropout=False`` on ours so both are deterministic.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")  # read-only import of the reference

from model.tacotron2 import Tacotron2 as TorchTacotron2  # noqa: E402
from model.modules import AlwaysDropout  # noqa: E402

import jax  # noqa: E402

from tacotron2_tpu.convert import convert_tacotron2_state_dict  # noqa: E402
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config  # noqa: E402

DIMS = dict(
    num_chars=30,
    encoded_dim=64,
    encoder_kernel_size=5,
    num_mels=20,
    prenet_dim=32,
    att_rnn_dim=48,
    att_dim=24,
    rnn_hidden_dim=56,
    postnet_dim=40,
    dropout=0.5,
)


def _make_torch_model(gate_bias=None, **extensions):
    torch.manual_seed(1234)
    m = TorchTacotron2(**DIMS, **extensions)
    m.eval()
    for mod in m.modules():
        if isinstance(mod, AlwaysDropout):
            mod.p = 0.0  # neutralize inference dropout for determinism
    if gate_bias is not None:
        with torch.no_grad():
            m.decoder.gate.bias.fill_(gate_bias)
    return m


def _make_jax_model(torch_model, **cfg_extensions):
    cfg = Tacotron2Config(**DIMS, **cfg_extensions)
    model = Tacotron2(cfg)
    params, state = convert_tacotron2_state_dict(torch_model.state_dict())
    return model, params, state


def _inputs(B=3, L=9, T=11, seed=0, num_chars=30):
    rng = np.random.default_rng(seed)
    chars = rng.integers(1, num_chars + 1, size=(B, L)).astype(np.int64)
    lens = np.array([L, L - 3, L - 5], dtype=np.int64)[:B]
    for b in range(B):
        chars[b, lens[b] :] = 0
    mel = rng.standard_normal((B, T, DIMS["num_mels"])).astype(np.float32)
    mel_len = np.array([T, T - 3, T - 6], dtype=np.int64)[:B]
    return chars, lens, mel, mel_len


def test_teacher_forcing_parity_vanilla():
    tm = _make_torch_model()
    model, params, state = _make_jax_model(tm)
    chars, lens, mel, mel_len = _inputs()

    with torch.no_grad():
        ref_mels, ref_post, ref_gates, ref_align = tm(
            chars_idx=torch.tensor(chars),
            chars_idx_len=torch.tensor(lens),
            teacher_forcing=True,
            mel_spectrogram=torch.tensor(mel),
            mel_spectrogram_len=torch.tensor(mel_len),
        )

    out, _ = model.forward_teacher(
        params, state, chars, lens, mel, mel_len,
        rng=jax.random.PRNGKey(0), train=False, prenet_dropout=False,
    )

    np.testing.assert_allclose(np.asarray(out.mels), ref_mels.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.mels_post), ref_post.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.gates), ref_gates.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.alignments), ref_align.numpy(), atol=1e-5)
    # headline gate: mel MAE < 1e-3 (BASELINE.md)
    assert np.abs(np.asarray(out.mels_post) - ref_post.numpy()).mean() < 1e-3


def test_free_running_parity():
    tm = _make_torch_model(gate_bias=2.0)  # keep gates positive so it runs
    model, params, state = _make_jax_model(tm)
    chars, lens, _, _ = _inputs()
    max_len = 12

    with torch.no_grad():
        ref_mels, ref_post, ref_gates, ref_align = tm(
            chars_idx=torch.tensor(chars),
            chars_idx_len=torch.tensor(lens),
            teacher_forcing=False,
            max_len_override=max_len,
        )

    out = model.forward_infer(
        params, state, chars, lens, max_len,
        rng=jax.random.PRNGKey(0), prenet_dropout=False,
    )
    n = ref_mels.shape[1]
    assert int(out.n_frames) == n
    np.testing.assert_allclose(np.asarray(out.mels)[:, :n], ref_mels.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.mels_post)[:, :n], ref_post.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.gates)[:, :n], ref_gates.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.alignments)[:, :n], ref_align.numpy(), atol=1e-5)


def test_free_running_early_stop_parity():
    tm = _make_torch_model(gate_bias=-2.0)  # gates fire immediately
    model, params, state = _make_jax_model(tm)
    chars, lens, _, _ = _inputs()

    with torch.no_grad():
        ref_mels, ref_post, ref_gates, _ = tm(
            chars_idx=torch.tensor(chars),
            chars_idx_len=torch.tensor(lens),
            teacher_forcing=False,
            max_len_override=50,
        )

    out = model.forward_infer(
        params, state, chars, lens, 50, rng=jax.random.PRNGKey(0), prenet_dropout=False
    )
    n = ref_mels.shape[1]
    assert int(out.n_frames) == n  # early stop after the same number of steps
    np.testing.assert_allclose(np.asarray(out.mels)[:, :n], ref_mels.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.gates)[:, :n], ref_gates.numpy(), atol=2e-4)
    # frames past the executed steps stay masked
    assert np.all(np.asarray(out.mels)[:, n:] == 0.0)
    assert np.all(np.asarray(out.gates)[:, n:] == -1000.0)


def test_teacher_forcing_parity_all_extensions():
    ext_torch = dict(
        speaker_tokens=True,
        num_speakers=4,
        controls=True,
        controls_dim=5,
        description_embeddings=True,
        description_embeddings_dim=16,
    )
    tm = _make_torch_model(**ext_torch)
    model, params, state = _make_jax_model(tm, **ext_torch)
    chars, lens, mel, mel_len = _inputs(seed=7)
    rng = np.random.default_rng(11)
    speaker = np.array([0, 2, 3], dtype=np.int64)
    controls = rng.uniform(-1, 1, size=(3, 5)).astype(np.float32)
    desc = rng.standard_normal((3, 16)).astype(np.float32)

    with torch.no_grad():
        ref_mels, ref_post, ref_gates, ref_align = tm(
            chars_idx=torch.tensor(chars),
            chars_idx_len=torch.tensor(lens),
            teacher_forcing=True,
            mel_spectrogram=torch.tensor(mel),
            mel_spectrogram_len=torch.tensor(mel_len),
            speaker_id=torch.tensor(speaker),
            controls=torch.tensor(controls),
            description_embeddings=torch.tensor(desc),
        )

    out, _ = model.forward_teacher(
        params, state, chars, lens, mel, mel_len,
        rng=jax.random.PRNGKey(0), train=False, prenet_dropout=False,
        speaker_id=speaker, controls=controls, description_embeddings=desc,
    )
    np.testing.assert_allclose(np.asarray(out.mels), ref_mels.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.mels_post), ref_post.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.gates), ref_gates.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.alignments), ref_align.numpy(), atol=1e-5)


def test_controls_contract_enforced():
    tm = _make_torch_model()
    model, params, state = _make_jax_model(tm)
    chars, lens, mel, mel_len = _inputs()
    with pytest.raises(ValueError):
        model.forward_teacher(
            params, state, chars, lens, mel, mel_len,
            rng=jax.random.PRNGKey(0), train=False,
            controls=np.zeros((3, 2), np.float32),
        )
