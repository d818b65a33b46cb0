"""HiFi-GAN parity vs the reference torch Generator (model/hifi_gan.py),
random weights, both with and without weight-norm folding."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from model.hifi_gan import Generator as TorchGenerator  # noqa: E402


class AttrDict(dict):  # run/say.py:18-21 (run.say itself imports librosa)
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self

from tacotron2_tpu.convert import convert_hifigan_state_dict  # noqa: E402
from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig  # noqa: E402

# small config for test speed (structure identical to UNIVERSAL_V1)
H = {
    "resblock": "1",
    "upsample_rates": [8, 2],
    "upsample_kernel_sizes": [16, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
}

H2 = dict(H, resblock="2", resblock_dilation_sizes=[[1, 3], [1, 3]])


def _run_pair(h, remove_wn: bool, seed=0):
    torch.manual_seed(seed)
    tg = TorchGenerator(AttrDict(h))
    if remove_wn:
        tg.remove_weight_norm()
    tg.eval()

    params = convert_hifigan_state_dict(tg.state_dict(), h)
    ours = HiFiGAN(HiFiGANConfig.from_dict(h))

    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((2, 17, 80)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(mel).swapaxes(1, 2))[:, 0, :].numpy()
    out = np.asarray(ours.apply(params, mel))
    return out, ref


def test_hifigan_parity_resblock1_wn_removed():
    out, ref = _run_pair(H, remove_wn=True)
    assert out.shape == ref.shape == (2, 17 * 16)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_hifigan_parity_resblock1_wn_folded():
    # converter folds weight_g/weight_v itself
    out, ref_out = _run_pair(H, remove_wn=False)
    np.testing.assert_allclose(out, ref_out, atol=1e-5)


def test_hifigan_parity_resblock2():
    out, ref = _run_pair(H2, remove_wn=True, seed=3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_hifigan_output_length_formula():
    ours = HiFiGAN(HiFiGANConfig.from_dict(H))
    assert ours.cfg.total_upsample == 16


def test_fold_rewrite_exact():
    """The phase-folded MRF rewrite (HiFiGAN._fold_conv, a measured-and-
    reverted experiment kept behind apply(fold=True)) must stay
    algebraically exact vs the unfolded path — both resblock types, fold
    factors 2..16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
    from tacotron2_tpu.models.layers import Policy

    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 80)).astype(np.float32)
    )
    for kwargs in (
        dict(upsample_initial_channel=128),
        dict(resblock="2", upsample_initial_channel=64,
             resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 3), (1, 3))),
    ):
        m = HiFiGAN(HiFiGANConfig(**kwargs), Policy.from_string("32-true"))
        p = m.init(jax.random.PRNGKey(0))
        a = np.asarray(m.apply(p, mel, fold=False))
        b = np.asarray(m.apply(p, mel, fold=True))
        np.testing.assert_allclose(b, a, atol=1e-6 * max(np.abs(a).max(), 1e-3))


def test_mrf_poly_rewrite_exact():
    """The polyphase-by-dilation MRF (apply(mrf_poly=...), r4) — phase
    split t mod d, s=128/ch channel fold, im2col matmul — must stay
    algebraically exact vs the base conv path: both resblock types, fold
    factors s in {1, 2, 4}, lengths that do and don't divide the s*lcm(d)
    padding unit, and per-stage enables."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
    from tacotron2_tpu.models.layers import Policy

    rng = np.random.default_rng(1)
    for kwargs in (
        # stages at ch 128/64/32 -> s = 1, 2, 4
        dict(upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
             upsample_initial_channel=256, num_mels=16),
        dict(resblock="2", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
             upsample_initial_channel=128, num_mels=16,
             resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 3), (1, 3))),
    ):
        m = HiFiGAN(HiFiGANConfig(**kwargs), Policy.from_string("32-true"))
        p = m.init(jax.random.PRNGKey(0))
        # x3 lifts the N(0, .01) conv init to visible activations while
        # staying clear of tanh saturation and of leaky-relu kink-crossing
        # amplification (a pre-activation within rounding of 0 takes
        # different lrelu slopes in the two exact-but-reordered paths)
        p = jax.tree.map(lambda a: a * 3.0, p)
        # T=13 exercises the pad-to-s*lcm(d) path; the per-stage-enable
        # variant is covered once (first config) to keep this documented-
        # negative path's test cheap (it was the suite's 4th-slowest)
        T = 13
        mel = jnp.asarray(rng.standard_normal((2, T, 16)).astype(np.float32))
        a = np.asarray(m.apply(p, mel))
        variants = [True]
        if kwargs.get("resblock") != "2":
            variants.append((False,) * (len(m.cfg.upsample_rates) - 1) + (True,))
        for mp in variants:
            b = np.asarray(m.apply(p, mel, mrf_poly=mp))
            assert b.shape == a.shape
            np.testing.assert_allclose(
                b, a, atol=1e-5 * max(np.abs(a).max(), 1e-3)
            )
