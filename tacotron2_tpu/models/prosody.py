"""Prosody predictor: CNN + BiRNN + attention-pooled regressor of prosodic
features from mels.

Rebuild of the reference ProsodyPredictorV2
(model/prosodic_features/prosody_detector.py:11-155). NOTE: the reference
file is BROKEN — its imports (model.modules_legacy, speech_utils...
mel_to_log_mel) do not resolve (SURVEY §2.5) — so this is a working
re-creation of the architecture it describes: optional delta/delta-delta
input channels, 6 Xavier-init LeakyReLU Conv2d layers with one (2,4)
max-pool, pre-RNN projection, 2-layer BiGRU/BiLSTM, learned frame weights
softmaxed over valid frames, and a tanh head over ``num_features`` outputs.
Used as a frozen perceptual-loss objective in the second half of training
(reference wiring survives only as comments, run/train.py:188-208 /
model/tts_model.py:178-225; live HERE: run/train_prosody.py trains this
predictor, and run/train.py activates the style loss at
``extensions.prosody_model.active_after`` when given
``--prosody-model-checkpoint`` — see training/losses.py:prosody_style_loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


def compute_deltas(x: jnp.ndarray, win_length: int = 5) -> jnp.ndarray:
    """torchaudio.transforms.ComputeDeltas over the last (time) axis of
    (..., T): least-squares slope over a +-n window with replicate padding."""
    n = (win_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3.0
    kernel = jnp.arange(-n, n + 1, dtype=jnp.float32)
    pad = [(0, 0)] * (x.ndim - 1) + [(n, n)]
    xp = jnp.pad(x, pad, mode="edge")
    # correlate along time
    out = sum(kernel[i] * xp[..., i : i + x.shape[-1]] for i in range(win_length))
    return out / denom


class ProsodyPredictor:
    def __init__(
        self,
        conv_out_dim: int | None = None,
        rnn_in_dim: int = 768,
        use_deltas: bool = True,
        use_lstm: bool = False,
        rnn_layers: int = 2,
        rnn_dropout: float = 0.5,
        num_features: int = 7,
        num_mels: int = 80,
        policy: Policy = F32,
    ):
        if conv_out_dim is None:
            # the (2,4) max-pool quarters the mel axis and the quirky
            # two-step reshape halves the flattened vector (see apply):
            # default 2560 for the reference's 80 mels
            conv_out_dim = (num_mels // 4) * 256 // 2
        self.conv_out_dim = conv_out_dim
        self.rnn_in_dim = rnn_in_dim
        self.use_deltas = use_deltas
        self.use_lstm = use_lstm
        self.rnn_layers = rnn_layers
        self.rnn_dropout = rnn_dropout
        self.num_features = num_features
        self.num_mels = num_mels
        self.policy = policy

    def init(self, key) -> dict:
        keys = jax.random.split(key, 12)
        lrelu_gain = float(jnp.sqrt(2.0 / (1 + 0.01**2)))
        in_ch = 3 if self.use_deltas else 1
        convs = [layers.conv2d_init(keys[0], in_ch, 128, (5, 3), xavier=True, gain=lrelu_gain)]
        chans = [128, 256, 256, 256, 256, 256]
        for i in range(5):
            convs.append(
                layers.conv2d_init(keys[1 + i], chans[i], chans[i + 1], (5, 3), xavier=True, gain=lrelu_gain)
            )
        cell_init = layers.lstm_cell_init if self.use_lstm else layers.gru_cell_init
        return {
            "convs": convs,
            "pre_rnn": layers.linear_init(keys[6], self.conv_out_dim, self.rnn_in_dim),
            "rnn": layers.birnn_stack_init(keys[7], cell_init, self.rnn_in_dim, 128, self.rnn_layers),
            "frame_weights": {
                "fc1": layers.linear_init(keys[8], 256, 1),
                "fc2": layers.linear_init(keys[9], 1, 1),
            },
            "features_out": {
                "fc1": layers.linear_init(keys[10], 256, 64, ),
                "fc2": layers.linear_init(keys[11], 64, self.num_features),
            },
        }

    def _rnn_layer(self, p, x, lengths, train, rng):
        if self.use_lstm:
            fwd = layers.lstm_sequence(p["fwd"], x, lengths)
            bwd = layers.lstm_sequence(p["bwd"], x, lengths, reverse=True)
        else:
            fwd, _ = layers.gru_sequence(p["fwd"], x, lengths)
            bwd, _ = layers.gru_sequence(p["bwd"], x, lengths, reverse=True)
        return jnp.concatenate([fwd, bwd], axis=-1)

    def apply(self, params, mels, mel_lengths, train: bool = False, rng=None):
        """mels (B, T, M) -> (features (B, F), low, mid, high activations)."""
        B, T, M = mels.shape
        x = mels.swapaxes(1, 2)  # (B, M, T) like the reference's working view
        if x.shape[2] % 2 == 1:  # pad time to even (prosody_detector.py:99-110)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
        if self.use_deltas:
            d1 = compute_deltas(x)
            d2 = compute_deltas(d1)
            chans = jnp.stack([x, d1, d2], axis=-1)  # (B, M, T', 3)
        else:
            chans = x[..., None]
        # torch layout (B, C, T', M): convs see H=T', W=M -> ours NHWC
        h = chans.transpose(0, 2, 1, 3)  # (B, T', M, C)

        h = layers.conv2d_apply(params["convs"][0], h, (1, 1), (2, 1), self.policy)
        h = jax.nn.leaky_relu(h, 0.01)
        h = layers.max_pool2d(h, (2, 4), (2, 4))
        for conv in params["convs"][1:]:
            h = layers.conv2d_apply(conv, h, (1, 1), (2, 1), self.policy)
            h = jax.nn.leaky_relu(h, 0.01)
        Bc, Tc, Mc, Cc = h.shape
        # the reference's quirky reshape (prosody_detector.py:122-126):
        # (B, C, T/2, M').permute(0,2,3,1).reshape(B, T_padded, -1) — each
        # pooled step's (M'*C) vector is split across TWO output steps, so
        # the RNN runs at the ORIGINAL frame rate with conv_out_dim features.
        # Our NHWC h (B, T/2, M', C) flattens in the same (m-major, c) order.
        t_padded = 2 * Tc
        low = h.reshape(Bc, t_padded, (Mc * Cc) // 2)
        assert low.shape[-1] == self.conv_out_dim, (
            f"conv_out_dim mismatch: {low.shape[-1]} != {self.conv_out_dim}"
        )

        pre = jax.nn.leaky_relu(layers.linear_apply(params["pre_rnn"], low, self.policy), 0.01)

        Tc = t_padded
        lengths = jnp.minimum(mel_lengths.astype(jnp.int32), Tc)
        out = pre
        for i, p in enumerate(params["rnn"]):
            out = self._rnn_layer(p, out, lengths, train, rng)
            if train and self.rnn_dropout > 0 and i < len(params["rnn"]) - 1 and rng is not None:
                rng, sub = jax.random.split(rng)
                out = layers.dropout(sub, out, self.rnn_dropout)
        mid = out

        fw = params["frame_weights"]
        w = layers.linear_apply(fw["fc2"], jax.nn.sigmoid(layers.linear_apply(fw["fc1"], out, self.policy)), self.policy)[..., 0]
        mask = jnp.arange(Tc)[None, :] >= lengths[:, None]
        w = jnp.where(mask, -jnp.inf, w)
        w = jax.nn.softmax(w, axis=1)
        high = jnp.einsum("bt,btd->bd", w, out)

        fo = params["features_out"]
        feats = jnp.tanh(
            layers.linear_apply(
                fo["fc2"], jax.nn.leaky_relu(layers.linear_apply(fo["fc1"], high, self.policy), 0.01),
                self.policy,
            )
        )
        return feats, low, mid, high
