"""Tacotron 2 — TPU-native top module and the autoregressive decode loops.

Behavioral spec from the reference (model/tacotron2.py:14-347):
- encoder -> optional speaker fusion ``tanh(encoded + spk_emb)`` (:202)
  -> optional description path ``Linear(desc,128)+Tanh`` broadcast over chars
  and CONCATENATED (encoder width becomes encoded_dim+128) (:99-105,203-212)
- attention memory precompute ``att_encoder`` (no bias) + char pad mask
  (:107,223-229)
- prenet (2x Linear-no-bias + ReLU + AlwaysDropout — dropout stays ON at
  inference, the paper's output-variation mechanism, model/modules.py:4-12)
- the decode loop (:276-325): teacher-forced (prenet over the whole GT mel,
  shifted by one zero frame) or free-running (stop when every sample's gate
  logit goes negative)
- postnet residual, then length masking: mels -> 0.0, gates -> -1000.0
  (:331-345)

TPU redesign (SURVEY §7): teacher forcing is ONE ``lax.scan`` over the fused
step; free-running is ONE ``lax.while_loop`` with a done-vector condition
writing into static (max_len, B, ...) buffers — a single XLA program instead
of ~600-800 Python-dispatched steps per batch. RNG is explicit: the
AlwaysDropout keys derive from a seed, so ``say --random-seed`` is
reproducible by construction.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import decoder as decoder_mod
from tacotron2_tpu.models import encoder as encoder_mod
from tacotron2_tpu.models import layers
from tacotron2_tpu.models import postnet as postnet_mod
from tacotron2_tpu.models.layers import F32, Policy

GATE_MASK_VALUE = -1000.0  # reference: model/tacotron2.py:345


@dataclasses.dataclass(frozen=True)
class Tacotron2Config:
    """Hyperparameters (reference ctor: model/tacotron2.py:15-33)."""

    num_chars: int
    encoded_dim: int = 512
    encoder_kernel_size: int = 5
    num_mels: int = 80
    prenet_dim: int = 256
    att_rnn_dim: int = 1024
    att_dim: int = 128
    rnn_hidden_dim: int = 1024
    postnet_dim: int = 512
    dropout: float = 0.5
    speaker_tokens: bool = False
    num_speakers: int = 1
    controls: bool = False
    controls_dim: int = 0
    description_embeddings: bool = False
    description_embeddings_dim: int = 0
    # GST style conditioning — dormant in the reference (model/gst.py is
    # never instantiated); wired here as an optional block per SURVEY §7
    # step 7. The style embedding is broadcast-concatenated onto the
    # encoder memory like the description path.
    gst: bool = False
    gst_token_embedding_size: int = 256

    @property
    def encoded_full_dim(self) -> int:
        # description path widens the memory by 128 (model/tacotron2.py:99-105)
        return (
            self.encoded_dim
            + (128 if self.description_embeddings else 0)
            + (self.gst_token_embedding_size if self.gst else 0)
        )


class Tacotron2Output(NamedTuple):
    mels: jnp.ndarray  # (B, T, M) masked to 0 beyond length
    mels_post: jnp.ndarray  # (B, T, M)
    gates: jnp.ndarray  # (B, T, 1) masked to -1000 beyond length
    alignments: jnp.ndarray  # (B, T, L) unmasked
    lengths: jnp.ndarray  # (B,) — TF: given mel lens; free-run: #steps with gate>=0
    n_frames: jnp.ndarray  # () int — executed decode steps (free-run early stop)


class Tacotron2:
    def __init__(self, config: Tacotron2Config, policy: Policy = F32, verbose: bool = False):
        self.cfg = config
        self.policy = policy
        if verbose:  # config echo (reference: model/tacotron2.py:48-59)
            if config.controls:
                print(f"Tacotron2: Controls enabled with a size of {config.controls_dim}")
            else:
                print("Tacotron2: Controls disabled")
            if config.speaker_tokens:
                print(f"Tacotron2: Speaker tokens enabled with {config.num_speakers} speakers")
            else:
                print("Tacotron2: Speaker tokens disabled")

    # ------------------------------------------------------------------
    def init(self, key) -> Tuple[dict, dict]:
        """Initialize (params, state). Param-tree names mirror the reference
        module tree for checkpoint-conversion fidelity.

        Jitted: eager init dispatches hundreds of small random ops one by
        one (~6-15 s even for a tiny model on a 1-core host); as ONE
        compiled executable it lands in the persistent compile cache.
        Identical values — jit does not change threefry outputs."""
        return jax.jit(self._init_impl)(key)

    def _init_impl(self, key) -> Tuple[dict, dict]:
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        enc_params, enc_state = encoder_mod.init(
            keys[0], cfg.num_chars, cfg.encoded_dim, cfg.encoder_kernel_size
        )
        post_params, post_state = postnet_mod.init(keys[1], cfg.num_mels, cfg.postnet_dim)
        k_pre1, k_pre2 = jax.random.split(keys[2])
        params = {
            "encoder": enc_params,
            "prenet": {
                "fc1": layers.linear_init(k_pre1, cfg.num_mels, cfg.prenet_dim, bias=False),
                "fc2": layers.linear_init(k_pre2, cfg.prenet_dim, cfg.prenet_dim, bias=False),
            },
            "att_encoder": layers.linear_init(
                keys[3], cfg.encoded_full_dim, cfg.att_dim, bias=False
            ),
            "decoder": decoder_mod.init(
                keys[4],
                num_mels=cfg.num_mels,
                embedding_dim=cfg.encoded_full_dim,
                prenet_dim=cfg.prenet_dim,
                att_rnn_dim=cfg.att_rnn_dim,
                att_dim=cfg.att_dim,
                rnn_hidden_dim=cfg.rnn_hidden_dim,
                extra_decoder_in_dim=cfg.controls_dim,
            ),
            "postnet": post_params,
        }
        if cfg.speaker_tokens:
            params["speaker_embedding"] = layers.embedding_init(
                keys[5], cfg.num_speakers, cfg.encoded_dim, std=0.5
            )
        if cfg.description_embeddings:
            params["description_linear"] = layers.linear_init(
                keys[6], cfg.description_embeddings_dim, 128, bias=True
            )
        state = {"encoder": enc_state, "postnet": post_state}
        if cfg.gst:
            from tacotron2_tpu.models.gst import GST

            gst = GST(
                n_mel_channels=cfg.num_mels,
                token_embedding_size=cfg.gst_token_embedding_size,
                policy=self.policy,
            )
            params["gst"], state["gst"] = gst.init(keys[7])
        return params, state

    # ------------------------------------------------------------------
    def _prenet(self, params, x, rng, dropout_enabled: bool):
        """Prenet with AlwaysDropout (model/tacotron2.py:85-92). ``rng`` is
        required when dropout_enabled (inference dropout is the default —
        disable only for parity testing)."""
        cfg = self.cfg
        p = params["prenet"]
        x = jax.nn.relu(layers.linear_apply(p["fc1"], x, self.policy))
        if dropout_enabled:
            rng, sub = jax.random.split(rng)
            x = layers.dropout(sub, x, cfg.dropout)
        x = jax.nn.relu(layers.linear_apply(p["fc2"], x, self.policy))
        if dropout_enabled:
            rng, sub = jax.random.split(rng)
            x = layers.dropout(sub, x, cfg.dropout)
        return x

    def _prenet_rows(self, params, x, row_keys, t, dropout_enabled: bool):
        """``_prenet`` with INDEPENDENT per-row AlwaysDropout streams: row
        b's masks come from fold_in(row_keys[b], t) + the same two splits,
        drawn at shape (1, P) — bit-identical to a batch-of-1 ``_prenet``
        seeded with row_keys[b]. This is the contract behind the server's
        dynamic batching (run/server.py): a request's audio is unchanged
        by whichever other requests share its batch."""
        cfg = self.cfg
        if not dropout_enabled or cfg.dropout == 0.0:
            return self._prenet(params, x, None, False)
        p = params["prenet"]
        d = cfg.dropout

        def one_row(k):
            key = jax.random.fold_in(k, t)
            key, s1 = jax.random.split(key)
            key, s2 = jax.random.split(key)
            m1 = jax.random.bernoulli(s1, 1.0 - d, (1, cfg.prenet_dim))
            m2 = jax.random.bernoulli(s2, 1.0 - d, (1, cfg.prenet_dim))
            return m1[0], m2[0]

        m1, m2 = jax.vmap(one_row)(row_keys)
        x = jax.nn.relu(layers.linear_apply(p["fc1"], x, self.policy))
        x = jnp.where(m1, x / (1.0 - d), 0.0)  # == layers.dropout bitwise
        x = jax.nn.relu(layers.linear_apply(p["fc2"], x, self.policy))
        x = jnp.where(m2, x / (1.0 - d), 0.0)
        return x

    def _encode(
        self,
        params,
        state,
        chars_idx,
        chars_len,
        train: bool,
        rng,
        speaker_id=None,
        description_embeddings=None,
        style=None,  # (B, gst_token_embedding_size) when cfg.gst
    ):
        """Encoder + conditioning fusion + attention-memory precompute
        (reference: model/tacotron2.py:199-229)."""
        cfg = self.cfg
        if cfg.speaker_tokens and speaker_id is None:
            raise ValueError("speaker_id tensor required when speaker tokens are active!")
        if cfg.description_embeddings and description_embeddings is None:
            raise ValueError("description tensor required when description tokens are active!")

        enc_rng = None
        if train:
            rng, enc_rng = jax.random.split(rng)
        encoded, enc_state = encoder_mod.apply(
            params["encoder"], state["encoder"], chars_idx, chars_len,
            train, cfg.dropout, enc_rng, self.policy,
        )

        if cfg.speaker_tokens:
            spk = layers.embedding_apply(params["speaker_embedding"], speaker_id)
            encoded = jnp.tanh(encoded + spk[:, None, :])
        if cfg.description_embeddings:
            desc = jnp.tanh(
                layers.linear_apply(params["description_linear"], description_embeddings, self.policy)
            )  # (B, 128)
            L = chars_idx.shape[1]
            encoded = jnp.concatenate(
                [encoded, jnp.broadcast_to(desc[:, None, :], (desc.shape[0], L, 128))], axis=-1
            )
        if cfg.gst:
            if style is None:
                raise ValueError("style embedding required when GST is active!")
            L = chars_idx.shape[1]
            encoded = jnp.concatenate(
                [encoded, jnp.broadcast_to(style[:, None, :], (style.shape[0], L, style.shape[-1]))],
                axis=-1,
            )

        att_encoded = layers.linear_apply(params["att_encoder"], encoded, self.policy)
        mask = jnp.arange(chars_idx.shape[1])[None, :] >= chars_len[:, None]
        return encoded, att_encoded, mask, enc_state

    # ------------------------------------------------------------------
    def _style(self, params, state, ref_mels, train: bool):
        """GST style embedding from a reference mel (B, T, M) -> (B, S)."""
        from tacotron2_tpu.models.gst import GST

        gst = GST(
            n_mel_channels=self.cfg.num_mels,
            token_embedding_size=self.cfg.gst_token_embedding_size,
            policy=self.policy,
        )
        style, gst_state = gst.apply(params["gst"], state["gst"], ref_mels, train=train)
        return style[:, 0, :], gst_state

    # ------------------------------------------------------------------
    def forward_teacher(
        self,
        params,
        state,
        chars_idx,  # (B, L)
        chars_len,  # (B,)
        mel_spectrogram,  # (B, T, M) ground truth
        mel_spectrogram_len,  # (B,)
        rng,
        train: bool = True,
        speaker_id=None,
        controls=None,
        description_embeddings=None,
        prenet_dropout: bool = True,
        remat: bool = False,
        gst_reference_mel=None,  # defaults to the GT mel when GST is active
        scan_unroll: int = 1,
        precast_weights: bool = False,
        dw_hoist: bool = False,
        pallas_train: Optional[bool] = None,
        pallas_bwd: Optional[str] = None,  # "pallas" | "xla" (default)
        shard_mesh=None,  # jax.sharding.Mesh for the multi-device Pallas path
    ) -> Tuple[Tacotron2Output, dict]:
        """Teacher-forced forward: ONE lax.scan over the decode step
        (replaces the reference's Python loop, model/tacotron2.py:276-317).

        ``remat=True`` rematerializes the decode step in the backward pass
        (jax.checkpoint) — per-step activations aren't stored, enabling
        much larger batch x frames products (the decode is weight-bandwidth
        bound, so the recompute is nearly free)."""
        cfg = self.cfg
        self._check_controls(controls)
        B, T, M = mel_spectrogram.shape

        rng, enc_rng, pre_rng, scan_rng, post_rng = jax.random.split(rng, 5)
        style, gst_state = None, None
        if cfg.gst:
            ref = gst_reference_mel if gst_reference_mel is not None else mel_spectrogram
            style, gst_state = self._style(params, state, ref, train)
        encoded, att_encoded, mask, enc_state = self._encode(
            params, state, chars_idx, chars_len, train, enc_rng,
            speaker_id, description_embeddings, style=style,
        )

        # prenet over the whole shifted GT mel at once (tacotron2.py:254-260)
        shifted = jnp.pad(mel_spectrogram, ((0, 0), (1, 0), (0, 0)))[:, :T]
        decoder_in = self._prenet(params, shifted, pre_rng, prenet_dropout)  # (B,T,P)
        decoder_in = jnp.swapaxes(decoder_in, 0, 1)  # (T, B, P) time-major

        dec_state = decoder_mod.init_state(
            B, chars_idx.shape[1], cfg.att_rnn_dim, cfg.encoded_full_dim, cfg.rnn_hidden_dim
        )
        step_keys = jax.random.split(scan_rng, T)

        # precast_weights: cast the decoder weights to the compute dtype
        # ONCE outside the scan — XLA does NOT hoist loop-invariant casts
        # out of scan bodies, so without this the training scan streams
        # f32 (2x the bytes). Cost: the backward's dW accumulator becomes
        # bf16 too (loss-curve equivalence asserted in
        # tests/test_training.py::test_precast_bf16_training_equivalence).
        dec_params = params["decoder"]
        if precast_weights:
            dec_params = jax.tree.map(self.policy.cast, dec_params)

        if dw_hoist:
            # custom-VJP scan: weight gradients hoisted out of the scan
            # transpose (ops/train_scan.py) — removes the per-step dW
            # accumulator RMW entirely. ``pallas_train`` (auto on TPU when
            # the packed weight block fits VMEM) swaps the forward for the
            # launch-resident Pallas kernel (ops/train_decode_pallas.py) —
            # the per-frame weight re-streaming disappears; the backward is
            # the same verified XLA reverse scan either way.
            from tacotron2_tpu.ops.train_decode_pallas import (
                pallas_bwd_supported,
                pallas_train_supported,
                run_decode_scan_pallas,
            )
            from tacotron2_tpu.ops.train_scan import run_decode_scan

            on_cpu = jax.default_backend() == "cpu"
            # Multi-device meshes (SPMD training): GSPMD has no partitioning
            # rule for pallas_call, so the kernels run per-shard under
            # jax.shard_map over the "data" axis — the decode scan has NO
            # cross-batch ops (LSTM/attention are per-sample), so a
            # per-shard call on B/ndev rows is mathematically identical to
            # the full-batch call, and the shard_map transpose psums the
            # replicated weights' cotangents over ICI automatically. TP
            # meshes ("model" > 1) keep the XLA scan: the column-parallel
            # LSTM weights are sharded and the kernel needs them whole.
            multi = shard_mesh is not None and shard_mesh.size > 1
            shardable = (
                multi
                and "data" in shard_mesh.shape
                and shard_mesh.shape.get("model", 1) == 1
                and B % shard_mesh.shape["data"] == 0
            )
            B_eff = B // shard_mesh.shape["data"] if shardable else B
            use_pallas = pallas_train
            if use_pallas is None:
                use_pallas = not on_cpu and pallas_train_supported(
                    cfg, self.policy, B_eff, max_chars=chars_idx.shape[1]
                )
            if multi and not shardable:
                use_pallas = False  # no GSPMD rule for pallas_call
            if use_pallas:
                if pallas_bwd is None:
                    # the reverse-scan kernel is compiler-clean up to B8=32;
                    # larger batches run it BATCH-CHUNKED (sequential ≤32-row
                    # launches, weight grads summed — _bwd_impl_pallas), which
                    # measured faster than the XLA hoisted reverse scan at
                    # B=64 (88.2 vs 97.8 ms/step) and B=128 (182.5 vs 189.0,
                    # PERF.md r3). Long-char batches whose backward resident
                    # set would blow VMEM (pallas_bwd_supported, evaluated at
                    # the ≤32-row chunk size) fall back to the XLA reverse
                    # scan. Gates use the PER-SHARD batch on multi-device
                    # meshes; interpret mode (CPU) has no VMEM constraint.
                    pallas_bwd = (
                        "pallas"
                        if on_cpu or pallas_bwd_supported(
                            cfg, self.policy, min(B_eff, 32),
                            max_chars=chars_idx.shape[1],
                        )
                        else "xla"
                    )
                if multi:
                    mels, gates, aligns = self._shard_mapped_pallas_scan(
                        shard_mesh, params["decoder"], dec_state, decoder_in,
                        step_keys, encoded, att_encoded, mask, controls,
                        train, on_cpu, pallas_bwd,
                    )
                else:
                    mels, gates, aligns = run_decode_scan_pallas(
                        params["decoder"], dec_state, decoder_in, step_keys,
                        encoded, att_encoded, mask, controls, train, self.policy,
                        interpret=on_cpu, bwd=pallas_bwd,
                    )
            else:
                mels, gates, aligns = run_decode_scan(
                    params["decoder"], dec_state, decoder_in, step_keys,
                    encoded, att_encoded, mask, controls, train, self.policy,
                )
        else:
            def scan_step(carry, xs):
                prev_prenet, key = xs
                mel, gate, new_state = decoder_mod.step(
                    dec_params, prev_prenet, carry, encoded, att_encoded, mask,
                    extra_decoder_in=controls, train=train, rng=key, policy=self.policy,
                )
                return new_state, (mel, gate[:, 0], new_state.att_weights)

            if remat:
                scan_step = jax.checkpoint(scan_step)
            # scan_unroll > 1 amortizes the backward's dW-accumulator
            # read-modify-write (the dominant HBM cost of training, PERF.md)
            # over k steps: XLA fuses the k per-step dW adds into one
            # accumulator update per unrolled iteration
            _, (mels, gates, aligns) = jax.lax.scan(
                scan_step, dec_state, (decoder_in, step_keys),
                unroll=scan_unroll if T % scan_unroll == 0 else 1,
            )
        mels = jnp.swapaxes(mels, 0, 1)  # (B, T, M)
        gates = jnp.swapaxes(gates, 0, 1)[..., None]  # (B, T, 1)
        aligns = jnp.swapaxes(aligns, 0, 1)  # (B, T, L)

        post, post_state = postnet_mod.apply(
            params["postnet"], state["postnet"], mels, train, cfg.dropout, post_rng, self.policy
        )
        mels_post = mels + post

        out = self._mask_outputs(mels, mels_post, gates, aligns, mel_spectrogram_len)
        new_state = {"encoder": enc_state, "postnet": post_state}
        if cfg.gst:
            new_state["gst"] = gst_state
        return out, new_state

    # ------------------------------------------------------------------
    def _shard_mapped_pallas_scan(
        self, mesh, dec_params, dec_state, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, train: bool, on_cpu: bool,
        pallas_bwd: str,
    ):
        """Run the launch-resident Pallas training scan per data shard
        under ``jax.shard_map`` (SURVEY §2.8: the TPU-native scaling story;
        replaces reference run/train.py:236-239's single-GPU pin). Weights
        enter replicated (their cotangents are psum'd over ICI by the
        shard_map transpose); every batch-axis input/output is split over
        "data". The decode scan has no cross-batch ops, so per-shard
        results are bit-identical to the full-batch call — except the
        per-step LSTM dropout masks: each shard folds its data-axis index
        into the step keys so shards draw INDEPENDENT masks (statistically
        equivalent to, but not bit-equal with, the single-device draw;
        exact with train=False / eval, which is what the parity tests
        pin)."""
        from jax.sharding import PartitionSpec as PS

        from tacotron2_tpu.ops.train_decode_pallas import run_decode_scan_pallas

        policy = self.policy

        def local_scan(dec_p, st, din, keys, enc, att, msk, ctl):
            idx = jax.lax.axis_index("data")
            keys = jax.vmap(lambda k: jax.random.fold_in(k, idx))(keys)
            return run_decode_scan_pallas(
                dec_p, st, din, keys, enc, att, msk, ctl, train, policy,
                interpret=on_cpu, bwd=pallas_bwd,
            )

        in_specs = (
            jax.tree.map(lambda _: PS(), dec_params),
            jax.tree.map(lambda _: PS("data"), dec_state),
            PS(None, "data"),  # decoder_in (T, B, P)
            PS(),  # step_keys (T, 2)
            PS("data"), PS("data"), PS("data"),  # encoded, att_encoded, mask
            None if controls is None else PS("data"),
        )
        out_specs = (PS(None, "data"), PS(None, "data"), PS(None, "data"))
        return jax.shard_map(
            local_scan, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(dec_params, dec_state, decoder_in, step_keys, encoded,
          att_encoded, mask, controls)

    # ------------------------------------------------------------------
    def forward_infer(
        self,
        params,
        state,
        chars_idx,
        chars_len,
        max_len: int,
        rng,
        speaker_id=None,
        controls=None,
        description_embeddings=None,
        prenet_dropout: bool = True,
        gst_reference_mel=None,  # GST: neutral (zeros-reference) style if None
        row_rngs=None,  # (B, 2) uint32: independent per-row PRNG streams
    ) -> Tacotron2Output:
        """Free-running decode as ONE lax.while_loop with early stop when all
        gates fire (reference: model/tacotron2.py:262-325). Static-shaped
        (max_len,) output buffers; frames past the executed steps stay zero.

        ``row_rngs`` gives each batch row its own PRNG stream (split(·,3)[2]
        chain, matching the scalar ``rng`` path at B=1) so dynamically
        batched serving reproduces single-request audio exactly."""
        cfg = self.cfg
        self._check_controls(controls)
        B, L = chars_idx.shape

        rng, enc_rng, pre_rng = jax.random.split(rng, 3)
        row_pre = (
            None if row_rngs is None
            else jax.vmap(lambda k: jax.random.split(k, 3)[2])(row_rngs)
        )

        def prenet_at(x, t):
            if row_pre is None:
                return self._prenet(
                    params, x, jax.random.fold_in(pre_rng, t), prenet_dropout
                )
            return self._prenet_rows(params, x, row_pre, t, prenet_dropout)

        style = self._infer_style(params, state, B, gst_reference_mel)
        encoded, att_encoded, mask, _ = self._encode(
            params, state, chars_idx, chars_len, False, enc_rng,
            speaker_id, description_embeddings, style=style,
        )

        dec_state = decoder_mod.init_state(
            B, L, cfg.att_rnn_dim, cfg.encoded_full_dim, cfg.rnn_hidden_dim
        )
        prev_prenet = prenet_at(jnp.zeros((B, cfg.num_mels)), 0)

        mels_buf = jnp.zeros((max_len, B, cfg.num_mels), jnp.float32)
        gates_buf = jnp.full((max_len, B), GATE_MASK_VALUE, jnp.float32)
        aligns_buf = jnp.zeros((max_len, B, L), jnp.float32)

        def cond(carry):
            t, done = carry[0], carry[1]
            return jnp.logical_and(t < max_len, ~jnp.all(done))

        def body(carry):
            t, done, lengths, prev_prenet, dec_state, mels_buf, gates_buf, aligns_buf = carry
            mel, gate, dec_state = decoder_mod.step(
                params["decoder"], prev_prenet, dec_state, encoded, att_encoded, mask,
                extra_decoder_in=controls, train=False, rng=None, policy=self.policy,
            )
            g = gate[:, 0]
            mels_buf = jax.lax.dynamic_update_index_in_dim(mels_buf, mel, t, 0)
            gates_buf = jax.lax.dynamic_update_index_in_dim(gates_buf, g, t, 0)
            aligns_buf = jax.lax.dynamic_update_index_in_dim(
                aligns_buf, dec_state.att_weights, t, 0
            )
            # stop bookkeeping (tacotron2.py:319-322): done is sticky; length
            # counts every executed step whose gate stayed non-negative
            done = jnp.logical_or(done, g < 0.0)
            lengths = lengths + (g >= 0.0).astype(jnp.int32)
            prev_prenet = prenet_at(mel, t + 1)
            return (t + 1, done, lengths, prev_prenet, dec_state, mels_buf, gates_buf, aligns_buf)

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            prev_prenet,
            dec_state,
            mels_buf,
            gates_buf,
            aligns_buf,
        )
        t, done, lengths, _, _, mels_buf, gates_buf, aligns_buf = jax.lax.while_loop(
            cond, body, init
        )

        mels = jnp.swapaxes(mels_buf, 0, 1)
        gates = jnp.swapaxes(gates_buf, 0, 1)[..., None]
        aligns = jnp.swapaxes(aligns_buf, 0, 1)

        post, _ = postnet_mod.apply(
            params["postnet"], state["postnet"], mels, False, cfg.dropout, None, self.policy
        )
        mels_post = mels + post
        out = self._mask_outputs(mels, mels_post, gates, aligns, lengths)
        return out._replace(n_frames=t)

    # ------------------------------------------------------------------
    def forward_infer_fast(
        self, params, state, chars_idx, chars_len, max_len: int, rng,
        shard_mesh=None, **kw
    ) -> Tacotron2Output:
        """Production decode dispatch: the fused Pallas kernel with the
        full-residency default (1.6-3.7x faster than the XLA while_loop on
        v5e across batch 1-64, PERF.md; bit-comparable — same bf16 matmul
        class) when the config/backend supports it; otherwise the XLA
        while_loop parity path. Used by say/test/server.

        Measured batches (tools/decode_batch_ceiling.py, r3): the bf16
        kernel wins outright through B=64 (32.2 vs 50.2 µs/step); its
        attention epilogue hits the Mosaic compile ceiling at B8=128, so
        larger batches run BATCH-CHUNKED ≤64-row launches inside
        forward_infer_fused — 63.9 vs 77.7 µs at B=128 (+22%), 124.0 vs
        142.6 at B=256 (+15%, 2.06M frames/s, exact-bf16 class). The
        per-64-row slopes match (≈32 µs both paths), so the fused
        advantage persists at any batch — no dispatch cap. (The opt-in
        int8 kernel single-launches at B=128 — 53.8 µs — but is the
        approximate mode.)"""
        cfg = self.cfg
        B = chars_idx.shape[0]
        unshardable_mesh = False
        if shard_mesh is not None and shard_mesh.size > 1:
            if not ("data" in shard_mesh.shape
                    and shard_mesh.shape.get("model", 1) == 1
                    and B % shard_mesh.shape["data"] == 0):
                # GSPMD has no partitioning rule for pallas_call — it would
                # all-gather and run the kernel REPLICATED on every device;
                # the XLA while_loop partitions cleanly instead
                unshardable_mesh = True
        fused_ok = (
            cfg.att_rnn_dim == cfg.rnn_hidden_dim
            and 4 * cfg.att_rnn_dim >= 1024
            and not unshardable_mesh
            and jax.default_backend() != "cpu"
        )
        if fused_ok:
            return self.forward_infer_fused(
                params, state, chars_idx, chars_len, max_len, rng=rng,
                shard_mesh=shard_mesh, **kw
            )
        return self.forward_infer(
            params, state, chars_idx, chars_len, max_len, rng=rng, **kw
        )

    # ------------------------------------------------------------------
    def _infer_style(self, params, state, batch: int, gst_reference_mel):
        """Inference-time GST style: from the given reference mel, or a
        neutral zeros-reference when none is provided."""
        if not self.cfg.gst:
            return None
        if gst_reference_mel is None:
            gst_reference_mel = jnp.zeros((batch, 32, self.cfg.num_mels), jnp.float32)
        style, _ = self._style(params, state, gst_reference_mel, train=False)
        return style

    # ------------------------------------------------------------------
    def forward_infer_fused(
        self,
        params,
        state,
        chars_idx,
        chars_len,
        max_len: int,
        rng,
        speaker_id=None,
        controls=None,
        description_embeddings=None,
        prenet_dropout: bool = True,
        interpret: bool = False,
        quantize: bool = False,
        gst_reference_mel=None,
        packed=None,
        resident_cols: Optional[int] = None,
        chunk_width: Optional[int] = None,
        shard_mesh=None,  # jax.sharding.Mesh: batch-sharded multi-chip decode
        batch_kernel_cap: int = 64,  # bf16 kernel's per-launch batch ceiling
        int8_batch_kernel_cap: int = 128,  # int8 kernel's measured ceiling
        row_rngs=None,  # (B, 2) uint32: independent per-row PRNG streams
    ) -> Tacotron2Output:
        """Free-running decode through the fused Pallas kernel
        (tacotron2_tpu.ops.decoder_loop_pallas) — the TPU fast path. Same
        semantics as ``forward_infer``; requires att_rnn_dim ==
        rnn_hidden_dim (true for every shipped config). ``quantize=True``
        streams int8 weights (half the HBM bill) with per-row int8
        activations — an approximate fast mode, NOT the parity path.
        Enforced divergence budget: <1% relative mel-post error and <0.05
        gate-logit drift vs ``forward_infer`` on a fixed seed
        (tests/test_fused_decoder.py::test_fused_int8_close_to_f32;
        measured ~0.2% tiny-config / 0.28% flagship-on-hardware, PERF.md)."""
        from tacotron2_tpu.ops.decoder_loop_pallas import (
            FusedDecodeLoop,
            pack_decoder_params,
        )

        cfg = self.cfg
        B, L = chars_idx.shape
        # the Mosaic kernel only exists for TPU; on CPU fall back to the
        # (bit-equivalent) interpreter so callers don't need to care
        interpret = interpret or jax.default_backend() == "cpu"
        # multi-chip serving (SURVEY §2.8): the fused kernel runs per data
        # shard under jax.shard_map — each shard decodes its B/ndev rows
        # with its OWN early stop (no global all(done) sync, unlike the
        # GSPMD while_loop path). TP meshes / indivisible batches keep the
        # single-program path.
        n_shards = 1
        if (shard_mesh is not None and shard_mesh.size > 1
                and "data" in shard_mesh.shape
                and shard_mesh.shape.get("model", 1) == 1
                and B % shard_mesh.shape["data"] == 0):
            n_shards = shard_mesh.shape["data"]
        B_local = B // n_shards
        rng, enc_rng, pre_rng = jax.random.split(rng, 3)
        # per-row PRNG streams (server dynamic batching): row b's prenet
        # masks are drawn bit-identically to a batch-of-1 call with
        # rng=row_rngs[b] — same split(·,3)[2] chain as the scalar path
        row_pre = (
            None if row_rngs is None
            else jax.vmap(lambda k: jax.random.split(k, 3)[2])(row_rngs)
        )
        style = self._infer_style(params, state, B, gst_reference_mel)
        encoded, att_encoded, mask, _ = self._encode(
            params, state, chars_idx, chars_len, False, enc_rng,
            speaker_id, description_embeddings, style=style,
        )
        if packed is None:
            if resident_cols is None:
                resident_cols = self.default_resident_cols(
                    quantize,
                    batch=min(
                        B_local,
                        int8_batch_kernel_cap if quantize else batch_kernel_cap,
                    ),
                )
            packed = pack_decoder_params(
                params, cfg.num_mels, cfg.encoded_full_dim, cfg.att_rnn_dim,
                cfg.rnn_hidden_dim, cfg.prenet_dim, cfg.controls_dim,
                dtype=self.policy.compute_dtype if self.policy.compute_dtype == jnp.bfloat16 else jnp.float32,
                quantize=quantize, resident_cols=resident_cols,
            )
        else:
            # a pre-packed (serving-cached) decoder carries its own mode
            quantize = packed.w_stream.dtype == jnp.int8
            resident_cols = (
                0 if packed.w_res.shape[1] == 128 else packed.w_res.shape[1] // 2
            )
        # int8 halves the streamed block size, so the chunk width doubles
        # (fewer grid steps per frame, same VMEM double-buffer budget);
        # streamed == 0 (FULL residency) needs no chunk width at all
        streamed = 4 * cfg.att_rnn_dim - resident_cols
        if streamed == 0:
            cw = None
        else:
            cw = chunk_width or min(2048 if quantize else 1024, streamed)
            while streamed % cw:
                cw //= 2
        def decode_chunked(packed_, enc_, att_, msk_, ctl_, r, row_pre_=None):
            """Run the fused loop, BATCH-CHUNKED past ``batch_kernel_cap``
            rows per launch: the bf16 kernel's attention epilogue hits the
            Mosaic compile ceiling at B8=128 (PERF.md), so larger batches
            run sequential ≤cap-row launches — each with its own early
            stop — and concatenate (same trick as the training backward).
            int8 is verified single-launch through B=128 (its measured
            cap); past that it chunks the same way so no batch can reach
            an unverified compile."""
            Bl = enc_.shape[0]
            step = min(Bl, int8_batch_kernel_cap if quantize else batch_kernel_cap)
            outs = []
            for c0 in range(0, Bl, step):
                c1 = min(c0 + step, Bl)
                lp = FusedDecodeLoop(
                    num_mels=cfg.num_mels, encoded_full_dim=cfg.encoded_full_dim,
                    att_rnn_dim=cfg.att_rnn_dim, prenet_dim=cfg.prenet_dim,
                    att_dim=cfg.att_dim, max_chars=L, batch=c1 - c0,
                    controls_dim=cfg.controls_dim, dropout=cfg.dropout,
                    interpret=interpret, chunk_width=cw,
                    resident_cols=resident_cols,
                )
                outs.append(lp.decode(
                    packed_, enc_[c0:c1], att_[c0:c1], msk_[c0:c1], max_len,
                    rng=jax.random.fold_in(r, c0) if c0 else r,
                    controls=None if ctl_ is None else ctl_[c0:c1],
                    prenet_dropout=prenet_dropout,
                    row_rngs=None if row_pre_ is None else row_pre_[c0:c1],
                ))
            if len(outs) == 1:
                return outs[0]
            m, g, a, ln, es = zip(*outs)
            return (jnp.concatenate(m, 0), jnp.concatenate(g, 0),
                    jnp.concatenate(a, 0), jnp.concatenate(ln, 0),
                    jnp.max(jnp.stack(es)))

        if n_shards > 1:
            from jax.sharding import PartitionSpec as PS

            def local_decode(packed_, enc_, att_, msk_, ctl_, row_pre_):
                # independent prenet-dropout stream per shard (per-row
                # streams shard with the batch when row_rngs is given)
                r = jax.random.fold_in(pre_rng, jax.lax.axis_index("data"))
                m, g, a, ln, es = decode_chunked(
                    packed_, enc_, att_, msk_, ctl_, r, row_pre_
                )
                return m, g, a, ln, es[None]

            mels, gates, aligns, lengths, exec_steps = jax.shard_map(
                local_decode, mesh=shard_mesh,
                in_specs=(
                    jax.tree.map(lambda _: PS(), packed),
                    PS("data"), PS("data"), PS("data"),
                    None if controls is None else PS("data"),
                    None if row_pre is None else PS("data"),
                ),
                out_specs=(PS("data"), PS("data"), PS("data"), PS("data"),
                           PS("data")),
                check_vma=False,
            )(packed, encoded, att_encoded, mask, controls, row_pre)
            exec_steps = jnp.max(exec_steps)
        else:
            mels, gates, aligns, lengths, exec_steps = decode_chunked(
                packed, encoded, att_encoded, mask, controls, pre_rng, row_pre
            )
        post, _ = postnet_mod.apply(
            params["postnet"], state["postnet"], mels, False, cfg.dropout, None, self.policy
        )
        mels_post = mels + post
        out = self._mask_outputs(mels, mels_post, gates[..., None], aligns, lengths)
        return out._replace(n_frames=exec_steps)

    # ------------------------------------------------------------------
    def default_resident_cols(self, quantize: bool, batch: int = 1) -> int:
        """VMEM-resident LSTM columns per gate block for the fused decode
        (hardware-tuned on v5e, PERF.md): residency is what beats XLA.
        Batch-aware split (same-process A/B, tools/full_residency_ab.py):
        at B=1 keeping ONE streamed 128-col chunk wins (10.9 vs 12.1
        µs/step — the fetch fully overlaps compute and the split layout
        pipelines better), while batched serving wins with FULL residency
        (B=32: 18.5 vs 23.8 µs/step). Falls back toward streaming on
        configs whose resident block would exceed the VMEM budget; tiny
        test configs keep none."""
        cfg = self.cfg
        H4 = 4 * cfg.att_rnn_dim
        if H4 < 1024:
            return 0
        E = -(-max(cfg.controls_dim, 1) // 16) * 16
        R2 = 2 * cfg.att_rnn_dim + cfg.encoded_full_dim + E
        dsize = 1 if quantize else (2 if self.policy.compute_dtype == jnp.bfloat16 else 4)
        budget = 64 * 1024 * 1024
        rc = H4 if batch >= 8 else H4 - 128
        while rc > 0 and R2 * 2 * rc * dsize > budget:
            rc -= 128
        return max(rc, 0)

    # ------------------------------------------------------------------
    def make_packed_decoder(self, params, quantize: bool = False):
        """Pack (and optionally int8-quantize) the decoder weights ONCE,
        eagerly, into concrete device arrays for reuse across requests —
        the serving-side companion of ``forward_infer_fused`` (which
        otherwise re-packs inside every fresh jit trace; fine for a
        one-shot CLI, wrong for a warm server)."""
        from tacotron2_tpu.ops.decoder_loop_pallas import pack_decoder_params

        cfg = self.cfg
        packed = pack_decoder_params(
            params, cfg.num_mels, cfg.encoded_full_dim, cfg.att_rnn_dim,
            cfg.rnn_hidden_dim, cfg.prenet_dim, cfg.controls_dim,
            dtype=self.policy.compute_dtype if self.policy.compute_dtype == jnp.bfloat16 else jnp.float32,
            quantize=quantize, resident_cols=self.default_resident_cols(quantize),
        )
        # materialize eagerly so later jit traces capture device-resident
        # constants instead of re-tracing the pack/quantize graph
        return jax.tree.map(jnp.asarray, packed)

    # ------------------------------------------------------------------
    def _check_controls(self, controls):
        if self.cfg.controls and controls is None:
            raise ValueError("Controls are enabled, but no control vector was passed!")
        if not self.cfg.controls and controls is not None:
            raise ValueError("Controls are disabled, but a control vector was passed!")

    def _mask_outputs(self, mels, mels_post, gates, aligns, lengths) -> Tacotron2Output:
        """Length masking with the reference's fill values
        (model/tacotron2.py:335-345): mels -> 0.0, gates -> -1000.0."""
        T = mels.shape[1]
        mask = (jnp.arange(T)[None, :] >= lengths[:, None])[..., None]  # (B,T,1)
        mels = jnp.where(mask, 0.0, mels)
        mels_post = jnp.where(mask, 0.0, mels_post)
        gates = jnp.where(mask, GATE_MASK_VALUE, gates)
        return Tacotron2Output(
            mels=mels,
            mels_post=mels_post,
            gates=gates,
            alignments=aligns,
            lengths=lengths,
            n_frames=jnp.asarray(T, jnp.int32),
        )
