"""Training-harness tests: loss parity vs torch, optimizer-chain parity vs
torch Adam (coupled weight decay + MultiStepLR + global-norm clip), and a
tiny-config overfit run (SURVEY §4 plan: 'tiny-config train step loss-drop')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tacotron2_tpu.training.losses import bce_with_logits, mse, tacotron2_loss
from tacotron2_tpu.training.optimizer import make_optimizer, multistep_lr_schedule
from tacotron2_tpu.training.step import make_eval_step, make_train_step
from tacotron2_tpu.training.train_state import TrainState


def test_bce_mse_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 9, 1)).astype(np.float32) * 3
    targets = (rng.uniform(size=(4, 9, 1)) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)
    ).item()
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(ours - ref) < 1e-6

    a = rng.standard_normal((4, 9, 80)).astype(np.float32)
    b = rng.standard_normal((4, 9, 80)).astype(np.float32)
    ref = torch.nn.functional.mse_loss(torch.tensor(a), torch.tensor(b)).item()
    assert abs(float(mse(jnp.asarray(a), jnp.asarray(b))) - ref) < 1e-6


def test_bce_masked_region_contributes_zero():
    # masked gates are -1000 vs padded target 0 -> ~0 numerator (SURVEY §7)
    logits = jnp.full((2, 5, 1), -1000.0)
    targets = jnp.zeros((2, 5, 1))
    assert float(bce_with_logits(logits, targets)) < 1e-12


def test_multistep_schedule():
    sched = multistep_lr_schedule(1e-3, [50, 75], gamma=0.1)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(49)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(75)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-5, rtol=1e-6)


def test_optimizer_matches_torch_adam():
    """3 steps of [global-norm clip 1.0 -> Adam(lr, coupled wd)] on identical
    quadratic grads must match torch (run/train.py:240 + tts_model.py:80)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    w0 = rng.standard_normal((5, 4)).astype(np.float32)
    targets = [rng.standard_normal((5, 4)).astype(np.float32) for _ in range(3)]

    # torch side
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-2)
    for t in targets:
        opt.zero_grad()
        loss = ((wt - torch.tensor(t)) ** 2).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([wt], 1.0)
        opt.step()

    # ours
    tx, _ = make_optimizer(1e-2, 1e-2, scheduler_milestones=[], grad_clip=1.0)
    params = {"w": jnp.asarray(w0.copy())}
    opt_state = tx.init(params)
    for t in targets:
        grads = {"w": 2 * (params["w"] - jnp.asarray(t))}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5)


def _tiny_batch(B=2, L=8, T=12, M=16, seed=0):
    rng = np.random.default_rng(seed)
    chars = rng.integers(1, 12, size=(B, L)).astype(np.int64)
    lens = np.full((B,), L, dtype=np.int64)
    mel = rng.standard_normal((B, T, M)).astype(np.float32) * 0.5
    mel_len = np.full((B,), T, dtype=np.int64)
    gate = np.ones((B, T, 1), np.float32)
    gate[:, -1] = 0.0
    return {
        "chars_idx": jnp.asarray(chars),
        "chars_len": jnp.asarray(lens),
        "mel": jnp.asarray(mel),
        "mel_len": jnp.asarray(mel_len),
        "gate": jnp.asarray(gate),
    }


def test_overfit_tiny_batch():
    cfg = Tacotron2Config(
        num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
        prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
        postnet_dim=16, dropout=0.0,
    )
    model = Tacotron2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(3e-3, 1e-6, scheduler_milestones=[])
    ts = TrainState.create(params, state, tx)
    train_step = make_train_step(model, tx, donate=False)
    batch = _tiny_batch()
    rng = jax.random.PRNGKey(42)

    first = None
    for i in range(60):
        ts, metrics = train_step(ts, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, f"loss did not drop: {first} -> {last}"
    assert int(ts.step) == 60


def test_bf16_train_step_backward():
    """bf16-mixed policy must support the FULL backward (conv transpose
    rules need uniform dtypes — regression for the AMP path)."""
    from tacotron2_tpu.models.layers import Policy

    cfg = Tacotron2Config(
        num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
        prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
        postnet_dim=16, dropout=0.1,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 1e-6, scheduler_milestones=[])
    ts = TrainState.create(params, state, tx)
    train_step = make_train_step(model, tx, donate=False)
    ts2, metrics = train_step(ts, _tiny_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params stay f32 (the policy casts at matmul time only)
    assert ts2.params["decoder"]["gate"]["w"].dtype == jnp.float32


def test_eval_step_runs():
    cfg = Tacotron2Config(
        num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
        prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
        postnet_dim=16, dropout=0.1,
    )
    model = Tacotron2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    metrics, firsts = make_eval_step(model)(params, state, _tiny_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert firsts["alignment"].shape == (12, 8)


def test_freeze_mask_finetune():
    """Finetune protocol freezes encoder + speaker embedding
    (run/train.py:229-233)."""
    cfg = Tacotron2Config(
        num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
        prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
        postnet_dim=16, dropout=0.0, speaker_tokens=True, num_speakers=3,
    )
    model = Tacotron2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    mask = jax.tree.map(lambda _: True, params)
    mask["encoder"] = jax.tree.map(lambda _: False, params["encoder"])
    mask["speaker_embedding"] = jax.tree.map(lambda _: False, params["speaker_embedding"])
    tx, _ = make_optimizer(1e-3, 0.0, scheduler_milestones=[], freeze_mask=mask)
    ts = TrainState.create(params, state, tx)
    train_step = make_train_step(model, tx, donate=False)
    batch = _tiny_batch()
    batch["speaker_id"] = jnp.asarray([0, 1])
    ts2, _ = train_step(ts, batch, jax.random.PRNGKey(0))
    # frozen params unchanged, others moved
    np.testing.assert_array_equal(
        np.asarray(ts2.params["encoder"]["embedding"]["table"]),
        np.asarray(params["encoder"]["embedding"]["table"]),
    )
    assert not np.allclose(
        np.asarray(ts2.params["decoder"]["gate"]["w"]), np.asarray(params["decoder"]["gate"]["w"])
    )


def test_resume_rejects_mismatched_opt_state(tmp_path):
    """load_train validates per-leaf shape/dtype, not just leaf count — a
    same-count/different-shape checkpoint must raise the clean error."""
    from tacotron2_tpu.training import checkpoint as ckpt_lib

    tx, _ = make_optimizer(1e-3, 0.0)
    params_a = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    params_b = {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}  # same leaf count
    opt_a = tx.init(params_a)
    opt_b = tx.init(params_b)

    d = str(tmp_path / "ck")
    ckpt_lib.save_checkpoint(d, params_a, {}, opt_state=opt_a, step=7)

    # matching structure restores
    state, step = ckpt_lib.load_train(d, opt_a)
    assert step == 7

    with pytest.raises(ValueError, match="does not match"):
        ckpt_lib.load_train(d, opt_b)


def test_async_saver_roundtrip_and_error_propagation(tmp_path):
    """AsyncSaver (run/train.py's periodic last.ckpt path): the background
    save must produce a checkpoint bit-identical to the synchronous one —
    including when the train loop immediately replaces its param tree —
    saves must serialize, and a failed background save must raise on the
    next wait/save instead of disappearing."""
    from tacotron2_tpu.training import checkpoint as ckpt_lib

    tx, _ = make_optimizer(1e-3, 0.0)
    params = {"w": jnp.arange(16.0).reshape(4, 4), "b": jnp.ones((4,))}
    opt = tx.init(params)

    saver = ckpt_lib.AsyncSaver()
    d_async = str(tmp_path / "async.ckpt")
    saver.save(d_async, params, {}, {"k": 1}, opt_state=opt, step=3)
    # simulate the loop moving on: rebind to a new tree mid-save
    params = jax.tree.map(lambda x: x * 0.0, params)
    saver.wait()

    d_sync = str(tmp_path / "sync.ckpt")
    ckpt_lib.save_checkpoint(
        d_sync, {"w": jnp.arange(16.0).reshape(4, 4), "b": jnp.ones((4,))},
        {}, {"k": 1}, opt_state=opt, step=3)
    pa, _, ca = ckpt_lib.load_model(d_async)
    ps, _, cs = ckpt_lib.load_model(d_sync)
    assert ca == cs == {"k": 1}
    jax.tree.map(np.testing.assert_array_equal, pa, ps)
    oa, sa = ckpt_lib.load_train(d_async, opt)
    os_, ss = ckpt_lib.load_train(d_sync, opt)
    assert sa == ss == 3
    jax.tree.map(np.testing.assert_array_equal, oa, os_)

    # error propagation: unwritable path fails on the NEXT wait
    saver.save("/proc/definitely/not/writable.ckpt", pa, {}, None)
    with pytest.raises(Exception):
        saver.wait()
    # the saver recovers after surfacing the error
    saver.save(str(tmp_path / "again.ckpt"), pa, {})
    saver.wait()
    assert ckpt_lib.load_model(str(tmp_path / "again.ckpt"))[0] is not None


def test_async_saver_survives_donated_originals(tmp_path):
    """Donation-race regression (caught by the 50k hardware burn-in at a
    step-10000 save): the sharded train step DONATES its params/opt_state
    buffers, so the arrays handed to ``AsyncSaver.save`` are DELETED as
    soon as the loop dispatches the next step — while the background
    gather may still be reading them. The saver must snapshot by device
    copy on the caller's thread: after ``save`` returns, deleting the
    originals must not corrupt or fail the save. (Invisible to a CPU
    train run — donation is a no-op there — hence this explicit
    ``delete()``.)"""
    from tacotron2_tpu.training import checkpoint as ckpt_lib

    params = {"w": jnp.arange(16.0).reshape(4, 4)}
    opt = {"m": jnp.ones((4,))}
    saver = ckpt_lib.AsyncSaver()
    d = str(tmp_path / "donated.ckpt")
    saver.save(d, params, {}, {"k": 2}, opt_state=opt, step=11)
    # simulate the next dispatch consuming the donated buffers
    params["w"].delete()
    opt["m"].delete()
    saver.wait()
    p, _, cfg = ckpt_lib.load_model(d)
    np.testing.assert_array_equal(p["w"], np.arange(16.0).reshape(4, 4))
    assert cfg == {"k": 2}
    o, s = ckpt_lib.load_train(d, {"m": jnp.zeros((4,))})
    assert s == 11
    np.testing.assert_array_equal(o["m"], np.ones((4,)))


def test_precast_bf16_training_equivalence():
    """bf16-policy training pre-casts the decoder weights outside the scan
    (halves the streamed bytes; the dW accumulator becomes bf16 — PERF.md).
    Gate: the loss curve must track the in-scan-cast (f32-accumulated)
    variant closely over a real optimization run."""
    from tacotron2_tpu.models.layers import Policy
    from tacotron2_tpu.training.losses import tacotron2_loss

    cfg = Tacotron2Config(
        num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
        prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
        postnet_dim=16, dropout=0.0,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params0, state = model.init(jax.random.PRNGKey(0))
    batch = _tiny_batch()
    key = jax.random.PRNGKey(9)

    def curve(precast):
        tx, _ = make_optimizer(3e-3, 1e-6, scheduler_milestones=[])
        opt = tx.init(params0)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                out, _ = model.forward_teacher(
                    p, state, batch["chars_idx"], batch["chars_len"],
                    batch["mel"], batch["mel_len"], rng=rng, train=True,
                    remat=True, precast_weights=precast,
                )
                loss, _ = tacotron2_loss(
                    out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
                )
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return loss, optax.apply_updates(params, updates), new_opt

        params, losses = params0, []
        for i in range(40):
            loss, params, opt = step(params, opt, key)
            losses.append(float(loss))
        return np.asarray(losses)

    base = curve(precast=False)
    fast = curve(precast=True)
    assert np.all(np.isfinite(fast))
    # same optimization trajectory within bf16 noise: final loss within 5%
    # and no step diverging by more than 10%
    assert fast[-1] < 0.6 * fast[0]  # it actually optimizes
    np.testing.assert_allclose(fast[-1], base[-1], rtol=0.05)
    assert np.max(np.abs(fast - base) / np.abs(base)) < 0.10
