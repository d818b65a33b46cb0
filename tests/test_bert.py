"""JAX BERT parity vs transformers' torch BertModel (random init, offline —
no weight downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from tacotron2_tpu.models.bert import Bert, convert_bert_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def torch_bert():
    cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    m = transformers.BertModel(cfg)
    m.eval()
    return m


def test_bert_parity_no_padding(torch_bert):
    params, cfg = convert_bert_state_dict(torch_bert.state_dict(), num_attention_heads=4)
    assert cfg.num_hidden_layers == 3 and cfg.hidden_size == 64
    ours = Bert(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = torch_bert(input_ids=torch.tensor(ids))
    hidden, pooled = ours.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(hidden), ref.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-5)


def test_bert_parity_with_padding_mask(torch_bert):
    params, cfg = convert_bert_state_dict(torch_bert.state_dict(), num_attention_heads=4)
    ours = Bert(cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 100, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[0, 7:] = 0
    mask[1, 5:] = 0
    tt = np.zeros((2, 10), np.int64)
    tt[:, 4:] = 1
    with torch.no_grad():
        ref = torch_bert(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        )
    hidden, pooled = ours.apply(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
    )
    # only REAL positions must match (HF computes padded positions too but
    # downstream consumers mask them)
    for b, n in ((0, 7), (1, 5)):
        np.testing.assert_allclose(
            np.asarray(hidden)[b, :n], ref.last_hidden_state.numpy()[b, :n], atol=2e-5
        )
    np.testing.assert_allclose(np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# Production shape: the shipped config is bert-base (12 x 768, 12 heads,
# vocab 30522, 512 positions — reference run/say.py:99-106 loads exactly
# this). The toy tests above can't catch layout/precision bugs that only
# appear at these dims (64-dim head splitting, f32 drift over 12 layers,
# pooler semantics under truncation), so this runs the real shape
# random-init (offline-safe).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_bert_base():
    cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(1)
    m = transformers.BertModel(cfg)
    m.eval()
    return m


def test_bert_base_production_shape_parity(torch_bert_base):
    params, cfg = convert_bert_state_dict(torch_bert_base.state_dict())
    assert (cfg.num_hidden_layers, cfg.hidden_size, cfg.num_attention_heads,
            cfg.vocab_size, cfg.max_position_embeddings) == (12, 768, 12, 30522, 512)
    ours = Bert(cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 30522, size=(2, 64)).astype(np.int64)
    mask = np.ones((2, 64), np.int64)
    mask[1, 40:] = 0
    with torch.no_grad():
        ref = torch_bert_base(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    hidden, pooled = ours.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # 12 layers of f32 accumulate more rounding than the 3-layer toy; the
    # random-init activations are O(1) so atol 2e-4 is ~1e-4 relative
    np.testing.assert_allclose(
        np.asarray(hidden)[0], ref.last_hidden_state.numpy()[0], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(hidden)[1, :40], ref.last_hidden_state.numpy()[1, :40], atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-4)


def test_bert_base_from_local_truncated_description(torch_bert_base, tmp_path):
    """from_local round-trip at the production shape, driving the full
    embed() path (WordPiece tokenize -> truncate at 512 positions -> JAX
    encode -> pooler) on a description long enough to force truncation;
    parity vs torch on the identically truncated ids."""
    from run.embed_descriptions import BertEmbedder

    sd_path = tmp_path / "bert.pt"
    torch.save(torch_bert_base.state_dict(), sd_path)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "calm", "deep", "voice", "with", "slow", "pacing"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")

    emb = BertEmbedder.from_local(str(sd_path))
    assert emb.cfg.max_position_embeddings == 512

    text = " ".join(["a calm deep voice with slow pacing"] * 120)  # 840 tokens
    enc = emb.tokenizer.encode(text, truncation=True, max_length=512)
    assert len(enc) == 512, "description must actually hit the truncation cap"

    pooled = emb.embed([text])
    with torch.no_grad():
        ref = torch_bert_base(input_ids=torch.tensor([enc]))
    assert pooled.shape == (1, 768)
    np.testing.assert_allclose(pooled, ref.pooler_output.numpy(), atol=2e-4)
