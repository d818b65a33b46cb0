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
