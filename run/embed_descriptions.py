"""Description-embedding generation tooling.

The reference train/finetune path CONSUMES precomputed BERT description
embeddings — per-row ``.pt``/``.npy`` files named by a
``description_embedding`` manifest column, plus optional
``*_augmentations/`` directories from which training picks randomly
(reference: datasets/tts_dataset.py:253-291, run/train.py:70-107) — but
ships no tool that PRODUCES them. This driver closes that gap: it runs the
framework's JAX BERT (tacotron2_tpu.models.bert) over a manifest's
``description`` texts and emits

    <speech_dir>/description_embeddings/<stem>.npy            (1, H) pooler
    <speech_dir>/description_embeddings/<stem>_augmentations/aug{k}.npy

and a manifest copy with the ``description_embedding`` column filled with
the relative paths the dataset reader expects (data/dataset.py:137-154).

Augmented variants are token-dropout re-encodes (random non-special tokens
replaced with [MASK]) — the reference records no augmentation recipe (only
the consumption side survives), so this is our documented choice: cheap,
deterministic under a seed, and it perturbs the embedding the way the
consumption path expects (same text, nearby vector).
"""

from __future__ import annotations

import os
from os import path
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp


class BertEmbedder:
    """Tokenize host-side (HF tokenizer), encode with our JAX BERT on
    device, return pooler_output rows (run/say.py pooler semantics)."""

    def __init__(self, torch_model, tokenizer):
        from tacotron2_tpu.models.bert import Bert, convert_bert_state_dict

        sd = torch_model.state_dict() if hasattr(torch_model, "state_dict") else torch_model
        params, cfg = convert_bert_state_dict(sd)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self._apply = jax.jit(Bert(cfg).apply)

    @classmethod
    def from_pretrained(cls, name_or_path: str = "google-bert/bert-base-uncased"):
        from transformers import AutoTokenizer, BertModel

        return cls(
            BertModel.from_pretrained(name_or_path),
            AutoTokenizer.from_pretrained(name_or_path),
        )

    @classmethod
    def from_local(cls, checkpoint: str):
        """OFFLINE weights path (no network, ever — this environment has
        zero egress, and production weight provisioning is a one-time copy
        of the HF artifacts onto the host). Accepts either

        - a directory in HF layout (``config.json`` + weights +
          ``vocab.txt``): loaded with ``local_files_only=True``; or
        - a torch state-dict file (``.pt``/``.bin``, a plain
          ``torch.save(model.state_dict())``) with ``vocab.txt`` next to
          it for the WordPiece tokenizer.

        Matches the reference's BERT consumption semantics
        (run/say.py:99-106) without its implicit download."""
        import os as _os

        if _os.path.isdir(checkpoint):
            from transformers import AutoTokenizer, BertModel

            return cls(
                BertModel.from_pretrained(checkpoint, local_files_only=True),
                AutoTokenizer.from_pretrained(checkpoint, local_files_only=True),
            )
        import torch
        from transformers import BertTokenizer

        sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd and "pooler.dense.weight" not in sd:
            sd = sd["state_dict"]  # Lightning-style wrapper
        vocab = _os.path.join(_os.path.dirname(checkpoint) or ".", "vocab.txt")
        if not _os.path.exists(vocab):
            raise FileNotFoundError(
                f"WordPiece vocab not found at {vocab} — place the BERT "
                f"vocab.txt next to the state-dict file."
            )
        return cls(sd, BertTokenizer(vocab_file=vocab))

    @classmethod
    def resolve(cls, name_or_path: str):
        """Local path (dir or state-dict file) -> from_local; anything
        else -> HF from_pretrained (requires network/cache)."""
        import os as _os

        if _os.path.exists(name_or_path):
            return cls.from_local(name_or_path)
        return cls.from_pretrained(name_or_path)

    def _pad_to(self, seqs: List[List[int]], bucket: int = 16):
        L = max(len(s) for s in seqs)
        L = -(-L // bucket) * bucket  # static-shape bucketing for XLA
        ids = np.zeros((len(seqs), L), np.int64)
        mask = np.zeros((len(seqs), L), np.float32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1.0
        return ids, mask

    def embed(
        self,
        texts: List[str],
        drop_prob: float = 0.0,
        rng: Optional[np.random.Generator] = None,
    ) -> np.ndarray:
        """-> (N, hidden) pooler outputs. ``drop_prob`` > 0 replaces that
        fraction of non-special tokens with [MASK] (augmentation mode)."""
        enc = [self.tokenizer.encode(t, truncation=True, max_length=self.cfg.max_position_embeddings) for t in texts]
        if drop_prob > 0.0:
            assert rng is not None
            mask_id = self.tokenizer.mask_token_id
            special = set(self.tokenizer.all_special_ids)
            enc = [
                [
                    mask_id
                    if (tok not in special and rng.random() < drop_prob)
                    else tok
                    for tok in s
                ]
                for s in enc
            ]
        ids, mask = self._pad_to(enc)
        _, pooled = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(pooled, np.float32)


def do_embed_descriptions(
    csv_path: str,
    speech_dir: str,
    out_csv: Optional[str] = None,
    column: str = "description",
    out_column: str = "description_embedding",
    bert: str = "google-bert/bert-base-uncased",
    augmentations: int = 0,
    augment_drop_prob: float = 0.15,
    batch_size: int = 32,
    seed: int = 0,
    embedder: Optional[BertEmbedder] = None,
) -> str:
    """-> path of the manifest copy with ``out_column`` filled. Rows whose
    ``column`` is empty keep an empty path (the dataset reader substitutes
    zeros, data/dataset.py:139-140)."""
    from run.common import read_manifest

    df = read_manifest(csv_path)
    if column not in df.columns:
        raise ValueError(f"column {column!r} not in {csv_path}")
    if embedder is None:
        embedder = BertEmbedder.resolve(bert)

    out_dir = path.join(speech_dir, "description_embeddings")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    rel_paths: List[Optional[str]] = [None] * len(df)
    todo = [
        (i, str(d))
        for i, d in enumerate(df[column])
        if isinstance(d, str) and d.strip()
    ]
    print(f"embed_descriptions: {len(todo)}/{len(df)} rows have descriptions")
    for start in range(0, len(todo), batch_size):
        chunk = todo[start : start + batch_size]
        texts = [t for _, t in chunk]
        base = embedder.embed(texts)
        augs = [
            embedder.embed(texts, drop_prob=augment_drop_prob, rng=rng)
            for _ in range(augmentations)
        ]
        for j, (i, _) in enumerate(chunk):
            stem = path.splitext(path.basename(str(df.wav[i])))[0]
            rel = path.join("description_embeddings", f"{stem}.npy")
            np.save(path.join(speech_dir, rel), base[j : j + 1])
            if augmentations:
                aug_dir = path.join(out_dir, f"{stem}_augmentations")
                os.makedirs(aug_dir, exist_ok=True)
                for k, a in enumerate(augs):
                    np.save(path.join(aug_dir, f"aug{k}.npy"), a[j : j + 1])
            rel_paths[i] = rel

    df[out_column] = ["" if p is None else p for p in rel_paths]
    out_csv = out_csv or csv_path.replace(".csv", "-embedded.csv")
    df.to_csv(out_csv, sep="|", index=False)
    print(f"wrote {out_csv}")
    return out_csv
