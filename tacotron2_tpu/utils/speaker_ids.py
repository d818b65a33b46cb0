"""Speaker-ID label encoding (reference: model/speaker_embeddings/utils.py:10-19
— a memoized sklearn LabelEncoder over a speaker-ID file)."""

from __future__ import annotations

import functools
from typing import Dict, List


class SpeakerIdEncoder:
    """Stable label encoder: sorted unique ids -> 0..N-1 (sklearn
    LabelEncoder semantics)."""

    def __init__(self, speaker_ids: List):
        self.classes_ = sorted(set(speaker_ids))
        self._index: Dict = {c: i for i, c in enumerate(self.classes_)}

    def transform(self, ids: List) -> List[int]:
        return [self._index[i] for i in ids]

    def inverse_transform(self, idx: List[int]):
        return [self.classes_[i] for i in idx]


@functools.lru_cache(maxsize=None)
def get_encoder(speaker_id_file: str) -> SpeakerIdEncoder:
    """Memoized encoder over a newline-separated speaker-ID file."""
    with open(speaker_id_file) as f:
        ids = [line.strip() for line in f if line.strip()]
    return SpeakerIdEncoder(ids)
