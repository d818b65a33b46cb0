from tacotron2_tpu.data.dataset import TTSDataset
from tacotron2_tpu.data.loader import TTSDataLoader, collate

__all__ = ["TTSDataset", "TTSDataLoader", "collate"]
