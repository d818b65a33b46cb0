from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

__all__ = ["Tacotron2", "Tacotron2Config"]
