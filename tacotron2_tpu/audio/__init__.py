from tacotron2_tpu.audio.io import read_wav, write_wav
from tacotron2_tpu.audio.mel import TacotronMelSpectrogram, mel_filterbank
from tacotron2_tpu.audio.trim import trim_silence
from tacotron2_tpu.audio.griffin_lim import griffin_lim, mel_to_audio

__all__ = [
    "read_wav",
    "write_wav",
    "TacotronMelSpectrogram",
    "mel_filterbank",
    "trim_silence",
    "griffin_lim",
    "mel_to_audio",
]
