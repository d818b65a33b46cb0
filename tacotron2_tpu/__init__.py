"""tacotron2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Tacotron 2 TTS framework.

A from-scratch rebuild of the capabilities of the reference PyTorch/Lightning
Tacotron 2 research stack (mattm458/tacotron2), designed TPU-first:

- functional models (pytree params), bf16-mixed compute on the MXU
- the autoregressive decode loop as ``lax.scan`` (teacher forcing) /
  ``lax.while_loop`` (free-running) over a fused decoder step
- data parallelism via ``jax.sharding.Mesh`` + ``jax.jit`` sharding constraints
- on-device audio frontend (STFT/mel/Griffin-Lim) instead of torchaudio/librosa
- Orbax checkpoints plus a one-way PyTorch-Lightning ``.ckpt`` converter

Reference layer map: see SURVEY.md §1 (file:line citations into /root/reference).
"""

__version__ = "0.1.0"
