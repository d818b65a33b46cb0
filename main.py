"""CLI entry point — same surface as the reference main.py:15-396.

    python main.py --config X [--device N] {train, train_mel_export, say,
        test, test_correlation, preprocess, server}

plus one addition: ``convert`` (PyTorch-Lightning .ckpt -> Orbax directory),
needed because checkpoints cross frameworks here.
``--device`` selects a device index on the TPU host (the reference's GPU
index, main.py:24-30); with a single tunnel chip it is effectively 0.
"""

import json
import os
import sys
import time
from typing import Optional

import click
from click import Context

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@click.group()
@click.pass_context
@click.option("--config", type=str, required=False, default=None,
              help="A Tacotron hyperparameter config file")
@click.option("--device", type=int, required=False, default=0,
              help="The accelerator index to use for training or inference. Default 0.")
def main(ctx: Context, config: str, device: int):
    import jax

    # Honor JAX_PLATFORMS even though this environment's sitecustomize
    # imports jax at interpreter start and pins jax.config.jax_platforms
    # (the explicit config wins over the env var at backend init, so a
    # child process spawned with JAX_PLATFORMS=cpu — e.g. the
    # subprocess-mode server's per-request `main.py say`, or the CPU test
    # suite — would silently initialize the TPU tunnel instead). Backend
    # init is lazy, so re-applying the env var here is still in time.
    env_plat = os.environ.get("JAX_PLATFORMS", "")
    cfg_plat = str(jax.config.jax_platforms or "")
    if env_plat and cfg_plat and env_plat.split(",")[0] != cfg_plat.split(",")[0]:
        jax.config.update("jax_platforms", env_plat)

    # Persistent XLA compilation cache: a cold flagship `say` pays ~5 min
    # of (tunnel-)compile; with the cache a fresh process reloads the same
    # executables in ~20 s (measured 322 s -> 21 s on v5e/axon). Set
    # TACOTRON2_COMPILE_CACHE= (empty) to disable, or point it elsewhere.
    cache_dir = os.environ.get(
        "TACOTRON2_COMPILE_CACHE",
        os.path.expanduser("~/.cache/tacotron2_tpu/jax"),
    )
    if cache_dir:
        if jax.config.jax_compilation_cache_dir is None:  # respect overrides
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ctx.obj["config"] = None
    ctx.obj["raw_config"] = None
    ctx.obj["device"] = device
    if config is not None:
        from tacotron2_tpu.config import load_config

        with open(config) as infile:
            ctx.obj["raw_config"] = json.load(infile)
        ctx.obj["config"] = load_config(config)


def _require_config(ctx, what="this command"):
    if ctx.obj["config"] is None:
        raise click.ClickException(f"Configuration required for {what}!")
    return ctx.obj["config"]


@main.command()
@click.pass_context
@click.option("--speech-dir", required=True, type=str,
              help="A directory containing audio files from the dataset.")
@click.option("--results-dir", required=False, type=str,
              help="The directory to save results. Defaults to the model configuration name with a timestamp.")
@click.option("--resume-ckpt", required=False, type=str,
              help="Resume training from the given checkpoint.")
@click.option("--prosody-model-checkpoint", required=False, type=str,
              help="A prosody model checkpoint (from train_prosody) used as a frozen perceptual loss when extensions.prosody_model.active.")
@click.option("--finetune", is_flag=True, default=False,
              help="Fine-tune a model if the configuration allows. If specified, --resume-ckpt is required.")
@click.option("--finetune-steps", required=False, type=int,
              help="The number of training steps to fine-tune the model. Required if --finetune is given.")
@click.option("--max-steps-override", required=False, type=int, hidden=True)
def train(ctx, speech_dir, results_dir, resume_ckpt, prosody_model_checkpoint,
          finetune, finetune_steps, max_steps_override):
    cfg = _require_config(ctx, "training")
    if finetune and finetune_steps is None:
        raise click.ClickException("If finetuning, --finetune-steps is required!")
    if finetune and resume_ckpt is None:
        raise click.ClickException("If finetuning, --resume-ckpt is required!")
    from run.train import do_train

    do_train(
        cfg, ctx.obj["raw_config"], ctx.obj["device"], speech_dir, results_dir,
        resume_ckpt, finetune=finetune, finetune_steps=finetune_steps,
        max_steps_override=max_steps_override,
        prosody_model_checkpoint=prosody_model_checkpoint,
    )


@main.command("train_prosody")
@click.pass_context
@click.option("--speech-dir", required=True, type=str,
              help="A directory containing audio files from the dataset.")
@click.option("--results-dir", required=False, type=str,
              help="The directory to save results.")
@click.option("--steps", required=False, type=int, default=10000,
              help="Number of training steps.")
@click.option("--lr", required=False, type=float, default=1e-5,
              help="Learning rate (reference default 1e-5).")
@click.option("--batch-size", required=False, type=int, default=32)
def train_prosody(ctx, speech_dir, results_dir, steps, lr, batch_size):
    """Train the prosody predictor used as a frozen perceptual loss
    (the reference's ProsodyPredictorLightning capability,
    model/prosodic_features/prosody_detector.py:158-255)."""
    cfg = _require_config(ctx, "prosody training")
    from run.train_prosody import do_train_prosody

    do_train_prosody(cfg, ctx.obj["raw_config"], ctx.obj["device"], speech_dir,
                     results_dir, steps=steps, lr=lr, batch_size=batch_size)


@main.command("train_mel_export")
@click.pass_context
@click.option("--speech-dir", required=True, type=str)
@click.option("--checkpoint", required=True, type=str)
@click.option("--results-dir", required=False, type=str, default="results_mel_export")
def train_mel_export(ctx, speech_dir, checkpoint, results_dir):
    cfg = _require_config(ctx)
    from run.train_mel_export import do_train_mel_export

    do_train_mel_export(cfg, ctx.obj["device"], speech_dir, checkpoint, results_dir)


@main.command()
@click.pass_context
@click.option("--checkpoint", required=True, type=str, help="A trained Tacotron model checkpoint")
@click.option("--text", required=True, type=str, help="Text to speak")
@click.option("--out", required=False, type=str, default="out.wav",
              help="Name of a .wav file to output. Default: out.wav")
@click.option("--hifi-gan-checkpoint", required=False, type=str, default=None,
              help="A trained HiFi-GAN model checkpoint")
@click.option("--random-seed", required=False, type=int, default=None,
              help="A random seed to use in generation. If not given, a seed will be randomly chosen.")
@click.option("--speaker-id", required=False, type=int, default=None,
              help="A speaker ID to use in inference if using a multi-speaker model")
@click.option("--controls", required=False, type=str, default=None,
              help="If controls are enabled, a comma-separated list of values to pass into the model.")
@click.option("--description", required=False, type=str, default=None,
              help="If descriptions are enabled, a textual description for how the text is to be spoken.")
@click.option("--bert-checkpoint", required=False, type=str, default=None,
              help="Local BERT weights for --description (HF-layout directory, or a torch state-dict file with vocab.txt beside it); no network needed.")
@click.option("--gst-reference", required=False, type=str, default=None,
              help="If GST is enabled, a reference .wav whose style (via the mel frontend) conditions the synthesis; omit for the neutral style.")
@click.option("--export-mel", is_flag=True, default=False, hidden=True)
@click.option("--quantize-int8", is_flag=True, default=False,
              help="Fast decode mode: fused Pallas kernel with int8 weight streaming (~0.3% mel divergence).")
@click.option("--max-len-override", type=int, default=5000, hidden=True)
def say(ctx, checkpoint, text, out, hifi_gan_checkpoint, random_seed,
        speaker_id, controls, description, bert_checkpoint, gst_reference,
        export_mel, quantize_int8, max_len_override):
    cfg = _require_config(ctx, "speech")
    from run.say import do_say

    do_say(cfg, ctx.obj["device"], checkpoint, text, out,
           hifi_gan_checkpoint=hifi_gan_checkpoint, random_seed=random_seed,
           speaker_id=speaker_id, controls=controls, export_mel=export_mel,
           description=description, quantize_int8=quantize_int8,
           max_len_override=max_len_override, bert_checkpoint=bert_checkpoint,
           gst_reference=gst_reference)


@main.command()
@click.pass_context
@click.option("--speech-dir", required=True, type=str)
@click.option("--checkpoint", required=True, type=str)
@click.option("--hifi-gan-checkpoint", required=False, type=str, default=None)
def test(ctx, speech_dir, checkpoint, hifi_gan_checkpoint):
    cfg = _require_config(ctx, "testing")
    from run.test import do_test

    do_test(cfg, ctx.obj["device"], speech_dir, checkpoint, hifi_gan_checkpoint)


@main.command("test_correlation")
@click.pass_context
@click.option("--speech-dir", required=True, type=str)
@click.option("--checkpoint", required=True, type=str)
@click.option("--hifi-gan-checkpoint", required=False, type=str, default=None)
@click.option("--analyze/--no-analyze", default=True,
              help="After the sweep, correlate control values with extracted acoustic features (correlations.csv). The reference leaves this step out-of-repo.")
def test_correlation(ctx, speech_dir, checkpoint, hifi_gan_checkpoint, analyze):
    cfg = _require_config(ctx, "testing")
    from run.test_correlation import do_test_correlation

    do_test_correlation(cfg, ctx.obj["device"], speech_dir, checkpoint,
                        hifi_gan_checkpoint, analyze=analyze)


@main.command()
@click.option("--dataset", required=True, type=str, help="The name of a dataset to preprocess.")
@click.option("--speech-dir", required=True, type=str)
@click.option("--out-dir", required=False, type=str, default="")
@click.option("--out-postfix", required=False, type=str, default=None)
@click.option("--n-jobs", required=False, type=int, default=8)
@click.option("--trim", is_flag=True, show_default=True, default=False)
@click.option("--trim-top-db", required=False, show_default=True, type=float, default=60)
def preprocess(dataset, speech_dir, out_dir, out_postfix, n_jobs, trim, trim_top_db):
    if out_postfix is None:
        out_postfix = str(int(time.time()))
    if dataset == "hifi-tts":
        from preprocessing.hifi_tts import do_preprocess
    elif dataset == "ljspeech":
        from preprocessing.ljspeech import do_preprocess
    else:
        raise NotImplementedError(f"Preprocessing for {dataset} not implemented!")
    do_preprocess(speech_dir, out_dir, out_postfix, n_jobs, trim, trim_top_db)


@main.command()
@click.pass_context
@click.option("--port", required=False, type=int, default=8080, help="The server port.")
@click.option("--mode", required=False, type=click.Choice(["warm", "subprocess"]),
              default="warm", help="warm = resident models; subprocess = reference-parity per-request spawn")
def server(ctx, port, mode):
    if ctx.obj["raw_config"] is None:
        raise click.ClickException("A server configuration is required!")
    from run.server import do_server

    do_server(port, ctx.obj["raw_config"], mode=mode)


@main.command("embed_descriptions")
@click.option("--csv", "csv_path", required=True, type=str,
              help="A pipe-separated manifest with a 'description' text column.")
@click.option("--speech-dir", required=True, type=str,
              help="Dataset root; embeddings are written under description_embeddings/.")
@click.option("--out-csv", required=False, type=str, default=None,
              help="Output manifest path (default: <csv>-embedded.csv).")
@click.option("--bert", required=False, type=str, default="google-bert/bert-base-uncased",
              help="HF model name or local path for the BERT weights/tokenizer.")
@click.option("--augmentations", required=False, type=int, default=0,
              help="Number of token-dropout augmented variants per description.")
@click.option("--batch-size", required=False, type=int, default=32)
def embed_descriptions(csv_path, speech_dir, out_csv, bert, augmentations, batch_size):
    """Generate BERT description embeddings (+ augmentation dirs) in the
    layout the training path consumes (reference consumption semantics:
    datasets/tts_dataset.py:253-291; the reference ships no producer)."""
    from run.embed_descriptions import do_embed_descriptions

    do_embed_descriptions(csv_path, speech_dir, out_csv=out_csv, bert=bert,
                          augmentations=augmentations, batch_size=batch_size)


@main.command()
@click.option("--checkpoint", required=True, type=str, help="A PyTorch-Lightning .ckpt file")
@click.option("--out", required=True, type=str, help="Output Orbax checkpoint directory")
def convert(checkpoint, out):
    """Convert a reference PyTorch-Lightning checkpoint to our format."""
    from tacotron2_tpu.convert import load_lightning_checkpoint
    from tacotron2_tpu.training.checkpoint import save_checkpoint

    params, state, hparams = load_lightning_checkpoint(checkpoint)
    save_checkpoint(out, params, state, {"hyper_parameters": hparams})
    click.echo(f"converted {checkpoint} -> {out}")


if __name__ == "__main__":
    main(obj={})
