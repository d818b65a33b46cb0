"""Decompose the HiFi-GAN vocoder cost (VERDICT r2 #6; r5: re-profiled on
the FUSED production path per VERDICT r4 #4): per-stage cumulative timings
for three variants — XLA upsamples only, XLA ups+MRF, and the shipped
fused Pallas path (mrf_stage_pallas with fuse_ups) — via the honest slope
protocol (two workload sizes cancel the tunnel transport), plus an
analytic FLOPs model -> achieved TFLOP/s and % of the v5e bf16 roofline.
All variants are timed inside EACH round (interleaved) so transport drift
hits every row equally; median over rounds.

Usage: python tools/vocoder_decompose.py [frames1 frames2 rounds]
       (default 512 2048 5)
  VOC_SERIES=fused     restrict to the fused series (fast re-profile)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig, get_padding, LRELU_SLOPE
from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import Policy

V5E_BF16_TFLOPS = 197.0  # peak per chip


def prefix_apply(model, params, mel, n_stages, with_mrf):
    """conv_pre + the first ``n_stages`` upsample stages (optionally with
    their MRF resblocks); skips conv_post — jnp.sum fences the rest."""
    cfg, pol = model.cfg, model.policy
    num_kernels = len(cfg.resblock_kernel_sizes)
    x = layers.conv1d_apply(params["conv_pre"], mel, pol, padding=3)
    for i in range(n_stages):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = layers.conv_transpose1d_apply(
            params["ups"][i], x, stride=u, padding=(k - u) // 2, policy=pol
        )
        if with_mrf:
            acc = None
            for j in range(num_kernels):
                rb = params["resblocks"][i * num_kernels + j]
                y = model._resblock(
                    rb, x, cfg.resblock_kernel_sizes[j], cfg.resblock_dilation_sizes[j]
                )
                acc = y if acc is None else acc + y
            x = acc / num_kernels
    return x


def prefix_apply_fused(model, params, mel, n_stages):
    """conv_pre + the first ``n_stages`` stages on the PRODUCTION fused
    path (ops/mrf_pallas.py::mrf_stage_pallas with the stage's lrelu ->
    convT fused in where the layouts align — all UNIVERSAL_V1 stages);
    mirrors HiFiGAN.apply's fused branch exactly (models/hifigan.py)."""
    from tacotron2_tpu.ops.mrf_pallas import (
        mrf_stage_pallas, upsample_fusable, upsample_fusable_expand,
    )

    cfg, pol = model.cfg, model.policy
    nk = len(cfg.resblock_kernel_sizes)
    x = layers.conv1d_apply(params["conv_pre"], mel, pol, padding=3)
    ch = cfg.upsample_initial_channel
    for i in range(n_stages):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        rbs = [params["resblocks"][i * nk + j] for j in range(nk)]
        common = dict(
            resblock=cfg.resblock, kernels=cfg.resblock_kernel_sizes,
            dilations=cfg.resblock_dilation_sizes,
            bf16=(pol.compute_dtype == jnp.bfloat16), interpret=False,
            edge_mask=False,
        )
        if (upsample_fusable(u, ch, ch // 2, k)
                or upsample_fusable_expand(u, ch, ch // 2, k)):
            x = mrf_stage_pallas(rbs, x, upsample=(params["ups"][i], u), **common)
        else:
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = layers.conv_transpose1d_apply(
                params["ups"][i], x, stride=u, padding=(k - u) // 2, policy=pol
            )
            x = mrf_stage_pallas(rbs, x, **common)
        ch //= 2
    return x


def flops_model(cfg, n_stages, with_mrf):
    """MACs per mel frame for the prefix (conv_pre + n stages)."""
    macs = 7 * cfg.num_mels * cfg.upsample_initial_channel  # conv_pre
    ch = cfg.upsample_initial_channel
    t_mult = 1
    for i in range(n_stages):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        macs += t_mult * k * ch * (ch // 2)  # transposed conv (per input frame)
        ch //= 2
        t_mult *= u
        if with_mrf:
            for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                convs = 2 * len(dil) if cfg.resblock == "1" else len(dil)
                macs += t_mult * convs * kr * ch * ch
    return macs * 2  # FLOPs


def main():
    argv = [int(x) for x in sys.argv[1:]]
    frames = argv[:2] or [512, 2048]
    rounds = argv[2] if len(argv) >= 3 else 5
    reps = int(os.environ.get("VOC_REPS", "3"))
    cfg = HiFiGANConfig()  # UNIVERSAL_V1 architecture
    model = HiFiGAN(cfg, Policy.from_string("bf16-mixed"))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mel1 = jnp.asarray(rng.standard_normal((1, frames[0], 80)).astype(np.float32))
    mel2 = jnp.asarray(rng.standard_normal((1, frames[1], 80)).astype(np.float32))
    dn = frames[1] - frames[0]

    # variant set: (label, mrf_mode, n_stages); mrf_mode in
    # {"ups", "xla", "fused"} — "fused" is the shipped production path
    only = os.environ.get("VOC_SERIES")
    variants = []
    for n in range(0, len(cfg.upsample_rates) + 1):
        modes = ["ups"] if n == 0 else ["ups", "xla", "fused"]
        for m in modes:
            if only and n and m != only and m != "ups":
                continue
            variants.append((m, n))

    def build(mode, n):
        if mode == "fused":
            fn = lambda m: prefix_apply_fused(model, params, m, n)
        else:
            fn = lambda m: prefix_apply(model, params, m, n, mode == "xla")
        return jax.jit(fn)

    comps = {}
    for mode, n in variants:
        f = build(mode, n)
        comps[(mode, n)] = f
        float(jnp.sum(f(mel1)))  # compile + warm
        float(jnp.sum(f(mel2)))
        print(f"  compiled {mode} n={n}", file=sys.stderr, flush=True)

    def t_of(f, mel):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(f(mel)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # interleaved rounds: every variant sampled in each round
    slopes = {v: [] for v in variants}
    for r in range(rounds):
        order = variants if r % 2 == 0 else variants[::-1]
        for v in order:
            f = comps[v]
            slopes[v].append((t_of(f, mel2) - t_of(f, mel1)) / dn)
        print(f"  round {r} done", file=sys.stderr, flush=True)

    med = {v: sorted(s)[len(s) // 2] for v, s in slopes.items()}
    print("variant                    us/frame   FLOPs/frame  achieved    MFU")
    rows = []
    prev = {m: (med[("ups", 0)], flops_model(cfg, 0, False))
            for m in ("ups", "xla", "fused")}
    for mode, n in variants:
        t = med[(mode, n)]
        fl = flops_model(cfg, n, mode != "ups")
        label = f"stages<={n} ({mode})"
        tf = fl / t / 1e12 if t > 0 else float("inf")
        print(f"{label:26s} {t*1e6:8.2f}   {fl/1e6:9.1f}M   {tf:6.1f} TF/s  "
              f"{tf/V5E_BF16_TFLOPS*100:4.1f}%")
        if n:
            d_t, d_fl = t - prev[mode][0], fl - prev[mode][1]
            rows.append((label, d_t, d_fl))
            prev[mode] = (t, fl)
    print("\nper-stage increments (vs same-variant prefix):")
    for label, d_t, d_fl in rows:
        if d_t > 0:
            tf = d_fl / d_t / 1e12
            print(f"{label:26s} +{d_t*1e6:7.2f} us/frame  +{d_fl/1e6:8.1f}M "
                  f"FLOPs  {tf:6.1f} TF/s ({tf/V5E_BF16_TFLOPS*100:.1f}% MFU)")


if __name__ == "__main__":
    main()
