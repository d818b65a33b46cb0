"""Decompose the HiFi-GAN vocoder cost (VERDICT r2 #6): per-stage
cumulative timings (upsample chain with and without the MRF resblocks) via
the honest slope protocol (two workload sizes cancel the tunnel transport),
plus an analytic FLOPs model -> achieved TFLOP/s and % of the v5e bf16
roofline per variant.

Usage: python tools/vocoder_decompose.py [frames1 frames2]   (default 512 2048)
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


def slope_time(fn, mel1, mel2, iters=7):
    f = jax.jit(fn)

    def t_of(mel):
        float(jnp.sum(f(mel)))  # warm/compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.sum(f(mel)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t1, t2 = t_of(mel1), t_of(mel2)
    return (t2 - t1) / (mel2.shape[1] - mel1.shape[1])  # s per mel frame


def main():
    frames = [int(x) for x in sys.argv[1:]] or [512, 2048]
    cfg = HiFiGANConfig()  # UNIVERSAL_V1 architecture
    model = HiFiGAN(cfg, Policy.from_string("bf16-mixed"))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mel1 = jnp.asarray(rng.standard_normal((1, frames[0], 80)).astype(np.float32))
    mel2 = jnp.asarray(rng.standard_normal((1, frames[1], 80)).astype(np.float32))

    print(f"variant                  us/frame   dFLOPs/frame  achieved    MFU")
    prev = {True: 0.0, False: 0.0}
    prev_fl = {True: 0, False: 0}
    rows = []
    for n in range(0, len(cfg.upsample_rates) + 1):
        for mrf in ((False, True) if n else (False,)):
            t = slope_time(
                lambda m, n=n, mrf=mrf: prefix_apply(model, params, m, n, mrf),
                mel1, mel2,
            )
            fl = flops_model(cfg, n, mrf)
            label = f"stages<={n} {'(+MRF)' if mrf else '(ups only)'}"
            tf = fl / t / 1e12 if t > 0 else float("inf")
            print(f"{label:24s} {t*1e6:8.2f}   {fl/1e6:9.1f}M   {tf:6.1f} TF/s  {tf/V5E_BF16_TFLOPS*100:4.1f}%")
            d_t = t - prev[mrf]
            d_fl = fl - prev_fl[mrf]
            rows.append((label, t, fl, d_t, d_fl))
            prev[mrf], prev_fl[mrf] = t, fl
            if n == 0:  # shared prefix baseline for both series
                prev[True], prev_fl[True] = t, fl
    print("\nper-stage increments (vs same-variant prefix):")
    for label, t, fl, d_t, d_fl in rows:
        if d_t > 0:
            tf = d_fl / d_t / 1e12
            print(f"{label:24s} +{d_t*1e6:7.2f} us/frame  +{d_fl/1e6:8.1f}M FLOPs  {tf:6.1f} TF/s ({tf/V5E_BF16_TFLOPS*100:.1f}% MFU)")


if __name__ == "__main__":
    main()
