#!/bin/bash
# Pending hardware measurements queued during the 2026-08-18 TPU-tunnel
# outage. Run on a recovered tunnel; each step logs to /tmp/hw_r4/.
# Order: cheapest signal first, so a flaky tunnel still yields data.
set -x
mkdir -p /tmp/hw_r4
cd "$(dirname "$0")/.."

# 0) sanity: one matmul through the tunnel
timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); print(float(jnp.sum(x@x.T)), jax.devices())" \
  2>&1 | tail -2 | tee /tmp/hw_r4/0_sanity.log || exit 1

# 1) headline decode bench (driver contract)
timeout 1800 python bench.py 2>&1 | tee /tmp/hw_r4/1_bench.log

# 2) fuse_ups A/B — the r4b vocoder fusion (flip the default if it wins)
timeout 3600 python tools/vocoder_poly_bench.py 512 2048 3 base,pallas_all,fuse_ups \
  2>&1 | tee /tmp/hw_r4/2_fuse_ups_ab.log

# 2b) edge-mask variants (r4c) — SEPARATE invocation: the lax.cond doubles
# the kernel body and may trip the Mosaic compile ceiling; a crash here
# must not lose the step-2 data
timeout 3600 python tools/vocoder_poly_bench.py 512 2048 3 pallas_edge,fuse_edge \
  2>&1 | tee /tmp/hw_r4/2b_edge_mask.log

# 3) serving micro-batch A/B (bucketing + RF margin landed since r4a)
timeout 3600 python tools/server_bench.py 16 256 2 2>&1 | tee /tmp/hw_r4/3_server.log

# 4) full hardware smoke (train->say->int8->test, ~10 min)
timeout 3600 python tools/tpu_smoke.py 2>&1 | tail -30 | tee /tmp/hw_r4/4_smoke.log
