#!/bin/bash
# Round-4 chip measurement runbook: run top-to-bottom when the axon relay
# is healthy (poll: timeout 60 python -c "import jax, jax.numpy as jnp;
# print(float(jnp.sum(jnp.ones((8,8)))))").  Each block is independent;
# results go to /tmp/r4_chip/*.log and then into docs/PERF.md round-4.
set -x
mkdir -p /tmp/r4_chip
cd "$(dirname "$0")/.."

# A. bench auto flow on the real chip (validates the emit-first logic,
#    populates the committed TPU compile cache for the driver's run)
timeout 1500 python bench.py > /tmp/r4_chip/bench_auto.log 2>&1

# B. FusionNet MFU: packed deconv1 at full-frame widths (keep/drop)
RCFD_PACKED_DECONV1=1 RCFD_BENCH_MODE=scan RCFD_BENCH_BATCHES=32 \
  timeout 1800 python bench.py --mode scan \
  > /tmp/r4_chip/bench_packed_deconv1.log 2>&1

# C. batch-64 re-sweep with the compile cache (r2 sweep was compile-bound)
RCFD_BENCH_MODE=scan RCFD_BENCH_BATCHES=64,48 timeout 1800 \
  python bench.py --mode scan > /tmp/r4_chip/bench_b64.log 2>&1

# D. pipeline bisect baseline + fused_pool2/pool4 with the take gather
timeout 1800 python tools/pipebisect.py --cuts rn full \
  > /tmp/r4_chip/pipebisect_base.log 2>&1
RCFD_FUSED_POOL2=1 timeout 1800 python tools/pipebisect.py --cuts rn full \
  > /tmp/r4_chip/pipebisect_fusedpool2_take.log 2>&1
RCFD_FUSED_POOL2=1 RCFD_FUSED_POOL2_GATHER=slice timeout 1800 \
  python tools/pipebisect.py --cuts rn \
  > /tmp/r4_chip/pipebisect_fusedpool2_slice.log 2>&1
RCFD_FUSED_POOL2=1 RCFD_FUSED_POOL4=1 timeout 1800 \
  python tools/pipebisect.py --cuts rn full \
  > /tmp/r4_chip/pipebisect_fusedpool24_take.log 2>&1

# E. loader-fed training throughput, real chip (canonical config crop)
timeout 1800 python tools/trainbench.py --n_devices 1 --model canonical \
  --height 448 --width 448 --batch_size 16 --n_steps 12 \
  > /tmp/r4_chip/trainbench_canonical.log 2>&1
RCFD_TRAIN_DTYPE=bfloat16 timeout 1800 python tools/trainbench.py \
  --n_devices 1 --model canonical --height 448 --width 448 \
  --batch_size 16 --n_steps 12 \
  > /tmp/r4_chip/trainbench_canonical_bf16.log 2>&1

grep -h '{' /tmp/r4_chip/*.log
