#!/bin/bash
# Round-5 regeneration of the 40k reference-recipe soak (the round-4 final
# checkpoint lived in /tmp and was lost between rounds; the SSIM north star
# needs the real trained weights). Same config as evidence/soak_40k:
# b20 bf16 256², ckpt every 2000, SIGTERM drill at 50% (phase_a kills at
# 20000), resume to 40000. Persistent XLA compile cache on so the hostile
# b20 shape hits the primed cache instead of its 223-492 s cold compile.
set -u
cd /root/repo
export FNST_SOAK_STEPS=40000 FNST_SOAK_BATCH=20 FNST_SOAK_CKPT_EVERY=2000
export JAX_COMPILATION_CACHE_DIR=/root/.cache/fnst_jax_cache
OUT=${1:-/tmp/soak40k_r5}
python tools/soak.py phase_a "$OUT"
python tools/soak.py phase_b "$OUT"
python tools/soak.py report "$OUT" | tee "$OUT/report.json"
