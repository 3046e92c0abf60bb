#!/bin/bash
# Round-5 chip program: regenerate the 40k reference-recipe soak and score
# the SSIM north star on its REAL final checkpoint.
#
# Why again: the round-4 40k final lived in /tmp and was wiped between
# rounds; the round-5 first session restarted it but the session ended with
# the run still in /tmp (only an interim 889-step checkpoint was scored —
# evidence/ssim_r5/interim_889.json). This run writes to /root/repo/.runs
# (untracked but on the persistent volume) and curates results into
# evidence/ssim_r5 + evidence/soak40k_r5 as soon as they exist.
#
# Stages (each artifact-gated so a re-run resumes where it left off):
#   1. wait for the tunneled TPU backend (cold init can exceed 300 s)
#   2. synthesize the content set (same generator as evidence/soak_40k)
#   3. 40k-step b20 bf16 soak with SIGTERM drill at 20000 + resume
#      (phase_b re-tried so a transient backend outage resumes from the
#      latest Orbax checkpoint instead of losing the run)
#   4. export final params to reference-layout .pth
#   5. fnst-parity: reference's own StyleTransferNet (CPU torch) vs our
#      stylizer on the same trained weights -> SSIM JSON
#   6. curate into evidence/ (checkpoints stay out of git per .gitignore)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/fnst_jax_cache
OUT=/root/repo/.runs/soak40k_r5
mkdir -p "$OUT"

echo "[r5] start $(date +%H:%M:%S)"
for i in $(seq 1 60); do
  echo "[r5] TPU wait attempt $i $(date +%H:%M:%S)"
  if timeout -k 30 900 python -c "import jax; assert jax.devices()[0].platform == 'tpu'; print('TPU READY')"; then
    break
  fi
  sleep 120
done

[ -f /tmp/soak_ds/img0399.jpg ] || python tools/soak.py dataset /tmp/soak_ds 400

export FNST_SOAK_STEPS=40000 FNST_SOAK_BATCH=20 FNST_SOAK_CKPT_EVERY=2000
FINAL=$OUT/style_transfer_final.npz
# NOTE the completion gate is the metrics max step, NOT the final-artifact
# file: the trainer's graceful SIGTERM drain also writes
# style_transfer_final.npz (drain = checkpoint + final artifact), so a
# file gate mistakes the 50% drill drain for a finished run (that is
# exactly what happened on this script's first run; tools/chip_program_r5b.sh
# resumed it).
max_step() {
  python - <<'PYEOF'
import json, os
m = 0
p = '/root/repo/.runs/soak40k_r5/metrics.jsonl'
if os.path.exists(p):
    for l in open(p):
        try:
            m = max(m, json.loads(l).get('step', 0))
        except ValueError:
            pass
print(m)
PYEOF
}
if [ "$(max_step)" -lt 40000 ]; then
  if [ ! -f "$OUT/soak_config.json" ]; then
    python tools/soak.py phase_a "$OUT"
  fi
  # phase_b resumes from the latest checkpoint; retry through transient
  # backend outages until the run reaches total_steps (max ~6h of attempts).
  for i in $(seq 1 12); do
    [ "$(max_step)" -ge 40000 ] && break
    echo "[r5] phase_b attempt $i $(date +%H:%M:%S) (at step $(max_step))"
    python tools/soak.py phase_b "$OUT"
    sleep 60
  done
fi
python tools/soak.py report "$OUT" | tee "$OUT/report.json"

python -m fast_neural_style_transfer_tpu.export.cli \
  --model "$FINAL" --pth "$OUT/style_transfer_final.pth"

mkdir -p evidence/ssim_r5
python -m fast_neural_style_transfer_tpu.cli.parity \
  --reference_pth "$OUT/style_transfer_final.pth" \
  --content /root/reference/dancing.jpg \
  --output_dir evidence/ssim_r5 > evidence/ssim_r5/final_40k.json
cat evidence/ssim_r5/final_40k.json

# curate the soak evidence (metrics + report + monitor samples + final .pth;
# the Orbax chain itself stays in .runs)
EV=evidence/soak40k_r5
mkdir -p "$EV"
cp "$OUT/report.json" "$OUT/soak_config.json" "$OUT/metrics.jsonl" "$EV/" 2>/dev/null
cp "$OUT"/sample_step_40000.jpg "$OUT"/sample_step_20000.jpg "$OUT"/sample_step_1000.jpg "$EV/" 2>/dev/null
cp "$OUT/style_transfer_final.pth" "$EV/" 2>/dev/null
ls -l "$EV"
echo "[r5] done $(date +%H:%M:%S)"
