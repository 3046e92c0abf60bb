#!/bin/bash
# Round-5 chip program, part B: resume the 40k soak from the 20000-step
# SIGTERM-drill drain to completion, then re-score the SSIM north star on
# the TRUE 40k final.
#
# Why a part B: the trainer's graceful SIGTERM drain writes
# style_transfer_final.npz (drain = checkpoint + final artifact), so part
# A's file-existence gate mistook the 20000-step drain for a finished run
# and skipped phase_b. The gate here is the metrics max step, not the file.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/fnst_jax_cache
OUT=/root/repo/.runs/soak40k_r5
TOTAL=$(python -c "import json;print(json.load(open('$OUT/soak_config.json'))['total_steps'])")

max_step() {
  python - <<'EOF'
import json
m = 0
for l in open('/root/repo/.runs/soak40k_r5/metrics.jsonl'):
    try:
        m = max(m, json.loads(l).get('step', 0))
    except ValueError:
        pass
print(m)
EOF
}

for i in $(seq 1 12); do
  [ "$(max_step)" -ge "$TOTAL" ] && break
  echo "[r5b] phase_b attempt $i $(date +%H:%M:%S) (at step $(max_step)/$TOTAL)"
  python tools/soak.py phase_b "$OUT"
  sleep 30
done

python tools/soak.py report "$OUT" | tee "$OUT/report.json"

python -m fast_neural_style_transfer_tpu.export.cli \
  --model "$OUT/style_transfer_final.npz" --pth "$OUT/style_transfer_final.pth"

mkdir -p evidence/ssim_r5
python -m fast_neural_style_transfer_tpu.cli.parity \
  --reference_pth "$OUT/style_transfer_final.pth" \
  --content /root/reference/dancing.jpg \
  --output_dir evidence/ssim_r5 > evidence/ssim_r5/final_40k.json
cat evidence/ssim_r5/final_40k.json

EV=evidence/soak40k_r5
mkdir -p "$EV"
cp "$OUT/report.json" "$OUT/soak_config.json" "$OUT/metrics.jsonl" "$EV/" 2>/dev/null
cp "$OUT"/sample_step_40000.jpg "$OUT"/sample_step_20000.jpg "$OUT"/sample_step_1000.jpg "$EV/" 2>/dev/null
cp "$OUT/style_transfer_final.pth" "$EV/" 2>/dev/null
ls -l "$EV"
echo "[r5b] done $(date +%H:%M:%S)"
