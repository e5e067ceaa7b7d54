#!/usr/bin/env bash
# Full-curriculum dress rehearsal: the reference's stage1->stage2->stage3
# workflow (reference README.md:37-55, 100+50+20 epochs) at reduced scale
# (60+25+12 epochs, hr 128) on synthetic faces, end to end through the
# production CLIs — data prep, three chained training runs, the stage
# overview figure, and the model-vs-baseline comparison table.
#
# Usage:   bash scripts/dress_rehearsal.sh [workdir]
# Output:  $WORK/ckpt_s{1,2,3}/best_model.fckpt, $WORK/stages_plot/,
#          $WORK/comparison/
# On axon: PYTHONPATH=/root/.axon_site:/root/repo bash scripts/dress_rehearsal.sh
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p "${1:-/tmp/rehearsal}"
WORK="$(cd "${1:-/tmp/rehearsal}" && pwd)"   # absolute: configs embed it

# The checked-in rehearsal configs chain stages via YAML `resume:` paths
# (weights-only stage chaining — CLI --resume has full-resume semantics and
# is NOT a substitute). Rewrite every /tmp/rehearsal path to $WORK in a
# generated copy so a custom workdir chains from ITS OWN checkpoints.
CFG="$WORK/configs"
mkdir -p "$CFG"
# escape sed-replacement metacharacters (& = matched text, \ = escape, | =
# our delimiter) so a workdir containing them can't silently corrupt the
# generated configs
WORK_ESC=$(printf '%s' "$WORK" | sed 's/[&\\|]/\\&/g')
for f in stage1_psnr stage2_ssim stage3_gan; do
    sed "s|/tmp/rehearsal|$WORK_ESC|g" "configs/rehearsal/$f.yaml" > "$CFG/$f.yaml"
done
# test hook: stop after generating configs (path plumbing is gated by
# tests/test_scripts_e2e.py without running the multi-hour curriculum)
if [ "${REHEARSAL_SETUP_ONLY:-0}" = 1 ]; then
    echo "setup-only: configs generated in $CFG"
    exit 0
fi

echo "== [1/6] synthetic faces =="
python scripts/make_synthetic_faces.py --output "$WORK/raw" --num 608 --size 160 --seed 0

echo "== [2/6] prepare (hr 128 / lr 32, bicubic, hdf5) =="
python -m facesr.data.prepare_data --input "$WORK/raw" --output "$WORK/processed" \
    --hr-size 128 --lr-size 32 --hdf5 --train-ratio 0.84 --val-ratio 0.08

echo "== [3/6] stage 1: PSNR (60 epochs) =="
python scripts/train.py --config "$CFG/stage1_psnr.yaml" --no-wandb --yes

echo "== [4/6] stage 2: +SSIM (25 epochs, chained from stage-1 best) =="
python scripts/train.py --config "$CFG/stage2_ssim.yaml" --no-wandb --yes

echo "== [5/6] stage 3: GAN (12 epochs, chained from stage-2 best) =="
python scripts/train.py --config "$CFG/stage3_gan.yaml" --no-wandb --yes

echo "== [6/6] stage overview + comparison =="
python scripts/plot_training_stages.py \
    --stage1 "$WORK/ckpt_s1/best_model.fckpt" \
    --stage2 "$WORK/ckpt_s2/best_model.fckpt" \
    --stage3 "$WORK/ckpt_s3/best_model.fckpt" \
    --output "$WORK/stages_plot"
mkdir -p "$WORK/best_all"
cp "$WORK/ckpt_s1/best_model.fckpt" "$WORK/best_all/stage1_psnr.fckpt"
cp "$WORK/ckpt_s2/best_model.fckpt" "$WORK/best_all/stage2_ssim.fckpt"
cp "$WORK/ckpt_s3/best_model.fckpt" "$WORK/best_all/stage3_gan.fckpt"
python scripts/compare_two_models.py --checkpoint-dir "$WORK/best_all" \
    --test-dir "$WORK/processed/test/HR" --output "$WORK/comparison" \
    --num-images 32 --batch-size 8 --save-every 8
# qualitative GAN-stage evidence: eye/mouth crops, stage2 vs stage3
# (LPIPS/FID columns in the comparison above activate automatically when
# $FACESR_LPIPS_WEIGHTS / $FACESR_INCEPTION_WEIGHTS point at converted
# real weights)
python scripts/stage_panel.py \
    --checkpoints "$WORK/ckpt_s2/best_model.fckpt" "$WORK/ckpt_s3/best_model.fckpt" \
    --labels stage2_ssim stage3_gan \
    --test-dir "$WORK/processed/test/HR" --output "$WORK/panel" --num-images 4

echo "Dress rehearsal complete: $WORK"
