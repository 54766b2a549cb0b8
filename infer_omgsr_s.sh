#!/usr/bin/env bash
# TPU counterpart of the reference's top-level infer_omgsr_s.sh
# (/root/reference/infer_omgsr_s.sh): same flag surface, local safetensors
# path instead of an HF repo id (no network in this stack). Relative path
# overrides (e.g. `--input_image ./mine`) resolve against YOUR cwd, like the
# reference scripts; the defaults below are pinned to the repo via $REPO_DIR.
set -euo pipefail
REPO_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"
python -m omgsr_tpu.cli.infer_omgsr_s \
    --input_image "$REPO_DIR/my_tests" \
    --output_dir "$REPO_DIR/experiments_omgsr_s" \
    --sd_path "$REPO_DIR/checkpoints/stable-diffusion-2-1-base" \
    --lora_path "$REPO_DIR/adapters/omgsr-s-512-adapter" \
    --process_size 512 \
    --upscale 4 \
    --mid_timestep 273 \
    --align_method adain \
    "$@"
