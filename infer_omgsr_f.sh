#!/usr/bin/env bash
# TPU counterpart of the reference's top-level infer_omgsr_f.sh
# (/root/reference/infer_omgsr_f.sh). Add `--quantize int8_w8a8` to serve the
# 12B DiT on a single 16 GB chip, `--shard tiles|tp|fsdp` on a multi-chip
# slice. Relative path overrides resolve against YOUR cwd, like the reference
# scripts; the defaults below are pinned to the repo via $REPO_DIR.
set -euo pipefail
REPO_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"
python -m omgsr_tpu.cli.infer_omgsr_f \
    --input_image "$REPO_DIR/my_tests" \
    --output_dir "$REPO_DIR/experiments_omgsr_f" \
    --flux_path "$REPO_DIR/checkpoints/FLUX.1-dev" \
    --lora_path "$REPO_DIR/adapters/omgsr-f-1024-adapter" \
    --process_size 1024 \
    --upscale 4 \
    --mid_timestep 244 \
    --align_method adain \
    "$@"
