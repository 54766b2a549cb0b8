#!/usr/bin/env bash
# TPU counterpart of the reference's top-level infer_omgsr_f.sh
# (/root/reference/infer_omgsr_f.sh). Add `--quantize w8a8` to serve the 12B
# DiT on a single 16 GB chip, `--shard tiles|tp|fsdp` on a multi-chip slice.
set -euo pipefail
cd "$(dirname "$0")"
python -m omgsr_tpu.cli.infer_omgsr_f \
    --input_image my_tests \
    --output_dir experiments_omgsr_f \
    --flux_path checkpoints/FLUX.1-dev \
    --lora_path adapters/omgsr-f-1024-adapter \
    --process_size 1024 \
    --upscale 4 \
    --mid_timestep 244 \
    --align_method adain \
    "$@"
