#!/usr/bin/env bash
# TPU counterpart of the reference's top-level infer_omgsr_s.sh
# (/root/reference/infer_omgsr_s.sh): same flag surface, local safetensors
# path instead of an HF repo id (no network in this stack).
set -euo pipefail
cd "$(dirname "$0")"
python -m omgsr_tpu.cli.infer_omgsr_s \
    --input_image my_tests \
    --output_dir experiments_omgsr_s \
    --sd_path checkpoints/stable-diffusion-2-1-base \
    --lora_path adapters/omgsr-s-512-adapter \
    --process_size 512 \
    --upscale 4 \
    --mid_timestep 273 \
    --align_method adain \
    "$@"
