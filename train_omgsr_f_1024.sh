#!/usr/bin/env bash
# TPU counterpart of the reference's train_omgsr_f_1024.sh (2-GPU DDP via
# accelerate). Data parallelism comes from the mesh config; the 12B
# int8-frozen-base recipe needs ~20.3 GB and fits a {fsdp:2} v5e slice or a
# single v5p chip (see CLAUDE.md perf notes) — set mesh_shape accordingly.
set -euo pipefail
cd "$(dirname "$0")"
python -m omgsr_tpu.cli.train_omgsr_f --config ./omgsr_tpu/configs/omgsr_f_1024.yml "$@"
