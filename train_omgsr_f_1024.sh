#!/usr/bin/env bash
# TPU counterpart of the reference's train_omgsr_f_1024.sh (2-GPU DDP via
# accelerate). Data parallelism comes from the mesh config; the 12B
# int8-frozen-base recipe needs ~20.3 GB and fits a {fsdp:2} v5e slice or a
# single v5p chip (see CLAUDE.md perf notes) — set mesh_shape accordingly.
# Relative path overrides resolve against YOUR cwd; the default config is
# pinned to the repo via $REPO_DIR.
set -euo pipefail
REPO_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"
python -m omgsr_tpu.cli.train_omgsr_f --config "$REPO_DIR/omgsr_tpu/configs/omgsr_f_1024.yml" "$@"
