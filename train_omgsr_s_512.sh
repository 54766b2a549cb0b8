#!/usr/bin/env bash
# TPU counterpart of the reference's train_omgsr_s_512.sh. The reference
# launches 4-GPU DDP via `accelerate launch`; here data parallelism comes
# from the mesh config — every chip jax sees joins the "data" axis
# (mesh_shape in the YAML / `mesh_shape="data:4"` override). On a multi-host
# pod, run this same command on every host (jax.distributed bootstraps from
# the TPU environment). Relative path overrides resolve against YOUR cwd;
# the default config is pinned to the repo via $REPO_DIR.
set -euo pipefail
REPO_DIR="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"
python -m omgsr_tpu.cli.train_omgsr_s --config "$REPO_DIR/omgsr_tpu/configs/omgsr_s_512.yml" "$@"
