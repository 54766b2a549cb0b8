#!/usr/bin/env bash
# TPU counterpart of the reference's train_omgsr_s_512.sh. The reference
# launches 4-GPU DDP via `accelerate launch`; here data parallelism comes
# from the mesh config — every chip jax sees joins the "data" axis
# (mesh_shape in the YAML / `mesh_shape="data:4"` override). On a multi-host
# pod, run this same command on every host (jax.distributed bootstraps from
# the TPU environment).
set -euo pipefail
cd "$(dirname "$0")"
python -m omgsr_tpu.cli.train_omgsr_s --config ./omgsr_tpu/configs/omgsr_s_512.yml "$@"
