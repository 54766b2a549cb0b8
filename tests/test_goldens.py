"""Self-golden regression snapshots.

Frozen summary statistics of tiny-model outputs under fixed seeds. These
catch unintended semantic changes to the model math across refactors
(weight-port fidelity proxy until real checkpoints are available — SURVEY §4
strategy item 2). If a change is INTENTIONAL, regenerate with:

    python -m tests.test_goldens regen
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.diffusion import latent_image_ids
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from tests.test_models import TINY_FLUX, TINY_UNET, TINY_VAE

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")


def _fingerprint(x):
    x = np.asarray(x, np.float64)
    return {
        "mean": float(x.mean()),
        "std": float(x.std()),
        "absmax": float(np.abs(x).max()),
        "corner": [float(v) for v in x.flat[:4]],
    }


def _compute_all():
    out = {}
    vp = V.init_vae(jax.random.key(0), TINY_VAE)
    x = jnp.tanh(jax.random.normal(jax.random.key(1), (1, 32, 32, 3)))
    z = jax.jit(lambda p, x: V.vae_encode(p, TINY_VAE, x, rng=None))(vp, x)
    out["vae_encode"] = _fingerprint(z)
    out["vae_decode"] = _fingerprint(jax.jit(lambda p, z: V.vae_decode(p, TINY_VAE, z))(vp, z))

    up = U.init_unet(jax.random.key(2), TINY_UNET)
    ctx = jax.random.normal(jax.random.key(3), (1, 7, 16))
    lat = jax.random.normal(jax.random.key(4), (1, 16, 16, 4))
    out["unet"] = _fingerprint(jax.jit(lambda p, l, c: U.unet_apply(p, TINY_UNET, l, 273, c))(up, lat, ctx))

    fp = F.init_flux(jax.random.key(5), TINY_FLUX)
    tok = jax.random.normal(jax.random.key(6), (1, 16, 64))
    fctx = jax.random.normal(jax.random.key(7), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(8), (1, 8))
    flux_fn = jax.jit(
        lambda p, t, c, pl: F.flux_apply(
            p, TINY_FLUX, t, 0.5, 1.0, pl, c, jnp.zeros((5, 3)), latent_image_ids(4, 4)
        )
    )
    out["flux"] = _fingerprint(flux_fn(fp, tok, fctx, pooled))
    return out


def test_model_outputs_match_goldens():
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    current = _compute_all()
    for name, want in goldens.items():
        got = current[name]
        # tolerances sized for semantic drift, above cross-platform noise
        for k in ("mean", "std", "absmax"):
            np.testing.assert_allclose(
                got[k], want[k], rtol=5e-3, atol=1e-4,
                err_msg=f"{name}.{k} drifted — intentional? regen goldens",
            )
        np.testing.assert_allclose(got["corner"], want["corner"], rtol=2e-2, atol=1e-3, err_msg=name)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        jax.config.update("jax_platforms", "cpu")
        with open(GOLDEN_PATH, "w") as f:
            json.dump(_compute_all(), f, indent=2)
        print(f"wrote {GOLDEN_PATH}")
