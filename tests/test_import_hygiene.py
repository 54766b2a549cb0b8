"""Import hygiene: no omgsr_tpu module may initialize the device backend at
import time.

A module-level jnp constant (e.g. `jnp.asarray(...)` at top level) forces
jax's backend initialization during `import omgsr_tpu.X`. On this
environment the default backend is a remote TPU tunnel, so an import-time
init (a) hangs every CLI — including `--help` — whenever the tunnel is
down, and (b) pins the platform before a caller can
`jax.config.update("jax_platforms", "cpu")`. The convention is numpy at
module level, jnp at use (CLAUDE.md).

Runs in a subprocess because the running pytest process has long since
initialized its own (CPU) backend.
"""

import subprocess
import sys

_PROBE = r"""
import sys
import jax
import jax._src.xla_bridge as xb

def _boom(*a, **k):
    raise RuntimeError("BACKEND INITIALIZED AT IMPORT TIME")

xb.backends = _boom
if hasattr(xb, "get_backend"):
    xb.get_backend = _boom

import pkgutil, importlib
import omgsr_tpu

bad = []
mods = [m.name for m in pkgutil.walk_packages(omgsr_tpu.__path__, "omgsr_tpu.")]
mods.append("omgsr_tpu.hub")
for name in sorted(set(mods)):
    try:
        importlib.import_module(name)
    except RuntimeError as e:
        if "IMPORT TIME" in str(e):
            bad.append(name)
    except Exception:
        pass  # unrelated import issues are other tests' business
print("BAD:" + ",".join(bad))
sys.exit(1 if bad else 0)
"""


def test_no_backend_init_at_import_time():
    r = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, f"import-time backend init in: {r.stdout}\n{r.stderr[-800:]}"
