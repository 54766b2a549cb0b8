"""Multi-PROCESS distributed-bootstrap check (VERDICT r4 #3).

The reference's default launch is multi-process DDP (`accelerate launch
--num_processes=4`, train_omgsr_s_512.sh:2-7). The TPU-native equivalent is
`omgsr_tpu.parallel.distributed.initialize` (jax.distributed) + a mesh that
spans processes — previously only the single-process no-op branch was ever
executed. This tool launches N real OS processes, bootstraps them through
the PRODUCTION initialize() path (gloo CPU collectives), runs ONE tiny -S
LoRA-GAN train step with the batch sharded across the process-spanning
{data: N} mesh, and compares metrics + updated-parameter fingerprints
against the single-process step on the same global batch.

    python tools/multiproc_check.py [--nprocs 2]   # parent: spawn + compare

Exit 0 = multi-process step matches single-process within fp-reduction
tolerance. Used by tests/test_multiprocess.py (heavy).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RES = 64
BATCH = 2


def _build(mesh=None):
    """Deterministic tiny TrainerS (identical on every process) + batch."""
    import jax

    from tests.test_trainer import _batch, _build_trainer_s

    tr = _build_trainer_s()
    batch = {k: np.asarray(v, np.float32) for k, v in _batch(res=RES, b=BATCH).items()}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))

        def put(x, sh):
            # make_array_from_callback assembles GLOBAL arrays from
            # (identical) host values — device_put refuses non-addressable
            # multi-process shardings on this jax version
            x = np.asarray(jax.device_get(x))
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        # the locally-initialized trees are committed to each process's own
        # local device; rebuild them as replicated global arrays (identical
        # across processes by construction: same seeds, same platform)
        tr.state = jax.tree.map(lambda x: put(x, repl), tr.state)
        # frozen mixes arrays with static leaves (config dataclasses, the
        # DISTS channel list) — only arrays become replicated global arrays
        tr.frozen = jax.tree.map(
            lambda x: put(x, repl) if hasattr(x, "ndim") else x, tr.frozen
        )
        batch = {k: put(v, data) for k, v in batch.items()}
        key = put(jax.random.PRNGKey(0), repl)
    else:
        key = jax.random.PRNGKey(0)
    return tr, batch, key


def _fingerprint(tr, metrics):
    import jax

    lora_leaves = jax.tree.leaves(tr.state["gen"]["lora"])
    return {
        "metrics": {k: float(v) for k, v in metrics.items()},
        "lora_abs_sum": float(sum(np.abs(np.asarray(x, np.float64)).sum() for x in lora_leaves)),
        "lora_n": len(lora_leaves),
    }


def run_single(out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    tr, batch, key = _build()
    metrics, _ = tr.train_step(batch, key)
    with open(out_path, "w") as f:
        json.dump(_fingerprint(tr, metrics), f)


def run_worker(out_path: str, coordinator: str, nprocs: int, pid: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    # PRODUCTION bootstrap path (parallel/distributed.py) — the thing this
    # check exists to exercise with num_processes > 1
    from omgsr_tpu.parallel.distributed import initialize, is_main_process

    initialize(coordinator_address=coordinator, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs * jax.local_device_count()

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("data",))
    tr, batch, key = _build(mesh)
    metrics, _ = tr.train_step(batch, key)
    if is_main_process():
        with open(out_path, "w") as f:
            json.dump(_fingerprint(tr, metrics), f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--role", choices=["parent", "single", "worker"], default="parent")
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--workdir", default="/tmp/omgsr_multiproc")
    args = p.parse_args(argv)

    if args.role == "single":
        return run_single(args.out)
    if args.role == "worker":
        return run_worker(args.out, args.coordinator, args.nprocs, args.pid)

    os.makedirs(args.workdir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")

    def spawn(extra):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + extra, env=env, cwd=REPO
        )

    single_out = os.path.join(args.workdir, "single.json")
    multi_out = os.path.join(args.workdir, "multi.json")
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [spawn(["--role", "single", "--out", single_out])]
    procs += [
        spawn([
            "--role", "worker", "--out", multi_out,
            "--coordinator", f"localhost:{port}",
            "--nprocs", str(args.nprocs), "--pid", str(i),
        ])
        for i in range(args.nprocs)
    ]
    rcs = [q.wait() for q in procs]
    if any(rcs):
        raise SystemExit(f"subprocess rcs {rcs}")

    with open(single_out) as f:
        single = json.load(f)
    with open(multi_out) as f:
        multi = json.load(f)
    ok = single["lora_n"] == multi["lora_n"]
    for k, v in single["metrics"].items():
        m = multi["metrics"][k]
        # different psum/reduction order across 2 processes vs 1: fp-level
        # differences only (same tolerance as the virtual-mesh DP test)
        if not np.isclose(v, m, rtol=2e-3, atol=2e-3):
            print(f"MISMATCH {k}: single {v} vs multi {m}")
            ok = False
    if not np.isclose(single["lora_abs_sum"], multi["lora_abs_sum"], rtol=2e-3):
        print(f"MISMATCH lora_abs_sum: {single['lora_abs_sum']} vs {multi['lora_abs_sum']}")
        ok = False
    print(json.dumps({
        "nprocs": args.nprocs, "match": ok,
        "single": single["metrics"], "multi": multi["metrics"],
    }))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
