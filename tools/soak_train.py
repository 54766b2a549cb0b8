"""Recipe-scale training soak (VERDICT r4 #1).

Proves what the reference validates only observationally over its 6k-step
run (train/train_omgsr_s.py:438-532): hundreds of steps of stable LoRA-GAN
dynamics on-chip — decreasing G losses, bounded D loss, finite grad norms,
no NaN — plus a mid-soak SIGKILL + resume whose curves continue seamlessly
(the reference's resume is a TODO stub, train/train_omgsr_s.py:394-419).

Three roles, orchestrated by the default parent role:

  prep   (subprocess, CPU backend) — fabricate structured synthetic HQ
         images and push them through the PRODUCTION degradation pipeline
         (data.degradation.RealESRGANDegrader via data.dataset.PairedLoader)
         into precomputed (lq, hq) PNG pairs. Pairs are precomputed because
         each distinct degradation plan structure costs a ~134 s remote
         compile through the TPU tunnel (CLAUDE.md); on a co-located host
         the live loader has ~20x headroom over the train step.
  child  (subprocess, TPU) — drives the PRODUCTION training loop
         (cli.train_omgsr_{s,f}.run_training) over the precomputed pairs,
         emitting per-optimizer-step metrics JSONL.
  parent — runs prep, launches the child, SIGKILLs it at --kill_at, then
         relaunches with resume_from_checkpoint=latest to --steps; crash
         retries (tunnel transients) also resume from the latest
         checkpoint. Finally analyzes the stitched curves and writes
         SOAK_REPORT.md (+ loss_curves.png), exiting nonzero on failure.

Usage:
  python tools/soak_train.py --family s    --steps 500 --kill_at 260
  python tools/soak_train.py --family f12b --steps 50  --kill_at 32
  python tools/soak_train.py --family tiny --steps 6   --kill_at 3   # CPU test
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# synthetic HQ image fabrication (prep role)
# --------------------------------------------------------------------------

def synth_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """Structured synthetic HQ image in [0,1]: smooth sinusoid fields +
    solid shapes + fine texture, so DISTS/L1/GAN have real structure to
    learn (pure noise images would make the SR objective degenerate)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij")
    img = np.zeros((size, size, 3), np.float32)
    for c in range(3):
        acc = np.zeros((size, size), np.float32)
        for _ in range(4):
            fx, fy = rng.uniform(0.5, 8, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            acc += rng.uniform(0.1, 0.5) * np.sin(2 * np.pi * (fx * xx + ph[0])) * np.sin(
                2 * np.pi * (fy * yy + ph[1])
            )
        img[..., c] = acc
    # solid shapes: rectangles and discs with random colors
    for _ in range(int(rng.integers(4, 10))):
        color = rng.uniform(-1, 1, 3).astype(np.float32)
        cy, cx = rng.uniform(0.1, 0.9, 2)
        if rng.uniform() < 0.5:
            r = rng.uniform(0.03, 0.2)
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        else:
            hh, ww = rng.uniform(0.05, 0.3, 2)
            mask = (np.abs(yy - cy) < hh) & (np.abs(xx - cx) < ww)
        img[mask] = img[mask] * 0.3 + color * 0.7
    # fine high-frequency texture (what SR must hallucinate back)
    img += rng.normal(0, 0.05, img.shape).astype(np.float32)
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
    return img


def run_prep(args):
    """CPU-backend subprocess: fabricate HQ images, degrade through the
    production pipeline, write (lq, hq) PNG pairs."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize ignores env
    import yaml
    from PIL import Image

    from omgsr_tpu.data.dataset import PairedDataset, PairedLoader
    from omgsr_tpu.data.degradation import RealESRGANDegrader

    res = args.resolution
    rng = np.random.default_rng(args.seed)
    hq_dir = os.path.join(args.workdir, "hq_images")
    pair_dir = os.path.join(args.workdir, "pairs")
    os.makedirs(hq_dir, exist_ok=True)
    os.makedirs(pair_dir, exist_ok=True)
    n_images = max(args.n_pairs // 2, 8)
    src = res + res // 4  # crop variety
    for i in range(n_images):
        Image.fromarray((synth_image(rng, src) * 255).astype(np.uint8)).save(
            os.path.join(hq_dir, f"synth-{i:04d}.png")
        )

    with open(os.path.join(REPO, "omgsr_tpu/configs/params_realesrgan.yml")) as f:
        opt = yaml.safe_load(f)
    degrader = RealESRGANDegrader(opt, resolution=res, seed=args.seed)
    dataset = PairedDataset([hq_dir], res, seed=args.seed)
    loader = PairedLoader(dataset, 1, degrader, seed=args.seed, drop_last=False)
    n = 0
    while n < args.n_pairs:
        for batch in loader:
            lq = (np.asarray(batch["lq"][0], np.float32) * 0.5 + 0.5).clip(0, 1)
            hq = (np.asarray(batch["hq"][0], np.float32) * 0.5 + 0.5).clip(0, 1)
            Image.fromarray((lq * 255).round().astype(np.uint8)).save(
                os.path.join(pair_dir, f"lq-{n:04d}.png")
            )
            Image.fromarray((hq * 255).round().astype(np.uint8)).save(
                os.path.join(pair_dir, f"hq-{n:04d}.png")
            )
            n += 1
            if n >= args.n_pairs:
                break
    print(f"prep: {n_images} HQ sources -> {n} degraded pairs at {res}px in {pair_dir}")


# --------------------------------------------------------------------------
# precomputed-pair loader (child role)
# --------------------------------------------------------------------------

class PairDirLoader:
    """Yields {"lq","hq"} numpy batches in [-1,1] from prep's PNG pairs,
    shuffled per epoch. Epoch order is a function of (seed, epoch index) so
    resumed runs see a fresh-but-deterministic stream."""

    def __init__(self, pair_dir: str, batch_size: int, seed: int = 0):
        from PIL import Image

        self._Image = Image
        self.lq_paths = sorted(glob.glob(os.path.join(pair_dir, "lq-*.png")))
        assert self.lq_paths, f"no pairs in {pair_dir}"
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return len(self.lq_paths) // self.batch_size

    def _load(self, path):
        return np.asarray(self._Image.open(path), np.float32) / 127.5 - 1.0

    @staticmethod
    def _hq_path(lq_path):
        # swap the prefix on the basename only — an "lq-" substring in the
        # workdir path must not be rewritten
        d, b = os.path.split(lq_path)
        return os.path.join(d, "hq-" + b[len("lq-"):])

    def __iter__(self):
        order = np.random.default_rng(self.seed + self.epoch).permutation(len(self.lq_paths))
        self.epoch += 1
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idxs = order[i : i + self.batch_size]
            yield {
                "lq": np.stack([self._load(self.lq_paths[j]) for j in idxs]),
                "hq": np.stack(
                    [self._load(self._hq_path(self.lq_paths[j])) for j in idxs]
                ),
            }


# --------------------------------------------------------------------------
# child role: production run_training over the precomputed pairs
# --------------------------------------------------------------------------

def _base_cfg(args, launch_idx: int):
    from omgsr_tpu.config import TrainConfig

    return TrainConfig(
        output_dir=os.path.join(args.workdir, "run"),
        max_train_steps=args.steps,
        checkpointing_steps=args.ckpt_every,
        save_img_steps=max(args.steps // 5, 1),
        resume_from_checkpoint="latest" if launch_idx > 0 else None,
        extra={
            "metrics_jsonl": os.path.join(args.workdir, f"metrics_{launch_idx}.jsonl"),
            "disc_channels": None,  # set by family builders
        },
    )


def _arm_self_kill(jsonl_path: str, kill_at: int):
    """Deterministic mid-train hard death: a daemon thread polls this child's
    OWN metrics stream every 50 ms and SIGKILLs the process once `kill_at` is
    logged. The parent's 2 s poll is only a backstop — on a fast (CPU drill)
    run the child could otherwise finish inside one parent poll window and the
    soak would silently skip its kill/resume validation."""
    import threading

    def watch():
        while True:
            if _jsonl_last_step(jsonl_path) >= kill_at:
                os.kill(os.getpid(), signal.SIGKILL)
            time.sleep(0.05)

    threading.Thread(target=watch, daemon=True, name="soak-self-kill").start()


def run_child(args):
    import jax
    import jax.numpy as jnp

    if args.family == "tiny":
        jax.config.update("jax_platforms", "cpu")
    # the parent passes kill_at=0 once the planned kill has happened, so any
    # pre-kill launch (including crash retries) arms the watchdog
    if args.kill_at and args.kill_at < args.steps:
        _arm_self_kill(
            os.path.join(args.workdir, f"metrics_{args.launch_idx}.jsonl"),
            args.kill_at,
        )
    from omgsr_tpu.losses.discriminator import init_discriminator
    from omgsr_tpu.losses.dists import init_dists
    from omgsr_tpu.models import convnext as CN
    from omgsr_tpu.models.configs import CONVNEXT_SIZES

    if args.family != "tiny":
        # persistent cache makes the resumed launch's recompile cheap; OFF on
        # CPU — remote-compiled AOT artifacts can SIGILL this host (conftest)
        from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

        enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    cfg = _base_cfg(args, args.launch_idx)
    dtype = jnp.bfloat16

    if args.family in ("s", "tiny"):
        from omgsr_tpu.cli.train_omgsr_s import run_training
        from omgsr_tpu.models import unet_sd as U
        from omgsr_tpu.models import vae as V

        if args.family == "s":
            # full SD2.1 architecture, fabricated (random) weights — the
            # recipe: configs/omgsr_s_512.yml (accum 4, lr 5e-5, warmup 500)
            from omgsr_tpu.models.configs import SD21_UNET, SD21_VAE

            vae_cfg, unet_cfg, cn_cfg = SD21_VAE, SD21_UNET, CONVNEXT_SIZES["large"]
            cfg.gradient_checkpointing = True
            ctx_dim, ctx_len, res = unet_cfg.cross_attention_dim, 77, 512
            disc_kw = {}
        else:
            from tests.test_models import TINY_UNET, TINY_VAE
            from tests.test_trainer import TINY_CN, TINY_HEADS

            vae_cfg, unet_cfg, cn_cfg = TINY_VAE, TINY_UNET, TINY_CN
            cfg.gradient_accumulation_steps = 1
            cfg.lr_warmup_steps = 0
            cfg.learning_rate = 1e-3
            ctx_dim, ctx_len, res = 16, 7, 64
            disc_kw = {"configs": TINY_HEADS}
        cfg.resolution = res
        kk = jax.random.split(jax.random.key(args.seed), 4)
        vp = V.init_vae(kk[0], vae_cfg, dtype=dtype)
        up = U.init_unet(kk[1], unet_cfg, dtype=dtype)
        bp = CN.init_convnext(kk[2], cn_cfg, dtype=dtype)
        frozen = {
            "vae": vp, "vae_cfg": vae_cfg, "unet": up, "unet_cfg": unet_cfg,
            "backbone": bp, "dists": init_dists(bp, cn_cfg.dims),
            "prompt_embeds": jnp.asarray(rng.normal(size=(1, ctx_len, ctx_dim)), dtype),
        }
        cfg.extra["disc_channels"] = list(cn_cfg.dims[:3])
        if disc_kw:
            disc_bundle = init_discriminator(kk[3], cn_cfg.dims[:3], **disc_kw)
        else:
            disc_bundle = init_discriminator(kk[3], cn_cfg.dims[:3], cfg.resolution)
        loader = PairDirLoader(
            os.path.join(args.workdir, "pairs"), cfg.train_batch_size, seed=args.seed
        )
        run_training(cfg, frozen=frozen, loader=loader, disc_bundle=disc_bundle)
    elif args.family == "f12b":
        # FULL 12B FLUX, int4 nibble-packed frozen base — the single-v5e
        # train fit (CLAUDE.md r4). accum 1 so "step" == one G/D update.
        from omgsr_tpu.cli.train_omgsr_f import run_training as run_training_f
        from omgsr_tpu.models import vae as V
        from omgsr_tpu.models.configs import FLUX_DEV, FLUX_VAE
        from omgsr_tpu.utils.quantize import init_flux_int8

        cfg.model = "omgsr_f_1024"
        cfg.mid_timestep = 244
        cfg.resolution = 1024
        cfg.gradient_checkpointing = True
        cfg.gradient_accumulation_steps = 1
        cfg.lr_warmup_steps = 0
        cfg.learning_rate = 1e-4
        cfg.quantize_base = "int4"
        kk = jax.random.split(jax.random.key(args.seed), 3)
        flux_q = init_flux_int8(
            kk[0], FLUX_DEV, block_dtype=dtype, repeat_blocks=True, bits=4
        )
        fvp = V.init_vae(kk[1], FLUX_VAE, dtype=dtype)
        cn_cfg = CONVNEXT_SIZES["large"]
        bp = CN.init_convnext(kk[2], cn_cfg, dtype=dtype)
        frozen = {
            "vae": fvp, "vae_cfg": FLUX_VAE, "flux": flux_q, "flux_cfg": FLUX_DEV,
            "backbone": bp, "dists": init_dists(bp, cn_cfg.dims),
            "prompt_embeds": jnp.asarray(rng.normal(size=(1, 512, 4096)), dtype),
            "pooled_prompt_embeds": jnp.asarray(rng.normal(size=(1, 768)), dtype),
        }
        cfg.extra["disc_channels"] = list(cn_cfg.dims[:3])
        loader = PairDirLoader(
            os.path.join(args.workdir, "pairs"), cfg.train_batch_size, seed=args.seed
        )
        run_training_f(cfg, frozen=frozen, loader=loader)
    else:
        raise ValueError(args.family)


# --------------------------------------------------------------------------
# parent role: orchestration + analysis
# --------------------------------------------------------------------------

def _spawn(role: str, args, launch_idx: int = 0, kill_at=None) -> subprocess.Popen:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--role", role,
        "--family", args.family, "--workdir", args.workdir,
        "--steps", str(args.steps),
        "--kill_at", str(args.kill_at if kill_at is None else kill_at),
        "--ckpt_every", str(args.ckpt_every), "--n_pairs", str(args.n_pairs),
        "--resolution", str(args.resolution), "--seed", str(args.seed),
        "--launch_idx", str(launch_idx),
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return subprocess.Popen(cmd, env=env, cwd=REPO)


def _jsonl_last_step(path: str) -> int:
    if not os.path.exists(path):
        return -1
    last = -1
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    last = json.loads(line)["step"]
                except (json.JSONDecodeError, KeyError):
                    pass
    return last


def _read_jsonl(path: str) -> list[dict]:
    out = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    return out


def analyze(args, launches: list[dict]) -> tuple[bool, str]:
    """Stitch per-launch metric streams, run the soak pass/fail criteria,
    render SOAK_REPORT.md + loss_curves.png. Returns (ok, report_path)."""
    records = []  # (launch_idx, rec)
    for li in range(len(launches)):
        for rec in _read_jsonl(os.path.join(args.workdir, f"metrics_{li}.jsonl")):
            records.append((li, rec))
    assert records, "no metrics recorded"
    loss_keys = [k for k in records[0][1] if k.startswith(("loss_", "grad_norm_"))]

    checks = []

    def check(name, ok, detail):
        checks.append((name, bool(ok), detail))
        return ok

    # 0. the abrupt-death + resume path actually ran: when a kill is
    # configured, a soak that completed in one launch validated nothing
    if args.kill_at and args.kill_at < args.steps:
        check(
            "kill_resume_exercised",
            any(l["reason"].startswith("planned SIGKILL") for l in launches)
            and len(launches) >= 2,
            f"launch reasons: {[l['reason'] for l in launches]}",
        )

    # 1. finiteness everywhere
    bad = [
        (li, r["step"], k)
        for li, r in records
        for k in loss_keys
        if not np.isfinite(r.get(k, np.nan))
    ]
    check("all_finite", not bad, f"{len(bad)} non-finite values" if bad else
          f"{len(records)} steps x {len(loss_keys)} metrics all finite")

    # effective (stitched) trajectory: later launches override earlier steps
    by_step = {}
    for li, r in records:
        by_step[r["step"]] = r
    steps = sorted(by_step)
    traj = [by_step[s] for s in steps]
    n = len(traj)
    head = max(n // 10, 3)

    def series(k):
        return np.array([r[k] for r in traj], np.float64)

    # 2. G losses decrease (first vs last decile + OLS slope)
    for k in ("loss_total_G", "loss_LRR"):
        v = series(k)
        first, last = v[:head].mean(), v[-head:].mean()
        slope = np.polyfit(steps, v, 1)[0]
        check(
            f"{k}_decreases", last < first,
            f"first {head}: {first:.4f} -> last {head}: {last:.4f} (slope {slope:.2e}/step)",
        )

    # 3. D loss bounded (no collapse/divergence)
    d = series("loss_total_D")
    med = float(np.median(d))
    check(
        "loss_D_bounded", d.max() < max(10 * med, 1e-3) and med < 20.0,
        f"median {med:.4f}, max {d.max():.4f}, min {d.min():.4f}",
    )

    # 4. grad norms sane
    for k in ("grad_norm_G", "grad_norm_D"):
        g = series(k)
        check(f"{k}_sane", np.isfinite(g).all() and g.max() < 1e4,
              f"median {np.median(g):.3f}, max {g.max():.3f}")

    # 5. resume continuity at every relaunch boundary: the resumed launch
    # re-runs steps already logged by its predecessor (checkpoint rewind);
    # same-step G-loss means must agree within GAN noise
    for li in range(1, len(launches)):
        cur = [r for l, r in records if l == li]
        prev = [r for l, r in records if l < li]
        if not cur:
            continue
        r0 = cur[0]["step"]
        win = [r for r in cur[: args.resume_window]]
        prev_same = [r for r in prev if r0 <= r["step"] < r0 + len(win)]
        if not prev_same:
            check(f"resume_{li}_continuous", False, f"no overlap at step {r0}")
            continue
        a = np.mean([r["loss_total_G"] for r in prev_same])
        b = np.mean([r["loss_total_G"] for r in win])
        ratio = b / max(a, 1e-9)
        check(
            f"resume_{li}_continuous", 0.4 < ratio < 2.5,
            f"resumed at step {r0} (after {launches[li - 1]['reason']}); "
            f"same-step G-loss mean {a:.4f} (pre) vs {b:.4f} (post), "
            f"ratio {ratio:.3f}",
        )

    ok = all(c[1] for c in checks)

    # curves png
    png = os.path.join(args.workdir, "loss_curves.png")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(12, 8))
        panels = [
            (["loss_total_G", "loss_LRR", "loss_Dv3D"], axes[0][0], "G losses"),
            (["loss_total_D", "loss_D_fake", "loss_D_real"], axes[0][1], "D losses"),
            (["loss_L1", "loss_G"], axes[1][0], "L1 + GAN-G"),
            (["grad_norm_G", "grad_norm_D"], axes[1][1], "grad norms (pre-clip)"),
        ]
        for keys, ax, title in panels:
            for li in range(len(launches)):
                xs = [r["step"] for l, r in records if l == li]
                for k in keys:
                    ys = [r[k] for l, r in records if l == li]
                    ax.plot(xs, ys, label=k if li == 0 else None, alpha=0.8)
            for li in range(1, len(launches)):
                cur = [r for l, r in records if l == li]
                if cur:
                    ax.axvline(cur[0]["step"], color="k", ls="--", lw=0.8)
            ax.set_title(title)
            ax.set_xlabel("optimizer step")
            ax.legend(fontsize=7)
        fig.suptitle(f"soak --family {args.family}: {n} effective steps, "
                     f"{len(launches)} launches (dashed = resume)")
        fig.tight_layout()
        fig.savefig(png, dpi=110)
    except Exception as e:  # plotting is best-effort
        png = None
        print(f"plotting failed: {e}")

    sps = np.median([r["s_per_step"] for _, r in records[-max(n // 2, 1):]])
    report = os.path.join(args.workdir, "SOAK_REPORT.md")
    with open(report, "w") as f:
        f.write(f"# Training soak report — family {args.family}\n\n")
        f.write(f"- platform: {launches[0].get('platform', '?')}\n")
        f.write(f"- effective optimizer steps: {n} (target {args.steps}); "
                f"launches: {len(launches)}\n")
        for li, l in enumerate(launches):
            f.write(f"  - launch {li}: {l['reason']}, rc={l['rc']}, "
                    f"last step {l['last_step']}, wall {l['wall_s']:.0f}s\n")
        f.write(f"- median s/step (steady state): {sps:.3f}\n")
        f.write(f"- data: {args.n_pairs} precomputed Real-ESRGAN pairs at "
                f"{args.resolution}px (production degradation pipeline, CPU prep)\n\n")
        f.write("| check | pass | detail |\n|---|---|---|\n")
        for name, passed, detail in checks:
            f.write(f"| {name} | {'PASS' if passed else '**FAIL**'} | {detail} |\n")
        f.write("\n## Final-state metric summary\n\n| metric | first 10% | last 10% |\n|---|---|---|\n")
        for k in loss_keys:
            v = series(k)
            f.write(f"| {k} | {v[:head].mean():.4f} | {v[-head:].mean():.4f} |\n")
        if png:
            f.write("\n![loss curves](loss_curves.png)\n")
        f.write(f"\nverdict: **{'PASS' if ok else 'FAIL'}**\n")
    print(open(report).read())
    return ok, report


def run_parent(args):
    os.makedirs(args.workdir, exist_ok=True)
    pair_dir = os.path.join(args.workdir, "pairs")
    if len(glob.glob(os.path.join(pair_dir, "lq-*.png"))) < args.n_pairs:
        print("== prep: fabricating synthetic pairs (CPU backend) ==")
        p = _spawn("prep", args)
        rc = p.wait()
        if rc != 0:
            raise SystemExit(f"prep failed rc={rc}")

    # a reused workdir keeps its (expensive) pairs but must not keep metric
    # streams or checkpoints: stale metrics would trip the self-kill watchdog
    # instantly and satisfy the cross-launch progress check with a false PASS
    stale = glob.glob(os.path.join(args.workdir, "metrics_*.jsonl"))
    run_dir = os.path.join(args.workdir, "run")
    if stale or os.path.isdir(run_dir):
        import shutil

        print("== clearing stale soak state (metrics_*.jsonl, run/) ==")
        for p in stale:
            os.remove(p)
        shutil.rmtree(run_dir, ignore_errors=True)

    launches = []
    launch_idx = 0
    killed_once = False
    best_step = -1
    clean_noprogress = 0
    while True:
        jsonl = os.path.join(args.workdir, f"metrics_{launch_idx}.jsonl")
        t0 = time.time()
        print(f"== launch {launch_idx}: child to step {args.steps} "
              f"({'resume' if launch_idx else 'fresh'}) ==")
        child = _spawn("child", args, launch_idx,
                       kill_at=0 if killed_once else None)
        planned_kill = False
        while child.poll() is None:
            time.sleep(2.0)
            if (
                not killed_once
                and args.kill_at
                and args.kill_at < args.steps
                and _jsonl_last_step(jsonl) >= args.kill_at
            ):
                print(f"== SIGKILL child at step {_jsonl_last_step(jsonl)} "
                      f"(planned kill_at={args.kill_at}) ==")
                child.send_signal(signal.SIGKILL)
                planned_kill = True
                killed_once = True
                child.wait()
                break
        rc = child.returncode
        last = _jsonl_last_step(jsonl)
        if (
            not planned_kill
            and not killed_once
            and rc == -signal.SIGKILL
            and args.kill_at
            and args.kill_at < args.steps
            and last >= args.kill_at
        ):
            # the in-child watchdog (_arm_self_kill) fired before our poll did
            planned_kill = True
            killed_once = True
        launches.append({
            "reason": "planned SIGKILL" if planned_kill
            else ("clean exit" if rc == 0 else f"crash rc={rc}"),
            "rc": rc, "last_step": last, "wall_s": time.time() - t0,
            "platform": "tpu" if args.family != "tiny" else "cpu",
        })
        prev_best = best_step
        best_step = max(best_step, last)
        if rc == 0 and best_step >= args.steps:
            # a resumed child whose checkpoint is already at the target runs
            # zero steps and logs nothing — judge progress across ALL
            # launches, not just this one's metrics file
            break
        if rc == 0 and last <= prev_best:
            clean_noprogress += 1
            if clean_noprogress > args.max_retries:
                print("== repeated clean exits without progress, giving up ==")
                break
        if not planned_kill and rc != 0:
            if len(launches) > args.max_retries + (1 if killed_once else 0) + 1:
                print("== too many crashes, giving up ==")
                break
        launch_idx += 1

    ok, report = analyze(args, launches)
    if args.report_out:
        import shutil

        os.makedirs(os.path.dirname(args.report_out) or ".", exist_ok=True)
        shutil.copy(report, args.report_out)
        png = os.path.join(args.workdir, "loss_curves.png")
        if os.path.exists(png):
            shutil.copy(png, os.path.join(
                os.path.dirname(args.report_out) or ".",
                os.path.basename(args.report_out).replace(".md", "_curves.png"),
            ))
    raise SystemExit(0 if ok else 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--role", choices=["parent", "prep", "child"], default="parent")
    p.add_argument("--family", choices=["s", "f12b", "tiny"], default="s")
    p.add_argument("--workdir", default="/tmp/omgsr_soak")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--kill_at", type=int, default=260,
                   help="optimizer step at which the parent SIGKILLs the child; 0 disables")
    p.add_argument("--ckpt_every", type=int, default=50)
    p.add_argument("--n_pairs", type=int, default=64)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--launch_idx", type=int, default=0)
    p.add_argument("--max_retries", type=int, default=3)
    p.add_argument("--resume_window", type=int, default=15)
    p.add_argument("--report_out", default=None,
                   help="copy the final SOAK_REPORT.md (+curves png) here")
    args = p.parse_args(argv)
    if args.family == "f12b":
        args.resolution = 1024
    if args.family == "tiny":
        args.resolution = 64
    if args.role == "prep":
        run_prep(args)
    elif args.role == "child":
        run_child(args)
    else:
        run_parent(args)


if __name__ == "__main__":
    main()
