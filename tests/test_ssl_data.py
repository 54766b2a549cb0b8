"""SSL data pipeline (data/ssl.py) vs the vendored DINOv3 data infra
(dinov3/data/{masking,collate,samplers,augmentations}.py): exact parity
where the reference is numpy-deterministic (EpochSampler), semantic parity
elsewhere (block masks, collate layout, infinite samplers, multi-crop)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
from PIL import Image

from omgsr_tpu.data.ssl import (
    BlockMaskingGenerator,
    EpochSampler,
    InfiniteSampler,
    MultiCropAugmentation,
    MultiCropConfig,
    ShardedInfiniteSampler,
    collate_ssl_batch,
    color_jitter,
    random_resized_crop,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"


def _load_ref_samplers():
    # samplers.py imports `from dinov3.distributed import get_rank, ...` —
    # stub that package so the module loads standalone, and RESTORE
    # sys.modules afterwards (a lingering non-package "dinov3" stub breaks
    # test_ssl_losses's real `dinov3.loss` package import in-process; the
    # loaded module keeps its references to the stubbed functions).
    fake = types.ModuleType("dinov3.distributed")
    fake.get_rank = lambda: 0
    fake.get_world_size = lambda: 1
    saved = {k: sys.modules.get(k) for k in ("dinov3", "dinov3.distributed")}
    sys.modules.setdefault("dinov3", types.ModuleType("dinov3"))
    sys.modules["dinov3.distributed"] = fake
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_samplers", f"{REF_ROOT}/dinov3/data/samplers.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


# ---------------------------------------------------------------------------
# masking
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("requested", [0, 1, 37, 90])
def test_block_mask_exact_count(requested):
    gen = BlockMaskingGenerator((10, 10))
    rng = np.random.default_rng(requested)
    mask = gen(rng, requested)
    assert mask.shape == (10, 10) and mask.dtype == bool
    assert int(mask.sum()) == requested


def test_block_mask_has_block_structure():
    # with a large request the mask must contain at least one filled
    # rectangle rather than pure salt-and-pepper: check the painted area
    # has adjacent pairs (salt-and-pepper from the top-up alone would make
    # adjacency ~p^2 * N; a painted block guarantees many adjacent pairs)
    gen = BlockMaskingGenerator((14, 14))
    mask = gen(np.random.default_rng(0), 60)
    horiz = (mask[:, 1:] & mask[:, :-1]).sum()
    vert = (mask[1:, :] & mask[:-1, :]).sum()
    assert horiz + vert >= 20


# ---------------------------------------------------------------------------
# collate
# ---------------------------------------------------------------------------


def _fake_samples(b, n_global=2, n_local=4, gs=8, ls=4):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(b):
        g = [rng.normal(size=(gs, gs, 3)).astype(np.float32) for _ in range(n_global)]
        out.append(
            {
                "global_crops": g,
                "global_crops_teacher": g,
                "local_crops": [
                    rng.normal(size=(ls, ls, 3)).astype(np.float32)
                    for _ in range(n_local)
                ],
            }
        )
    return out


def test_collate_layout_and_masks():
    samples = _fake_samples(3)
    gen = BlockMaskingGenerator((4, 4))
    batch = collate_ssl_batch(
        samples,
        np.random.default_rng(1),
        gen,
        mask_ratio_tuple=(0.2, 0.6),
        mask_probability=0.5,
    )
    assert batch["global_crops"].shape == (6, 8, 8, 3)
    assert batch["local_crops"].shape == (12, 4, 4, 3)
    # crop-major ordering (collate.py:24-27): row c*B+b is crop c of sample b
    np.testing.assert_array_equal(
        batch["global_crops"][1 * 3 + 2], samples[2]["global_crops"][1]
    )
    np.testing.assert_array_equal(
        batch["local_crops"][3 * 3 + 0], samples[0]["local_crops"][3]
    )
    # teacher shares student crops -> no duplicate stack
    assert "global_crops_teacher" not in batch
    # masks: int(6 * 0.5) = 3 masked samples, ramped ratios
    masks = batch["masks"]
    assert masks.shape == (6, 16) and masks.dtype == bool
    counts = masks.sum(-1)
    assert (counts > 0).sum() == 3
    assert int(batch["n_masked_patches"]) == int(counts.sum())
    # weights: 1/count on masked rows, zero elsewhere, rows sum to 1
    w = batch["masks_weight"]
    np.testing.assert_allclose(w.sum(-1)[counts > 0], 1.0, rtol=1e-6)
    assert (w[~masks] == 0).all()


def test_collate_mask_ratio_ramp():
    # masked sample sizes follow linspace(ratios)[1:] (collate.py:43-49)
    samples = _fake_samples(4)
    gen = BlockMaskingGenerator((6, 6))
    batch = collate_ssl_batch(
        samples,
        np.random.default_rng(2),
        gen,
        mask_ratio_tuple=(0.1, 0.5),
        mask_probability=1.0,
    )
    counts = sorted(batch["masks"].sum(-1).tolist())
    expected = sorted(int(36 * p) for p in np.linspace(0.1, 0.5, 9)[1:])
    assert counts == expected


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def test_epoch_sampler_matches_reference_exactly():
    ref = _load_ref_samplers()
    for epoch in (0, 1, 3):
        for start, step in ((0, 1), (1, 3)):
            theirs = ref.EpochSampler(
                size=23, sample_count=10, shuffle=True, seed=5, start=start, step=step
            )
            theirs.set_epoch(epoch)
            ours = EpochSampler(
                size=23, sample_count=10, shuffle=True, seed=5, start=start, step=step
            )
            ours.set_epoch(epoch)
            assert list(ours) == list(theirs)
            assert len(ours) == len(theirs)


@pytest.mark.parametrize("cls", [InfiniteSampler, ShardedInfiniteSampler])
def test_infinite_sampler_shards_are_disjoint_and_cover(cls):
    import itertools

    n, world = 12, 3
    per_pass = n // world
    streams = [
        list(
            itertools.islice(
                iter(cls(sample_count=n, shuffle=True, seed=7, start=r, step=world)),
                per_pass,
            )
        )
        for r in range(world)
    ]
    flat = sorted(sum(streams, []))
    assert flat == sorted(set(flat))  # disjoint
    assert set(flat) <= set(range(n))
    assert len(flat) == world * per_pass
    two_pass = list(
        itertools.islice(
            iter(cls(sample_count=n, shuffle=True, seed=7, start=0, step=world)),
            2 * per_pass,
        )
    )
    if cls is ShardedInfiniteSampler:
        # sharded: the shard CONTENT is pinned by the global permutation,
        # each pass only reshuffles it (samplers.py:203-229)
        assert sorted(two_pass[:per_pass]) == sorted(two_pass[per_pass:])
        assert two_pass[:per_pass] != two_pass[per_pass:]
    else:
        # plain infinite: a fresh full permutation per pass, so the rank's
        # slice differs in content between passes (samplers.py:112-123)
        assert len(set(two_pass[per_pass:])) == per_pass


@pytest.mark.parametrize("cls", [InfiniteSampler, ShardedInfiniteSampler])
def test_infinite_sampler_advance_resumes(cls):
    import itertools

    kw = dict(sample_count=10, shuffle=True, seed=3, start=0, step=2)
    full = list(itertools.islice(iter(cls(**kw)), 17))
    resumed = list(itertools.islice(iter(cls(**kw, advance=9)), 8))
    assert resumed == full[9:]


# ---------------------------------------------------------------------------
# multi-crop augmentation
# ---------------------------------------------------------------------------


def _toy_image():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8))


def test_multicrop_shapes_and_normalization():
    cfg = MultiCropConfig(
        global_crops_size=32, local_crops_size=16, local_crops_number=5
    )
    aug = MultiCropAugmentation(cfg)
    out = aug(np.random.default_rng(0), _toy_image())
    assert len(out["global_crops"]) == 2
    assert len(out["local_crops"]) == 5
    assert out["global_crops"][0].shape == (32, 32, 3)
    assert out["local_crops"][0].shape == (16, 16, 3)
    assert out["global_crops_teacher"] is out["global_crops"]
    # ImageNet normalization: uint8 range maps inside ~[-2.2, 2.7]
    g = np.stack(out["global_crops"])
    assert g.dtype == np.float32 and -3 < g.min() and g.max() < 3


def test_multicrop_deterministic_from_seed():
    cfg = MultiCropConfig(global_crops_size=24, local_crops_size=12, local_crops_number=2)
    aug = MultiCropAugmentation(cfg)
    a = aug(np.random.default_rng(42), _toy_image())
    b = aug(np.random.default_rng(42), _toy_image())
    for k in ("global_crops", "local_crops"):
        for x, y in zip(a[k], b[k]):
            np.testing.assert_array_equal(x, y)


def test_multicrop_gram_crops_no_distortions():
    cfg = MultiCropConfig(
        global_crops_size=24,
        local_crops_size=12,
        local_crops_number=1,
        gram_teacher_crops_size=16,
        gram_teacher_no_distortions=True,
        teacher_no_color_jitter=True,
    )
    aug = MultiCropAugmentation(cfg)
    out = aug(np.random.default_rng(0), _toy_image())
    assert len(out["gram_teacher_crops"]) == 2
    assert out["gram_teacher_crops"][0].shape == (16, 16, 3)
    assert len(out["global_crops_teacher"]) == 2
    assert out["global_crops_teacher"][0].shape == (24, 24, 3)


def test_random_resized_crop_matches_torchvision_fallback_geometry():
    # the 10-attempt loop is stochastic; pin the deterministic fallback:
    # a 100x25 strip (ratio 4 > 4/3) center-crops to 33x25 at bicubic
    img = Image.fromarray(np.zeros((25, 100, 3), np.uint8))
    rng = np.random.default_rng(0)
    out = random_resized_crop(rng, img, 8, scale=(1e9, 1e9))  # force fallback
    assert out.size == (8, 8)


def test_color_jitter_identity_at_zero():
    img = _toy_image()
    out = color_jitter(np.random.default_rng(0), img, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
