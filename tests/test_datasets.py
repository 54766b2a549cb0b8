"""Benchmark dataset-format adapters (data/datasets.py) vs the reference's
layouts (dinov3/data/datasets/*): a disk fixture per format, byte/pixel
round-trips through the adapters, the dataset-string grammar, and the CLI
integration points (SSL loader / dinotxt pairs / eval folder loader)."""

import gzip
import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from omgsr_tpu.data.datasets import (
    ADE20KDataset,
    CocoCaptionsDataset,
    ImageNet22kDataset,
    ImageNetDataset,
    is_dataset_spec,
    make_dataset,
)


def _png_bytes(rng, h=24, w=32):
    im = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# ImageNet (entries-SPLIT.npy sidecars over a disk layout)
# ---------------------------------------------------------------------------


def _make_imagenet(tmp_path, rng):
    root = tmp_path / "in1k"
    for ci, cid in enumerate(["n01440764", "n01443537"]):
        d = root / "train" / cid
        d.mkdir(parents=True)
        for j in range(3):
            (d / f"{cid}_{10 * ci + j}.JPEG").write_bytes(_png_bytes(rng))
    for ci, cid in enumerate(["n01440764", "n01443537"]):
        d = root / "val" / cid
        d.mkdir(parents=True)
        (d / f"ILSVRC2012_val_{ci + 1:08d}.JPEG").write_bytes(_png_bytes(rng))
    (root / "labels.txt").write_text(
        "n01440764,tench\nn01443537,goldfish\n"
    )
    return str(root)


def test_imagenet_dump_and_read(tmp_path):
    rng = np.random.default_rng(0)
    root = _make_imagenet(tmp_path, rng)
    extra = str(tmp_path / "extra")
    for split, n in (("train", 6), ("val", 2)):
        ds = ImageNetDataset(root=root, extra=extra, split=split)
        ds.dump_extra()
        assert len(ds) == n
        assert ds.classes == ["n01440764", "n01443537"]
        img, target = ds[0]
        assert img.mode == "RGB" and target == 0
        assert ds.get_targets().tolist() == sorted(ds.get_targets().tolist())
    ds = ImageNetDataset(root=root, extra=extra, split="train")
    paths, labels, classes = ds.get_paths_labels()
    assert len(paths) == 6 and all(os.path.exists(p) for p in paths)
    assert labels.tolist() == [0, 0, 0, 1, 1, 1]
    # actual_index round-trips through the basename reconstruction
    assert paths[4].endswith("n01443537_11.JPEG")


# ---------------------------------------------------------------------------
# ImageNet-22k (per-class tarballs + blocks logs)
# ---------------------------------------------------------------------------


def _make_imagenet22k(tmp_path, rng):
    """Two class tarballs with 2-3 members each (one gzipped member to
    exercise the magic sniffing), plus the blocks/<cid>.log listings the
    sidecar builder consumes."""
    root = tmp_path / "in22k"
    (root / "blocks").mkdir(parents=True)
    originals = {}
    for cid in ["n00001", n2 := "n00002"]:
        members = []
        for j in range(3 if cid == n2 else 2):
            name = f"{cid}_{j}.JPEG"
            data = _png_bytes(rng)
            originals[name] = data
            if cid == n2 and j == 1:  # gzipped member (image_net_22k.py:214-218)
                data = gzip.compress(data)
            members.append((name, data))
        tar_path = root / f"{cid}.tar"
        with tarfile.open(tar_path, "w") as tf:
            for name, data in members:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        with tarfile.open(tar_path) as tf:
            infos = tf.getmembers()
        lines = [
            f"block {m.offset // 512}: {m.name}" for m in infos
        ]
        sentinel = infos[-1].offset_data + ((infos[-1].size + 511) // 512) * 512
        lines.append(f"block {sentinel // 512}: ** Block of NULs **")
        (root / "blocks" / f"{cid}.log").write_text("\n".join(lines) + "\n")
    return str(root), originals


def test_imagenet22k_dump_and_read(tmp_path):
    rng = np.random.default_rng(1)
    root, originals = _make_imagenet22k(tmp_path, rng)
    extra = str(tmp_path / "extra22k")
    ds = ImageNet22kDataset(root=root, extra=extra, mmap_cache_size=1)
    ds.dump_extra()
    assert len(ds) == 5
    assert ds.get_targets().tolist() == [0, 0, 1, 1, 1]
    assert ds.find_class_id(1) == "n00002"
    # every member (incl. the gzipped one) round-trips pixel-exact; the
    # 1-deep mmap cache is exercised by alternating classes
    for i in range(len(ds)):
        entry = ds.entries[i]
        want = Image.open(io.BytesIO(originals[str(entry["filename"])]))
        got, target = ds[i]
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want.convert("RGB"))
        )
        assert target == int(entry["class_index"])
    imgs, labels, classes = ds.get_paths_labels()
    assert len(imgs) == 5 and classes == ["n00001", "n00002"]
    assert imgs[2].size == (32, 24)  # lazy ImageView decodes PIL items
    ds.close()


# ---------------------------------------------------------------------------
# ADE20K
# ---------------------------------------------------------------------------


def test_ade20k_layout(tmp_path):
    rng = np.random.default_rng(2)
    root = tmp_path / "ade"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir()
    names = ["ADE_train_00000001.jpg", "ADE_train_00000002.jpg"]
    for n in names:
        (root / "images" / n).write_bytes(_png_bytes(rng))
        seg = Image.fromarray(
            rng.integers(0, 150, (24, 32), dtype=np.uint8), "L"
        )
        seg.save(root / "annotations" / (os.path.splitext(n)[0] + ".png"))
    (root / "ADE20K_object150_train.txt").write_text("\n".join(names) + "\n")
    ds = ADE20KDataset(root=str(root), split="train")
    assert len(ds) == 2
    img, target = ds[0]
    assert img.mode == "RGB" and img.size == (32, 24)
    assert target.mode == "L"  # dense target stays in native mode
    arr = ds.get_target_array(1)
    assert arr.shape == (24, 32) and arr.dtype == np.int32
    assert 0 <= arr.min() and arr.max() < 150


# ---------------------------------------------------------------------------
# COCO captions
# ---------------------------------------------------------------------------


def _make_coco(tmp_path, rng):
    root = tmp_path / "coco"
    img_dir = root / "train2014" / "train2014"
    img_dir.mkdir(parents=True)
    ann_dir = root / "annotations_trainval2014" / "annotations"
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    for i in range(3):
        fname = f"COCO_train2014_{i:012d}.jpg"
        (img_dir / fname).write_bytes(_png_bytes(rng))
        images.append({"id": 100 + i, "file_name": fname})
        for j in range(2):
            annotations.append(
                {"image_id": 100 + i, "caption": f"caption {i}-{j}"}
            )
    (ann_dir / "captions_train2014.json").write_text(
        json.dumps({"images": images, "annotations": annotations})
    )
    return str(root)


def test_coco_captions(tmp_path):
    rng = np.random.default_rng(3)
    root = _make_coco(tmp_path, rng)
    ds = CocoCaptionsDataset(root=root, split="train", seed=0)
    assert len(ds) == 3
    img, caption = ds[1]
    assert img.mode == "RGB"
    assert caption in ("caption 1-0", "caption 1-1")
    assert ds.get_captions(0) == ["caption 0-0", "caption 0-1"]
    # seeded draw is deterministic
    r1 = [ds.get_target(i, np.random.default_rng(7)) for i in range(3)]
    r2 = [ds.get_target(i, np.random.default_rng(7)) for i in range(3)]
    assert r1 == r2
    pairs = ds.get_pairs()
    assert len(pairs) == 3 and pairs[0][1] == ("caption 0-0", "caption 0-1")
    assert os.path.exists(pairs[0][0])


# ---------------------------------------------------------------------------
# grammar + CLI integration points
# ---------------------------------------------------------------------------


def test_dataset_str_grammar(tmp_path):
    rng = np.random.default_rng(4)
    root = _make_imagenet(tmp_path, rng)
    extra = str(tmp_path / "extra")
    ImageNetDataset(root=root, extra=extra, split="val").dump_extra()
    ds = make_dataset(f"ImageNet:split=VAL:root={root}:extra={extra}")
    assert isinstance(ds, ImageNetDataset) and len(ds) == 2
    assert is_dataset_spec(f"ImageNet22k:root={root}:extra={extra}")
    assert not is_dataset_spec("/data/images")  # plain paths stay paths
    assert not is_dataset_spec(["a", "b"])
    with pytest.raises(ValueError):
        make_dataset("FooSet:root=/x")
    with pytest.raises(ValueError):
        make_dataset(f"ImageNet:bogus={root}")


def test_eval_folder_loader_accepts_specs(tmp_path):
    from omgsr_tpu.cli.eval_dinov3 import load_imagefolder

    rng = np.random.default_rng(5)
    root = _make_imagenet(tmp_path, rng)
    extra = str(tmp_path / "extra")
    ImageNetDataset(root=root, extra=extra, split="train").dump_extra()
    paths, labels, classes = load_imagefolder(
        f"ImageNet:split=TRAIN:root={root}:extra={extra}"
    )
    assert len(paths) == 6 and classes == ["n01440764", "n01443537"]
    with pytest.raises(ValueError):
        load_imagefolder(f"ADE20K:split=TRAIN:root={root}")


def test_dinotxt_pairs_accept_coco_spec(tmp_path):
    from omgsr_tpu.cli.train_dinotxt import list_caption_pairs

    rng = np.random.default_rng(6)
    root = _make_coco(tmp_path, rng)
    pairs = list_caption_pairs(f"CocoCaptions:split=TRAIN:root={root}")
    assert len(pairs) == 3 and isinstance(pairs[0][1], tuple)


def test_ssl_images_accept_in22k_spec(tmp_path):
    from omgsr_tpu.cli.pretrain_dinov3 import list_ssl_images

    rng = np.random.default_rng(7)
    root, _ = _make_imagenet22k(tmp_path, rng)
    extra = str(tmp_path / "extra22k")
    ImageNet22kDataset(root=root, extra=extra).dump_extra()
    imgs = list_ssl_images(f"ImageNet22k:root={root}:extra={extra}")
    assert len(imgs) == 5 and imgs[0].mode == "RGB"


def test_ssl_pretrain_e2e_on_in22k_tarballs(tmp_path):
    """The SSL loop trains directly off the tar-block layout — the
    adapter's PIL items flow through the multi-crop augmentation."""
    from omgsr_tpu.cli.pretrain_dinov3 import SSLPretrainConfig, run_pretraining

    rng = np.random.default_rng(8)
    root, _ = _make_imagenet22k(tmp_path, rng)
    extra = str(tmp_path / "extra22k")
    ImageNet22kDataset(root=root, extra=extra).dump_extra()
    cfg = SSLPretrainConfig(
        output_dir=str(tmp_path / "out"),
        dataset_paths=f"ImageNet22k:root={root}:extra={extra}",
        batch_size_per_device=1,
        official_epoch_length=2,
        epochs=1,
        warmup_epochs=0,
        warmup_teacher_temp_epochs=1,
        freeze_last_layer_epochs=0,
        saveckp_freq=5,
        print_freq=1,
        arch="custom",
        global_crops_size=32,
        local_crops_size=16,
        local_crops_number=2,
        dino_out_dim=32,
        dino_hidden_dim=16,
        dino_bottleneck_dim=8,
        dino_nlayers=2,
        ibot_out_dim=32,
        ibot_hidden_dim=16,
        ibot_bottleneck_dim=8,
        ibot_nlayers=2,
        extra={"vit": {"embed_dim": 16, "depth": 1, "num_heads": 2, "patch_size": 8}},
    )
    out = run_pretraining(cfg)
    assert out is not None


def test_imagenet22k_mmap_cache_is_lru(tmp_path):
    """Re-insert-on-access + evict-front = true LRU: interleaving two hot
    classes against a 2-deep cache must never evict each other, while a
    third class evicts the stalest (regression: popitem() evicted MRU)."""
    rng = np.random.default_rng(20)
    root, _ = _make_imagenet22k(tmp_path, rng)
    extra = str(tmp_path / "extra22k")
    ds = ImageNet22kDataset(root=root, extra=extra, mmap_cache_size=2)
    ds.dump_extra()
    # indices 0,1 -> n00001; 2,3,4 -> n00002
    ds.get_image_data(0)
    m1 = ds._mmaps["n00001"]
    ds.get_image_data(2)
    m2 = ds._mmaps["n00002"]
    for i in (0, 2, 1, 3):  # interleave the two hot classes
        ds.get_image_data(i)
    assert ds._mmaps["n00001"] is m1 and ds._mmaps["n00002"] is m2  # no churn
    # a third class must evict the least-recently-used (n00001 after idx 3)
    data = _png_bytes(rng)
    with tarfile.open(os.path.join(root, "n00003.tar"), "w") as tf:
        info = tarfile.TarInfo("n00003_0.JPEG")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    ds._read_member("n00003", 0, 1)
    assert "n00001" not in ds._mmaps  # LRU gone
    assert ds._mmaps["n00002"] is m2  # MRU retained
    ds.close()


def test_imagenet_test_split_has_no_labels(tmp_path):
    rng = np.random.default_rng(21)
    root = tmp_path / "in1k"
    d = root / "test"
    d.mkdir(parents=True)
    (d / "ILSVRC2012_test_00000001.JPEG").write_bytes(_png_bytes(rng))
    ds = ImageNetDataset(root=str(root), extra=str(tmp_path / "x"), split="test")
    ds.dump_extra()
    assert len(ds) == 1 and ds.get_target(0) is None
    with pytest.raises(ValueError, match="no labels"):
        ds.get_paths_labels()
