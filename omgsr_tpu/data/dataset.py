"""Paired SR dataset: HQ images -> (lq, hq) training pairs.

Re-implements dataset/my_dataset.py: collects .png/.jpg/.jpeg from dirs or
.txt lists (:28-35), RandomCrop(pad_if_needed, reflect) + Resize +
RandomHorizontalFlip (:18-26), the FFHQ->512 LANCZOS special case (:43-44),
Real-ESRGAN degradation per item, both images normalized to [-1,1]
(:47-53).

TPU-first split: crop/flip run on host (PIL/numpy, cheap), the degradation
runs batched on device (RealESRGANDegrader). A background-thread prefetcher
overlaps host IO with device compute — the counterpart of the reference's
DataLoader(num_workers=8).
"""

from __future__ import annotations

import glob
import os
import queue
import threading

import numpy as np
from PIL import Image


def collect_paths(dataset_txt_or_dir_paths) -> list[str]:
    out = []
    for p in dataset_txt_or_dir_paths:
        if os.path.isdir(p):
            out.extend(
                glob.glob(f"{p}/*.png") + glob.glob(f"{p}/*.jpg") + glob.glob(f"{p}/*.jpeg")
            )
        elif os.path.splitext(p)[1] == ".txt":
            with open(p) as f:
                out.extend(line.strip() for line in f.readlines())
        else:
            raise ValueError(
                f"Unsupported path type: {p}. Expected either a directory or a file named 'txt'"
            )
    return out


def _random_crop_reflect(arr: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    """RandomCrop(size, pad_if_needed=True, padding_mode='reflect')."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        ph = max(0, size - h)
        pw = max(0, size - w)
        arr = np.pad(
            arr,
            ((ph // 2 + ph % 2, ph // 2), (pw // 2 + pw % 2, pw // 2), (0, 0)),
            mode="reflect",
        )
        h, w = arr.shape[:2]
    y = int(rng.integers(0, h - size + 1))
    x = int(rng.integers(0, w - size + 1))
    return arr[y : y + size, x : x + size]


class PairedDataset:
    """Index-able HQ-image dataset producing crop-preprocessed float arrays
    in [0,1]; degradation happens batched in the loader."""

    def __init__(self, dataset_txt_or_dir_paths, resolution: int, seed: int = 0):
        self.resolution = resolution
        self.gt_list = collect_paths(dataset_txt_or_dir_paths)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.gt_list)

    def __getitem__(self, idx: int) -> np.ndarray:
        path = self.gt_list[idx]
        arr8 = None
        if "ffhq" not in path or self.resolution != 512:
            from omgsr_tpu.data.imgdec_native import decode_rgb

            arr8 = decode_rgb(path)  # native libjpeg/libpng fast path
        if arr8 is not None:
            arr = arr8.astype(np.float32) / 255.0
        else:
            img = Image.open(path).convert("RGB")
            if "ffhq" in path and self.resolution == 512:
                img = img.resize((512, 512), Image.LANCZOS)
            arr = np.asarray(img, np.float32) / 255.0
        arr = _random_crop_reflect(arr, min(self.resolution, max(arr.shape[:2])), self.rng)
        if arr.shape[0] != self.resolution:
            img = Image.fromarray((arr * 255).astype(np.uint8)).resize(
                (self.resolution, self.resolution), Image.BILINEAR
            )
            arr = np.asarray(img, np.float32) / 255.0
        if self.rng.uniform() < 0.5:  # RandomHorizontalFlip
            arr = arr[:, ::-1]
        return np.ascontiguousarray(arr)


class PairedLoader:
    """Iterates (lq, hq) batches in [-1,1] NHWC with background prefetch.

    degrader: RealESRGANDegrader (device-side) or None for identity pairs.
    """

    def __init__(
        self,
        dataset: PairedDataset,
        batch_size: int,
        degrader=None,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.degrader = degrader
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.ds) // self.batch_size
        if not self.drop_last and len(self.ds) % self.batch_size:
            n += 1
        return n

    def _batches(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            idxs = order[i : i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield np.stack([self.ds[int(j)] for j in idxs])

    def _dispatch(self, hq: np.ndarray) -> dict:
        """Host batch [0,1] -> device (lq, hq) batch in [-1,1], dispatched
        asynchronously: nothing here blocks on device results, so the
        degradation of batch N+1 is enqueued while the consumer's train step
        for batch N is still executing (JAX async dispatch) and the arrays
        never round-trip through the host."""
        if self.degrader is not None:
            gt, lq = self.degrader(hq)
        else:
            gt = lq = hq
        import jax.numpy as jnp

        return {
            "lq": jnp.asarray(lq) * 2.0 - 1.0,
            "hq": jnp.asarray(gt) * 2.0 - 1.0,
        }

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            for hq in self._batches():
                q.put(hq)
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        # one-deep device pipeline: when the producer is ahead, dispatch the
        # next batch's degradation before yielding the previous one; when
        # the producer is the bottleneck (queue empty), yield immediately
        # instead of holding the ready batch hostage to the next disk load
        pending = None
        while True:
            if pending is not None:
                try:
                    hq = q.get_nowait()
                except queue.Empty:
                    yield pending
                    pending = None
                    hq = q.get()
            else:
                hq = q.get()
            if hq is stop:
                if pending is not None:
                    yield pending
                return
            batch = self._dispatch(hq)
            if pending is not None:
                yield pending
            pending = batch
