"""Eval probes (eval/probes.py) vs the vendored DINOv3 eval suite: exact
k-NN parity vs knn.py KnnModule at world size 1; linear/logreg validated
by learning behavior (the reference heads are sklearn/torch train loops —
semantics, not bitwise, is the contract)."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.eval.probes import (
    create_linear_input,
    knn_classify,
    logistic_regression,
    make_eval_transform,
    scale_lr,
    sweep_logreg_C,
    train_linear_probes,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"


@pytest.fixture(scope="module")
def ref_knn_module():
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", rank=0, world_size=1, init_method="tcp://127.0.0.1:29783"
        )
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # knn.py drags in the dataset/metrics stack it only needs at call
    # time; stub those imports with permissive auto-attribute modules,
    # then load knn.py by file path. dinov3.distributed stays real (world
    # size 1 over the gloo group works, incl. gather_all_tensors).
    class _Anything:
        """Placeholder supporting arbitrary chained attribute access
        (e.g. ClassificationMetricType.MEAN_ACCURACY as a field default)."""

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Anything()

        def __call__(self, *a, **k):
            return _Anything()

        def __hash__(self):
            return 0

    class _Permissive(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Anything()

    for name in (
        "dinov3.data",
        "dinov3.data.adapters",
        "dinov3.data.transforms",
        "dinov3.eval.data",
        "dinov3.eval.helpers",
        "dinov3.eval.metrics",
        "dinov3.eval.setup",
        "dinov3.eval.utils",
        "dinov3.run.init",
        "dinov3.utils.dtype",
    ):
        sys.modules[name] = _Permissive(name)
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.MISSING = "???"
        sys.modules["omegaconf"] = oc
    import dinov3.distributed  # real one: world size 1 works

    spec = importlib.util.spec_from_file_location("ref_knn", f"{REF_ROOT}/dinov3/eval/knn.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.KnnModule


@pytest.mark.parametrize("skip_first_nn", [False, True])
def test_knn_matches_reference(ref_knn_module, skip_first_nn):
    rng = np.random.default_rng(0)
    train = rng.standard_normal((40, 8)).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    labels = rng.integers(0, 5, 40)
    test = rng.standard_normal((7, 8)).astype(np.float32)
    test /= np.linalg.norm(test, axis=1, keepdims=True)
    ks = (3, 10)
    knn = ref_knn_module(
        train_features=torch.from_numpy(train),
        train_labels=torch.from_numpy(labels),
        device="cpu",
        ks=list(ks),
        T=0.07,
        num_classes=5,
        skip_first_nn=skip_first_nn,
    )
    with torch.no_grad():
        want = knn(torch.from_numpy(test))
    got = knn_classify(
        jnp.asarray(train),
        jnp.asarray(labels),
        jnp.asarray(test),
        ks=ks,
        T=0.07,
        num_classes=5,
        skip_first_nn=skip_first_nn,
    )
    for k in ks:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-5, atol=1e-6
        )


def _blobs(n_per_class, d=6, classes=3, seed=0, spread=0.3):
    # class centers are FIXED across seeds so train/val share a distribution
    centers = np.random.default_rng(123).standard_normal((classes, d)) * 3
    rng = np.random.default_rng(seed)
    x = np.concatenate(
        [centers[c] + spread * rng.standard_normal((n_per_class, d)) for c in range(classes)]
    ).astype(np.float32)
    y = np.repeat(np.arange(classes), n_per_class)
    perm = rng.permutation(len(y))
    return x[perm], y[perm]


def test_linear_probe_grid_learns_and_selects():
    x, y = _blobs(40)
    xv, yv = _blobs(15, seed=1)
    res = train_linear_probes(
        jax.random.key(0), x, y, xv, yv,
        num_classes=3,
        learning_rates=(1e-4, 1e-2, 0.1),
        epochs=8,
        batch_size=16,
    )
    assert res.accuracies.shape == (3,)
    assert res.best_accuracy > 0.95
    # returned params reproduce the reported accuracy
    logits = xv @ res.params["kernel"] + res.params["bias"]
    acc = float((logits.argmax(-1) == yv).mean())
    np.testing.assert_allclose(acc, res.best_accuracy, atol=1e-6)


def test_create_linear_input_layout():
    b, n, d = 2, 4, 3
    blocks = [
        (jnp.full((b, n, d), i, jnp.float32), jnp.full((b, d), 10.0 + i, jnp.float32))
        for i in range(3)
    ]
    out = create_linear_input(blocks, use_n_blocks=2, use_avgpool=False)
    assert out.shape == (b, 2 * d)
    np.testing.assert_array_equal(np.asarray(out[0, :d]), 11.0)
    np.testing.assert_array_equal(np.asarray(out[0, d:]), 12.0)
    out2 = create_linear_input(blocks, use_n_blocks=1, use_avgpool=True)
    assert out2.shape == (b, 2 * d)
    np.testing.assert_array_equal(np.asarray(out2[0, d:]), 2.0)  # mean patch of last
    assert scale_lr(0.1, 512) == pytest.approx(0.2)


def test_logistic_regression_fits_sklearn_objective():
    x, y = _blobs(30)
    params = logistic_regression(x, y, num_classes=3, C=1.0, max_iters=150)
    logits = x @ np.asarray(params["kernel"]) + np.asarray(params["bias"])
    assert (logits.argmax(-1) == y).mean() > 0.95
    # the L2 penalty actually binds: huge C -> larger weights than tiny C
    p_small = logistic_regression(x, y, num_classes=3, C=1e-4, max_iters=150)
    assert np.linalg.norm(params["kernel"]) > np.linalg.norm(np.asarray(p_small["kernel"]))


def test_sweep_logreg_C_picks_reasonable_C():
    x, y = _blobs(30)
    xv, yv = _blobs(10, seed=2)
    best_c, best_acc, results = sweep_logreg_C(
        x, y, xv, yv, num_classes=3, c_powers=(-6, -2, 0, 2), max_iters=80
    )
    assert len(results) == 4
    assert best_acc == max(results.values())
    assert best_acc > 0.9
    # C = 1e-6 over-regularizes on separable blobs
    assert results[1e-6] <= best_acc


def test_eval_transform_geometry():
    from PIL import Image

    t = make_eval_transform(resize_size=32, crop_size=28)
    img = Image.fromarray(np.zeros((50, 80, 3), np.uint8))
    out = t(img)
    assert out.shape == (28, 28, 3)
    assert out.dtype == np.float32


def test_top_k_accuracy_semantics():
    from omgsr_tpu.eval.probes import top_k_accuracy

    logits = np.array(
        [[0.9, 0.05, 0.03, 0.02],   # top1 = 0
         [0.1, 0.5, 0.3, 0.1],      # top1 = 1, label 2 in top-2
         [0.4, 0.3, 0.2, 0.1]],     # label 3 only in top-4
        np.float32,
    )
    labels = np.array([0, 2, 3])
    acc = top_k_accuracy(logits, labels, ks=(1, 2, 4))
    assert acc["top-1"] == pytest.approx(1 / 3)
    assert acc["top-2"] == pytest.approx(2 / 3)
    assert acc["top-4"] == pytest.approx(1.0)
    # torch cross-check (manual top-k membership)
    t = torch.from_numpy(logits)
    want1 = float((t.argmax(1) == torch.from_numpy(labels)).float().mean())
    assert acc["top-1"] == pytest.approx(want1)


def test_imagenet_c_mce_matches_vendored():
    """imagenet_c_mce == the vendored compute_relative_average_scores on
    random per-corruption accuracies, AlexNet table included (torchmetrics
    is stubbed — the vendored module only needs its Metric base class)."""
    import importlib.util
    import sys
    import types

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class _Metric:
            def __init__(self, **kw):
                pass

        tm.Metric = _Metric
        sys.modules["torchmetrics"] = tm
    spec = importlib.util.spec_from_file_location(
        "ref_imagenet_c",
        "/root/reference/dinov3_gan/facebookresearch_dinov3_main/dinov3/eval/metrics/imagenet_c.py",
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from omgsr_tpu.eval.probes import ALEXNET_INVERSE_SCORES, imagenet_c_mce

    # table parity with the vendored constants
    assert set(ALEXNET_INVERSE_SCORES) == set(ref.ALEXNET_INVERSE_SCORES)
    for k, vals in ALEXNET_INVERSE_SCORES.items():
        for level, v in enumerate(vals, start=1):
            assert v == ref.ALEXNET_INVERSE_SCORES[k][level], (k, level)

    rng = np.random.default_rng(0)
    scores = {
        k: {level: float(rng.uniform(0.2, 0.9)) for level in range(1, 6)}
        for k in list(ALEXNET_INVERSE_SCORES)[:7]
    }
    # one corruption with a missing level, one corruption entirely absent
    del scores[list(scores)[0]][3]
    got = imagenet_c_mce(scores)
    want = float(ref.compute_relative_average_scores(scores))
    np.testing.assert_allclose(got, want, rtol=1e-12)
