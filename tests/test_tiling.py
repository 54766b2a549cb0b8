import numpy as np
import pytest

from omgsr_tpu.diffusion import gaussian_tile_weights, tile_grid_1d, tile_grid_2d


def _reference_gaussian_weights(tile_width, tile_height):
    """Verbatim re-derivation of infer/omgsr_s_infer_model.py:56-71."""
    from numpy import exp, pi, sqrt

    var = 0.01
    midpoint = (tile_width - 1) / 2
    x_probs = [
        exp(-(x - midpoint) * (x - midpoint) / (tile_width * tile_width) / (2 * var))
        / sqrt(2 * pi * var)
        for x in range(tile_width)
    ]
    midpoint = tile_height / 2
    y_probs = [
        exp(-(y - midpoint) * (y - midpoint) / (tile_height * tile_height) / (2 * var))
        / sqrt(2 * pi * var)
        for y in range(tile_height)
    ]
    return np.outer(y_probs, x_probs)


@pytest.mark.parametrize("th,tw", [(64, 64), (128, 96), (7, 13)])
def test_gaussian_weights_match_reference(th, tw):
    ours = gaussian_tile_weights(th, tw)
    ref = _reference_gaussian_weights(tw, th)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def _reference_grid_1d(size, tile, overlap):
    """Re-derivation of the reference's while-loop + edge clamp
    (infer/omgsr_s_infer_model.py:94-123)."""
    n = 0
    cur = 0
    while cur < size:
        cur = max(n * tile - overlap * n, 0) + tile
        n += 1
    offs = []
    for i in range(n):
        ofs = max(i * tile - overlap * i, 0)
        if i == n - 1:
            ofs = size - tile
        offs.append(ofs)
    return offs


@pytest.mark.parametrize(
    "size,tile,overlap",
    [(128, 64, 32), (96, 64, 32), (65, 64, 32), (64, 64, 32), (200, 64, 32), (512, 128, 64)],
)
def test_tile_grid_matches_reference(size, tile, overlap):
    assert tile_grid_1d(size, tile, overlap) == _reference_grid_1d(size, tile, overlap)


def test_tile_grid_covers_everything():
    for size in [64, 65, 100, 127, 128, 129, 333]:
        offs = tile_grid_1d(size, 64, 32)
        covered = np.zeros(size, bool)
        for o in offs:
            covered[o : o + 64] = True
        assert covered.all()
        assert all(0 <= o <= size - 64 for o in offs)


def test_tile_grid_2d_row_major():
    g = tile_grid_2d(96, 128, 64, 32)
    ys = sorted({y for y, _ in g})
    xs = sorted({x for _, x in g})
    assert g == [(y, x) for y in ys for x in xs]
