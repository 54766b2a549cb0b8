import jax.numpy as jnp
import numpy as np

from omgsr_tpu.diffusion import latent_image_ids, pack_latents, unpack_latents


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    packed = pack_latents(x)
    assert packed.shape == (2, 4 * 6, 64)
    back = unpack_latents(packed, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pack_matches_torch_semantics():
    """Replicate the reference's NCHW view/permute/reshape chain
    (train/train_omgsr_f.py:74-79) in numpy and compare."""
    rng = np.random.default_rng(1)
    nchw = rng.normal(size=(1, 4, 6, 8)).astype(np.float32)
    b, c, h, w = nchw.shape
    ref = nchw.reshape(b, c, h // 2, 2, w // 2, 2)
    ref = ref.transpose(0, 2, 4, 1, 3, 5)
    ref = ref.reshape(b, (h // 2) * (w // 2), c * 4)

    nhwc = jnp.asarray(nchw.transpose(0, 2, 3, 1))
    ours = np.asarray(pack_latents(nhwc))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_unpack_matches_torch_semantics():
    rng = np.random.default_rng(2)
    tokens = rng.normal(size=(1, 6, 16)).astype(np.float32)  # h=4,w=6 latent, c=4
    h, w = 4, 6
    b, s, cf = tokens.shape
    # reference _unpack_latents (train/train_omgsr_f.py:81-94) given latent dims
    ref = tokens.reshape(b, h // 2, w // 2, cf // 4, 2, 2)
    ref = ref.transpose(0, 3, 1, 4, 2, 5)
    ref = ref.reshape(b, cf // 4, h, w)

    ours = np.asarray(unpack_latents(jnp.asarray(tokens), h, w))
    np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2), ref)


def test_latent_image_ids():
    ids = np.asarray(latent_image_ids(3, 5))
    assert ids.shape == (15, 3)
    assert np.all(ids[:, 0] == 0)
    assert ids[7, 1] == 1 and ids[7, 2] == 2  # token 7 = row 1, col 2
    assert ids[-1, 1] == 2 and ids[-1, 2] == 4
