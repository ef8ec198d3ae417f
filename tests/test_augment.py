"""48-symmetry group + device-side augmentation tests (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.ops import augment as A


def test_permutation_keys_count_and_identity():
    assert len(A.PERMUTATION_KEYS) == 48
    ident = ((0, 0), 0, 0, 0, 0)
    assert ident in A.PERMUTATION_KEYS
    x = np.arange(2 * 4 * 4 * 4).reshape(2, 4, 4, 4)
    assert np.array_equal(A.permute_data_np(x, ident), x)


def test_permutation_group_closure():
    """All 48 keys produce distinct volumes, and each has an inverse in the group."""
    x = np.arange(1 * 4 * 4 * 4, dtype=np.int64).reshape(1, 4, 4, 4)
    seen = set()
    for i, key in enumerate(A.PERMUTATION_KEYS):
        y = A.permute_data_np(x, key)
        seen.add(y.tobytes())
        inv_key = A.PERMUTATION_KEYS[A.INVERSE_KEY_INDEX[i]]
        assert np.array_equal(A.permute_data_np(y, inv_key), x)
    assert len(seen) == 48  # all symmetries distinct


def test_jax_permute_matches_numpy():
    x = np.random.default_rng(0).random((2, 6, 6, 6)).astype(np.float32)
    for i in [0, 7, 23, 41, 47]:
        got = np.asarray(A.permute_data(jnp.asarray(x), jnp.int32(i)))
        want = A.permute_data_np(x, A.PERMUTATION_KEYS[i])
        assert np.array_equal(got, want), f"key {i}"


def test_reverse_permute_on_device():
    x = jnp.asarray(np.random.default_rng(1).random((1, 4, 4, 4)), jnp.float32)
    for i in [3, 17, 30]:
        y = A.permute_data(x, jnp.int32(i))
        back = A.reverse_permute_data(y, jnp.int32(i))
        assert np.allclose(np.asarray(back), np.asarray(x))


def test_random_flip_applies_same_to_x_and_y():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.arange(4**3, dtype=np.float32).reshape(1, 4, 4, 4))
    y = x + 100.0
    xf, yf = A.random_flip(key, x, y)
    assert np.allclose(np.asarray(yf) - np.asarray(xf), 100.0)


def test_random_contrast_is_affine(rng):
    key = jax.random.PRNGKey(42)
    x = jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)
    out = A.random_contrast(key, x, 0.2)
    # affine map preserves correlation 1 with input
    xf = np.asarray(x).ravel()
    of = np.asarray(out).ravel()
    corr = np.corrcoef(xf, of)[0, 1]
    assert corr > 0.9999


def test_random_scale_preserves_shape_and_labels():
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(np.random.default_rng(3).random((1, 12, 12, 12)), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    xs, ys = A.random_scale(key, x, y, 0.25)
    assert xs.shape == x.shape and ys.shape == y.shape
    uniq = np.unique(np.asarray(ys))
    assert set(uniq).issubset({0.0, 1.0})  # nearest interp keeps labels binary


def test_augment_batch_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((4, 1, 8, 8, 8)), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    x1, y1 = A.augment_batch(key, x, y, flip=True, permute=True, contrast=0.1)
    x2, y2 = A.augment_batch(key, x, y, flip=True, permute=True, contrast=0.1)
    assert x1.shape == x.shape and y1.shape == y.shape
    assert np.allclose(np.asarray(x1), np.asarray(x2))  # same key -> same aug
    x3, _ = A.augment_batch(jax.random.PRNGKey(1), x, y, flip=True,
                            permute=True, contrast=0.1)
    assert not np.allclose(np.asarray(x1), np.asarray(x3))


def test_augment_disabled_is_identity():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(6).random((2, 1, 4, 4, 4)), jnp.float32)
    y = x.copy()
    x1, y1 = A.augment_batch(key, x, y, flip=False, permute=False, contrast=None)
    assert np.array_equal(np.asarray(x1), np.asarray(x))
    assert np.array_equal(np.asarray(y1), np.asarray(y))


def test_random_rotation_properties():
    """Rotation: shape-preserving, labels stay binary, 0-degrees == identity
    (up to interpolation), and a rotated ball keeps its volume roughly."""
    key = jax.random.PRNGKey(0)
    zz, yy, xx = np.mgrid[:16, :16, :16]
    ball = ((((zz - 8) ** 2 + (yy - 8) ** 2 + (xx - 8) ** 2) < 25)
            .astype(np.float32))
    x = jnp.asarray(ball[None] + 0.1)
    y = jnp.asarray(ball[None])

    x0, y0 = A.random_rotation(key, x, y, 0.0)
    assert np.allclose(np.asarray(x0), np.asarray(x), atol=1e-5)
    assert np.array_equal(np.asarray(y0), np.asarray(y))

    xr, yr = A.random_rotation(key, x, y, 30.0)
    assert xr.shape == x.shape and yr.shape == y.shape
    assert set(np.unique(np.asarray(yr))).issubset({0.0, 1.0})
    vol_ratio = np.asarray(yr).sum() / ball.sum()
    assert 0.8 < vol_ratio < 1.2  # ball roughly preserved under rotation


def test_augment_batch_with_rotation_runs():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 1, 8, 8, 8)), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    xa, ya = A.augment_batch(key, x, y, flip=True, permute=True,
                             contrast=0.1, rotate=10.0)
    assert xa.shape == x.shape and np.isfinite(np.asarray(xa)).all()


def test_random_scale_clamps_nonpositive_factors():
    """An unclamped N(1, sigma) factor can go <= 0, which would mirror or
    blank the example; with extreme sigma the op must stay finite and the
    truth must stay binary."""
    import jax

    from fetal_mri_segmentation_tpu.ops.augment import random_scale

    x = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 8)),
                    jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    for seed in range(8):  # several keys -> raw draws include negatives
        xs, ys = random_scale(jax.random.PRNGKey(seed), x, y,
                              scale_deviation=10.0)
        assert np.isfinite(np.asarray(xs)).all()
        assert set(np.unique(np.asarray(ys))).issubset({0.0, 1.0})
