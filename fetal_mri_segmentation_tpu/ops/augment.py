"""Device-side data augmentation (flip / 48-symmetry permute / contrast / scale).

The reference augments on the host by mutating the NIfTI affine and resampling
with nilearn — its training-throughput bottleneck (reference: unet3d/augment.py::
augment_data, scale_image, flip_image, random_flip_dimensions,
random_scale_factor, generate_permutation_keys, random_permutation_x_y,
permute_data; fetal fork adds contrast/intensity augmentation).

Here every augmentation is a pure JAX function on device, vmapped over the
batch and keyed by ``jax.random`` — it fuses into the jitted train step, so the
host never touches augmented voxels:

- flips        → ``jnp.flip`` selected by bernoulli draws (XLA `rev` + select)
- 48-symmetry  → ``lax.switch`` over the 48 statically-unrolled cube
                 symmetries (rot90/flip/transpose compositions), applied
                 identically to data and truth (cubic patches only)
- contrast     → elementwise affine intensity remap (fused into the step)
- scale        → trilinear `map_coordinates` about the patch center (nearest
                 for truth), the device analogue of affine-scale + resample

Tensor layout: a single example is channels-first ``(C, D, H, W)`` like the
reference; spatial axes are the last three.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# 48-element cube-symmetry group
# ---------------------------------------------------------------------------

def generate_permutation_keys() -> Tuple[tuple, ...]:
    """The 48 unique cube symmetries as composition keys, in a fixed order.

    Reference: augment.py::generate_permutation_keys —
    ``set(product(combinations_with_replacement(range(2), 2), 2, 2, 2, 2))``
    giving ((rot_y, rot_z), flip_x, flip_y, flip_z, transpose) with
    (rot_y, rot_z) ∈ {(0,0),(0,1),(1,1)}: 3 * 16 = 48 keys. We sort for a
    deterministic indexing (the reference iterates a set — order there is
    arbitrary; only the group membership is contractual).
    """
    keys = set(itertools.product(
        itertools.combinations_with_replacement(range(2), 2),
        range(2), range(2), range(2), range(2)))
    return tuple(sorted(keys))


PERMUTATION_KEYS: Tuple[tuple, ...] = generate_permutation_keys()


def permute_data_np(data: np.ndarray, key: tuple) -> np.ndarray:
    """Numpy oracle for one cube symmetry on a (C, D, H, W) array.

    Reference: augment.py::permute_data. Axis convention: rot_y rotates in the
    (D, W) plane, rot_z in the (H, W) plane; flips are per spatial axis;
    transpose swaps the spatial axes of each channel (reverses D/H/W order).
    """
    (rot_y, rot_z), flip_x, flip_y, flip_z, transpose = key
    data = np.asarray(data)
    if rot_y != 0:
        data = np.rot90(data, rot_y, axes=(1, 3))
    if rot_z != 0:
        data = np.rot90(data, rot_z, axes=(2, 3))
    if flip_x:
        data = data[:, ::-1]
    if flip_y:
        data = data[:, :, ::-1]
    if flip_z:
        data = data[:, :, :, ::-1]
    if transpose:
        data = np.transpose(data, (0, 3, 2, 1))
    return np.ascontiguousarray(data)


def _permute_jnp(data: jnp.ndarray, key: tuple) -> jnp.ndarray:
    """JAX version of one static symmetry (shape-preserving for cubes)."""
    (rot_y, rot_z), flip_x, flip_y, flip_z, transpose = key
    if rot_y != 0:
        data = jnp.rot90(data, rot_y, axes=(1, 3))
    if rot_z != 0:
        data = jnp.rot90(data, rot_z, axes=(2, 3))
    if flip_x:
        data = jnp.flip(data, axis=1)
    if flip_y:
        data = jnp.flip(data, axis=2)
    if flip_z:
        data = jnp.flip(data, axis=3)
    if transpose:
        data = jnp.transpose(data, (0, 3, 2, 1))
    return data


def _inverse_key(key: tuple) -> tuple:
    """Composition key whose `permute_data_np` inverts `permute_data_np(·, key)`.

    Found by group search once at import time (48 elements — cheap), since the
    reference's reverse_permute_data special-cases the op order; a table lookup
    is simpler and provably correct (tested by group-closure tests).
    """
    probe = np.arange(2 * 4 * 4 * 4, dtype=np.int64).reshape(2, 4, 4, 4)
    forward = permute_data_np(probe, key)
    for cand in PERMUTATION_KEYS:
        if np.array_equal(permute_data_np(forward, cand), probe):
            return cand
    raise RuntimeError(f"no inverse for permutation key {key}")


INVERSE_KEY_INDEX: Tuple[int, ...] = tuple(
    PERMUTATION_KEYS.index(_inverse_key(k)) for k in PERMUTATION_KEYS)


def permute_data(data: jnp.ndarray, key_index: jnp.ndarray) -> jnp.ndarray:
    """Apply the key_index-th cube symmetry on device (traced switch over 48)."""
    branches = [partial(_permute_jnp, key=k) for k in PERMUTATION_KEYS]
    return jax.lax.switch(key_index, branches, data)


def reverse_permute_data(data: jnp.ndarray, key_index: jnp.ndarray) -> jnp.ndarray:
    """Inverse symmetry, for test-time-augmentation averaging.

    Reference: augment.py::reverse_permute_data.
    """
    inv = jnp.asarray(INVERSE_KEY_INDEX, dtype=jnp.int32)[key_index]
    return permute_data(data, inv)


def random_permutation_x_y(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray):
    """One random cube symmetry applied identically to data and truth.

    Reference: augment.py::random_permutation_x_y (cubic patches only).
    """
    if len(set(x.shape[-3:])) != 1:
        raise ValueError(
            f"permutation augmentation requires cubic patches, got spatial "
            f"shape {x.shape[-3:]} (reference: augment.py::permute_data)")
    idx = jax.random.randint(key, (), 0, len(PERMUTATION_KEYS))
    return permute_data(x, idx), permute_data(y, idx)


# ---------------------------------------------------------------------------
# Flips
# ---------------------------------------------------------------------------

def random_flip(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray):
    """Flip each spatial axis independently with p=0.5, same draw for x and y.

    Reference: augment.py::random_flip_dimensions + flip_image (the reference
    realizes flips by negating affine axes + resample; on device a flip is a
    free `lax.rev`).
    """
    flips = jax.random.bernoulli(key, 0.5, (3,))
    for ax in range(3):
        x = jnp.where(flips[ax], jnp.flip(x, axis=1 + ax), x)
        y = jnp.where(flips[ax], jnp.flip(y, axis=1 + ax), y)
    return x, y


# ---------------------------------------------------------------------------
# Intensity / contrast (fetal-fork addition)
# ---------------------------------------------------------------------------

def random_contrast(key: jax.Array, x: jnp.ndarray, factor: float):
    """Random affine intensity remap: ``x * U(1-f, 1+f) + U(-f, f) * std(x)``.

    Reference: fetal-fork intensity/contrast augmentation (SURVEY.md section 2,
    augment row; per-north-star "contrast augmentation").
    """
    k_scale, k_shift = jax.random.split(key)
    scale = jax.random.uniform(k_scale, (), minval=1.0 - factor, maxval=1.0 + factor)
    shift = jax.random.uniform(k_shift, (), minval=-factor, maxval=factor)
    return x * scale + shift * jnp.std(x)


# ---------------------------------------------------------------------------
# Scale distortion (resampling-based, optional)
# ---------------------------------------------------------------------------

def random_scale(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                 scale_deviation: float):
    """Random anisotropic zoom about the patch center.

    Reference: augment.py::random_scale_factor (``N(1, scale_deviation)`` per
    axis) + scale_image/augment_data (affine-scale then resample onto the
    original grid; continuous interpolation for data, nearest for truth).
    Implemented on device with `map_coordinates` (order 1 / order 0).
    """
    factors = 1.0 + scale_deviation * jax.random.normal(key, (3,))
    # an unclamped normal draw can go <= 0 (P ~ 3e-5/axis at the documented
    # scale_deviation=0.25), which would MIRROR the volume (negative zoom)
    # or blank it entirely (factor ~ 0) — clamp to a small positive zoom
    factors = jnp.maximum(factors, 0.1)
    spatial = x.shape[1:]
    centers = [(s - 1) / 2.0 for s in spatial]
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial],
                         indexing="ij")
    coords = [c + (g - c) / f for g, c, f in zip(grids, centers, factors)]

    def _resample(vol, order):
        return jax.scipy.ndimage.map_coordinates(vol, coords, order=order,
                                                 mode="constant", cval=0.0)

    x = jax.vmap(lambda v: _resample(v, 1))(x.astype(jnp.float32))
    y = jax.vmap(lambda v: _resample(v, 0))(y)
    return x, y


def random_rotation(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                    max_angle_deg: float):
    """Random small 3D rotation about the patch center (trilinear / nearest).

    Reference: fetal-fork rotation augmentation (SURVEY.md section 2
    augmentation row, tagged [M] "possibly translation/rotation"). Euler
    angles drawn U(-a, a) per axis; implemented as one fused
    `map_coordinates` gather on device like `random_scale`.
    """
    angles = jax.random.uniform(key, (3,), minval=-max_angle_deg,
                                maxval=max_angle_deg) * (jnp.pi / 180.0)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    rx = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    rx = rx.at[1, 1].set(ca[0]).at[1, 2].set(-sa[0]) \
           .at[2, 1].set(sa[0]).at[2, 2].set(ca[0])
    ry = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    ry = ry.at[0, 0].set(ca[1]).at[0, 2].set(sa[1]) \
           .at[2, 0].set(-sa[1]).at[2, 2].set(ca[1])
    rz = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    rz = rz.at[0, 0].set(ca[2]).at[0, 1].set(-sa[2]) \
           .at[1, 0].set(sa[2]).at[1, 1].set(ca[2])
    rot = rz @ ry @ rx  # output->input mapping uses the inverse = transpose

    spatial = x.shape[1:]
    centers = jnp.asarray([(s - 1) / 2.0 for s in spatial], jnp.float32)
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial],
                         indexing="ij")
    offset = jnp.stack([g - c for g, c in zip(grids, centers)])  # (3, D, H, W)
    src = jnp.tensordot(rot.T, offset, axes=1) + centers[:, None, None, None]
    coords = [src[i] for i in range(3)]

    def _resample(vol, order):
        return jax.scipy.ndimage.map_coordinates(vol, coords, order=order,
                                                 mode="constant", cval=0.0)

    x = jax.vmap(lambda v: _resample(v, 1))(x.astype(jnp.float32))
    y = jax.vmap(lambda v: _resample(v, 0))(y)
    return x, y


# ---------------------------------------------------------------------------
# Composed per-example pipeline, vmapped over the batch
# ---------------------------------------------------------------------------

def augment_example(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                    *, flip: bool = True, permute: bool = True,
                    contrast: Optional[float] = None,
                    scale_deviation: Optional[float] = None,
                    rotate: Optional[float] = None):
    """Full augmentation of one (C,D,H,W) example + its truth, all on device.

    Mirrors the reference order: spatial (scale/rotate, flip) via
    augment_data, then the 48-symmetry permutation, then intensity (fetal
    contrast) (reference: generator.py::augment_data call site in add_data).
    Static flags decide which transforms are traced in — disabled transforms
    cost nothing.
    """
    k_scale, k_rot, k_flip, k_perm, k_con = jax.random.split(key, 5)
    if scale_deviation:
        x, y = random_scale(k_scale, x, y, scale_deviation)
    if rotate:
        x, y = random_rotation(k_rot, x, y, rotate)
    if flip:
        x, y = random_flip(k_flip, x, y)
    if permute:
        x, y = random_permutation_x_y(k_perm, x, y)
    if contrast:
        x = random_contrast(k_con, x, contrast)
    return x, y


def augment_batch(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                  *, flip: bool = True, permute: bool = True,
                  contrast: Optional[float] = None,
                  scale_deviation: Optional[float] = None,
                  rotate: Optional[float] = None):
    """vmap of `augment_example` over the leading batch axis."""
    keys = jax.random.split(key, x.shape[0])
    fn = partial(augment_example, flip=flip, permute=permute,
                 contrast=contrast, scale_deviation=scale_deviation,
                 rotate=rotate)
    return jax.vmap(fn)(keys, x, y)
