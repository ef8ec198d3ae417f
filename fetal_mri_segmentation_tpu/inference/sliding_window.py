"""Whole-volume sliding-window inference as one on-device ``lax.scan``.

The reference's patch-wise prediction loops on the host: slice patch batch →
``model.predict`` (device round-trip per batch) → numpy overlap-add
(reference: unet3d/prediction.py::patch_wise_prediction +
unet3d/utils/patches.py::reconstruct_from_patches). BASELINE config #3
replaces that whole stack with a single compiled program:

1. the patch-corner grid is precomputed on host (static — part of the
   compiled program's constants);
2. the volume is zero-padded once so every (possibly negative) corner is
   in-bounds — identical semantics to the reference's out-of-bounds zero-fill;
3. a ``lax.scan`` walks corner batches: gather patches with
   ``lax.dynamic_slice`` (vmapped), run the model on the whole patch batch
   (MXU-efficient), multiply by the Gaussian importance map, and
   scatter-accumulate into (weighted-sum, weight) HBM accumulators carried
   through the scan;
4. one division and one device→host transfer at the end.

Optional test-time augmentation averages predictions over all 48 cube
symmetries per patch (reference: prediction.py::predict with permute=True),
implemented as an inner scan over the symmetry index.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fetal_mri_segmentation_tpu.ops.augment import (
    permute_data, reverse_permute_data)
from fetal_mri_segmentation_tpu.ops.patches import (
    compute_patch_indices, gaussian_importance_map)


class SlidingWindowPredictor:
    """Compiled whole-volume predictor for a fixed geometry.

    One instance = one XLA executable (geometry is static); reuse it across
    volumes of the same shape — the per-volume cost is one H2D transfer, the
    scan, and one D2H transfer.
    """

    def __init__(self, model, config, image_shape: Sequence[int],
                 patch_shape: Optional[Sequence[int]] = None,
                 overlap: int = 16, patch_batch_size: int = 8,
                 use_gaussian: bool = True, tta_permute: bool = False):
        self.model = model
        self.config = config
        self.image_shape = tuple(int(s) for s in image_shape)
        self.patch_shape = tuple(int(s) for s in
                                 (patch_shape or config.patch_shape))
        self.n_labels = config.n_labels
        self.tta_permute = tta_permute

        corners = compute_patch_indices(self.image_shape, self.patch_shape,
                                        overlap)
        # pad so all corners are >= 0 and corner+patch <= padded shape
        pad_before = np.maximum(-corners.min(axis=0), 0)
        pad_after = np.maximum(
            (corners + self.patch_shape).max(axis=0) - self.image_shape, 0)
        self.pad_before = pad_before
        self.padded_shape = tuple(
            int(s + b + a) for s, b, a in
            zip(self.image_shape, pad_before, pad_after))
        shifted = corners + pad_before[None, :]

        # pad the corner list to a multiple of the patch batch; dummy corners
        # repeat the last patch with weight zero.
        P = patch_batch_size
        n = shifted.shape[0]
        n_pad = (-n) % P
        valid = np.concatenate([np.ones(n, np.float32),
                                np.zeros(n_pad, np.float32)])
        if n_pad:
            shifted = np.concatenate([shifted,
                                      np.repeat(shifted[-1:], n_pad, axis=0)])
        self.corners = jnp.asarray(
            shifted.reshape(-1, P, 3).astype(np.int32))
        self.valid = jnp.asarray(valid.reshape(-1, P))

        if use_gaussian:
            wmap = gaussian_importance_map(
                self.patch_shape, sigma_scale=config.gaussian_recon_sigma_scale)
        else:
            wmap = np.ones(self.patch_shape, np.float32)
        self.weight_map = jnp.asarray(wmap)

        self._jitted = jax.jit(self._predict_padded)

    # ------------------------------------------------------------------
    def _apply_model(self, variables, patches_dhwc):
        y = self.model.apply(variables, patches_dhwc)  # (P, d, h, w, L)
        return y

    def _tta_apply(self, variables, patches_dhwc):
        """Average model outputs over all 48 cube symmetries (inverse-mapped).

        Patch-level TTA like the reference's predict(permute=True). Patches
        must be cubic. Implemented as a scan over the symmetry index with a
        48-way switch inside — one compile, 48 small branches.
        """
        # permute_data operates channels-first (C, D, H, W): go CDHW per patch.
        patches_cdhw = jnp.transpose(patches_dhwc, (0, 4, 1, 2, 3))

        def body(acc, idx):
            xp = jax.vmap(lambda p: permute_data(p, idx))(patches_cdhw)
            yp = self._apply_model(
                variables, jnp.transpose(xp, (0, 2, 3, 4, 1)))
            yp_cdhw = jnp.transpose(yp, (0, 4, 1, 2, 3))
            y = jax.vmap(lambda p: reverse_permute_data(p, idx))(yp_cdhw)
            return acc + y, None

        init = jnp.zeros(patches_cdhw.shape[:1] + (self.n_labels,)
                         + patches_cdhw.shape[2:], jnp.float32)
        acc, _ = jax.lax.scan(body, init, jnp.arange(48))
        return jnp.transpose(acc / 48.0, (0, 2, 3, 4, 1))

    def scan_accumulate(self, variables, vol_dhwc, corners, valid,
                        init=None):
        """Core on-device loop: scan corner batches, predict, overlap-add.

        Returns the (weighted-sum, weight) accumulator pair over the PADDED
        volume. Reused by the mesh-sharded predictor
        (parallel/distributed.py::make_sharded_predictor), which runs it on a
        shard of the corner list and psums the accumulators.
        """
        pd, ph, pw = self.patch_shape
        C = vol_dhwc.shape[-1]
        L = self.n_labels
        apply_fn = self._tta_apply if self.tta_permute else self._apply_model

        def gather(corner):
            return jax.lax.dynamic_slice(
                vol_dhwc, (corner[0], corner[1], corner[2], 0),
                (pd, ph, pw, C))

        def body(carry, inp):
            acc, wsum = carry
            corners_b, valid_b = inp
            patches = jax.vmap(gather)(corners_b)           # (P, pd, ph, pw, C)
            preds = apply_fn(variables, patches)            # (P, pd, ph, pw, L)
            w = self.weight_map[None] * valid_b[:, None, None, None]

            def accumulate(i, carry):
                acc, wsum = carry
                c = corners_b[i]
                upd = jax.lax.dynamic_slice(
                    acc, (c[0], c[1], c[2], 0), (pd, ph, pw, L))
                upd = upd + preds[i].astype(jnp.float32) * w[i][..., None]
                acc = jax.lax.dynamic_update_slice(acc, upd,
                                                   (c[0], c[1], c[2], 0))
                wupd = jax.lax.dynamic_slice(wsum, (c[0], c[1], c[2]),
                                             (pd, ph, pw)) + w[i]
                wsum = jax.lax.dynamic_update_slice(wsum, wupd,
                                                    (c[0], c[1], c[2]))
                return acc, wsum

            acc, wsum = jax.lax.fori_loop(0, corners_b.shape[0], accumulate,
                                          (acc, wsum))
            return (acc, wsum), None

        if init is None:
            init = (jnp.zeros(self.padded_shape + (L,), jnp.float32),
                    jnp.zeros(self.padded_shape, jnp.float32))
        (acc, wsum), _ = jax.lax.scan(body, init, (corners, valid))
        return acc, wsum

    def _predict_padded(self, variables, vol_dhwc):
        """vol_dhwc: padded (D', H', W', C) → (D', H', W', L) probabilities."""
        acc, wsum = self.scan_accumulate(variables, vol_dhwc,
                                         self.corners, self.valid)
        return acc / jnp.maximum(wsum, 1e-8)[..., None]

    # ------------------------------------------------------------------
    def __call__(self, variables, data_cdhw) -> np.ndarray:
        """data: (C, D, H, W) → probability map (L, D, H, W), one transfer each way."""
        data = jnp.asarray(np.asarray(data_cdhw, np.float32))
        vol = jnp.transpose(data, (1, 2, 3, 0))
        pb = self.pad_before
        total = [p - i for p, i in zip(self.padded_shape, self.image_shape)]
        pad = [(int(pb[d]), int(total[d] - pb[d])) for d in range(3)] + [(0, 0)]
        vol = jnp.pad(vol, pad)
        out = self._jitted(variables, vol)
        sl = tuple(slice(int(pb[d]), int(pb[d] + self.image_shape[d]))
                   for d in range(3))
        out = out[sl]
        return np.transpose(np.asarray(out), (3, 0, 1, 2))


def patch_wise_prediction(model, variables, config, data_cdhw,
                          overlap: int = 16, batch_size: int = 8,
                          permute: bool = False,
                          use_gaussian: bool = True) -> np.ndarray:
    """One-shot convenience API mirroring the reference's signature.

    Reference: prediction.py::patch_wise_prediction(model, data, overlap,
    batch_size, permute). For repeated volumes of one shape, build a
    `SlidingWindowPredictor` once instead (compiled-executable reuse).
    """
    predictor = SlidingWindowPredictor(
        model, config, image_shape=data_cdhw.shape[-3:],
        overlap=overlap, patch_batch_size=batch_size,
        use_gaussian=use_gaussian, tta_permute=permute)
    return predictor(variables, data_cdhw)
