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
from fetal_mri_segmentation_tpu.utils.residency import ResidentParamsMixin
from fetal_mri_segmentation_tpu.ops.patches import (
    compute_patch_indices, gaussian_importance_map)


class SlidingWindowPredictor(ResidentParamsMixin):
    """Compiled whole-volume predictor for a fixed geometry.

    One instance = one XLA executable (geometry is static); reuse it across
    volumes of the same shape — the per-volume cost is one H2D transfer, the
    scan, and one D2H transfer.
    """

    def __init__(self, model, config, image_shape: Sequence[int],
                 patch_shape: Optional[Sequence[int]] = None,
                 overlap: int = 16, patch_batch_size: int = 8,
                 use_gaussian: bool = True, tta_permute=False):
        self.model = model
        self.config = config
        self.image_shape = tuple(int(s) for s in image_shape)
        self.patch_shape = tuple(int(s) for s in
                                 (patch_shape or config.patch_shape))
        self.n_labels = config.n_labels
        # ``tta_permute``: False | True/"permute" (all 48 cube symmetries,
        # cubic patches only — reference predict(permute=True)) | "flips"
        # (the 8-element axis-flip subgroup: ~6x cheaper, any patch shape).
        from fetal_mri_segmentation_tpu.utils.residency import (
            normalize_tta_mode)

        self.tta_mode = normalize_tta_mode(tta_permute)
        if (self.tta_mode == "permute"
                and len(set(self.patch_shape)) != 1):
            raise ValueError(
                f"48-symmetry TTA requires cubic patches, got "
                f"{self.patch_shape} — use tta 'flips' (the 8-way flip "
                f"subgroup works for any patch shape)")
        self.tta_permute = self.tta_mode is not None  # legacy surface

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

        # The weight-sum field is DATA-INDEPENDENT (only geometry + the
        # Gaussian map): precompute it on host once instead of accumulating
        # it on device every volume — halves the scatter work.
        self._corners_np = np.asarray(shifted.reshape(-1, P, 3))
        self._valid_np = np.asarray(valid.reshape(-1, P))
        wsum = np.zeros(self.padded_shape, np.float64)
        for corner, v in zip(self._corners_np.reshape(-1, 3),
                             self._valid_np.reshape(-1)):
            if v:
                sl = tuple(slice(int(c), int(c + s))
                           for c, s in zip(corner, self.patch_shape))
                wsum[sl] += wmap
        self._wsum_np = np.maximum(wsum, 1e-8).astype(np.float32)

        # Static unrolling: the patch grid is a compile-time constant, so the
        # overlap-add can be emitted as static-index in-place adds (XLA
        # aliases them) instead of a scan of dynamic_update_slice on a carried
        # accumulator, which copy-on-writes the whole buffer per patch (~25x
        # slower, measured on v5e). Very large grids fall back to the scan to
        # bound compile time.
        self.static_unroll = self._corners_np.reshape(-1, 3).shape[0] <= 512
        # Tiled (segment-sum) overlap-add: fastest path when the geometry
        # allows it — see _init_tiled. Measured on v5e 128^3/64^3/overlap-16:
        # whole labels program 178 -> 115 ms (the 27-update in-place add
        # chain cost ~66 ms; one segment_sum costs ~3 ms).
        self._init_tiled()
        # ONE jitted program for the whole volume — transpose, pad, predict,
        # un-pad, transpose back all inside. Anything eager here costs a
        # full dispatch round-trip per op (brutal over a remote/tunneled
        # device link). jax.jit is lazy: the first call still pays
        # trace+compile (amortized by the persistent compilation cache);
        # what construction fixes is that every volume after the first is
        # ONE dispatch.
        self._jitted = jax.jit(self._predict_volume)
        self._jitted_labels = jax.jit(self._predict_labels_packed,
                                      static_argnames=("threshold",))
        # reduced-precision probability transfers: probabilities live in
        # [0,1], where float16 is exact to ~4.9e-4 (half the D2H bytes) and
        # fixed-point uint8/uint16 to 2.0e-3/7.6e-6 (quarter/half) — for
        # probability surfaces (ensembling workflows move L x volume floats
        # per case; labels ride the packed path instead). Cast/quantize
        # INSIDE the program so only the small dtype crosses the link;
        # jax.jit is lazy, so unused variants cost nothing.
        from fetal_mri_segmentation_tpu.utils.residency import quantize_prob
        self._jitted_prob_q = {
            "float16": jax.jit(
                lambda v, d: self._predict_volume(v, d).astype(jnp.float16)),
            "uint8": jax.jit(
                lambda v, d: quantize_prob(self._predict_volume(v, d),
                                           "uint8")),
            "uint16": jax.jit(
                lambda v, d: quantize_prob(self._predict_volume(v, d),
                                           "uint16")),
        }
        self._jitted_prob16 = self._jitted_prob_q["float16"]
        # params stay device-resident across volumes: device_variables()
        # from ResidentParamsMixin (utils/residency.py)

    def _predict_volume(self, variables, data_cdhw):
        """(C, D, H, W) → (L, D, H, W), fully fused single program."""
        vol = jnp.transpose(data_cdhw, (1, 2, 3, 0))
        pb = self.pad_before
        total = [p - i for p, i in zip(self.padded_shape, self.image_shape)]
        pad = [(int(pb[d]), int(total[d] - pb[d])) for d in range(3)] + [(0, 0)]
        vol = jnp.pad(vol, pad)
        out = self._predict_padded(variables, vol)
        sl = tuple(slice(int(pb[d]), int(pb[d] + self.image_shape[d]))
                   for d in range(3))
        return jnp.transpose(out[sl], (3, 0, 1, 2))

    def _predict_labels_packed(self, variables, data_cdhw, threshold):
        """Label map computed on device; binary masks are BIT-PACKED.

        Device→host links can be the bottleneck (12 MB/s through this
        box's tunnel); the reference's output artifact is the uint8 label
        map anyway (reference: prediction.py::prediction_to_image), so
        thresholding/argmax on device cuts the transfer 4-32x.
        Returns uint8: packed bits (binary) or label values (multi-class).
        """
        from fetal_mri_segmentation_tpu.utils.packing import device_label_map

        prob = self._predict_volume(variables, data_cdhw)  # (L, D, H, W)
        return device_label_map(prob, threshold, self.n_labels,
                                self.config.labels)

    def _stage_volume(self, data_cdhw):
        """Host→device staging of one volume, minimized for thin links.

        When the model computes in bf16 (its first op casts the input), the
        upload is rounded to bf16 ON HOST first — half the H2D bytes with
        BIT-IDENTICAL results, since pad/transpose/gather preserve values
        and the model's own cast would produce the same rounding. Measured:
        the 8 MB fp32 volume H2D dominates single-volume wall time over
        this box's tunneled device link (docs/PERF.md).
        """
        n_ch = self.config.nb_channels
        if (data_cdhw.ndim != 4 or data_cdhw.shape[0] != n_ch
                or tuple(data_cdhw.shape[-3:]) != tuple(self.image_shape)):
            # without this, lax.dynamic_slice silently CLAMPS out-of-range
            # patch starts and the fixed-shape accumulator returns a
            # normal-looking garbage volume (verified empirically); a
            # missing/mismatched CHANNEL axis would otherwise surface as a
            # raw transpose/conv tracer error deep inside jit
            raise ValueError(
                f"predictor was built for (C={n_ch}, D, H, W) volumes with "
                f"image_shape={tuple(self.image_shape)} but got a volume "
                f"shaped {tuple(data_cdhw.shape)} — rebuild the predictor "
                "(or resample/stack the case to the training geometry, as "
                "preprocess_case does) for this shape")
        if isinstance(data_cdhw, jax.Array):
            # already on device (ops/resample.py device-preprocess path):
            # no H2D, no host cast — the model's own input cast handles
            # dtype, and the labels program consumes it in place.
            return data_cdhw
        from fetal_mri_segmentation_tpu.utils.residency import (
            host_round_for_model)
        arr = host_round_for_model(np.asarray(data_cdhw, np.float32),
                                   self.model)
        return jax.device_put(arr)

    def predict_labels_async(self, variables, data_cdhw,
                             threshold: float = 0.5):
        """Dispatch the label-map program WITHOUT blocking on the result.

        Returns the on-device (packed) output; finish with
        ``unpack_labels``. Lets a caller pipeline volumes: the dispatch/D2H
        overhead of volume *i* overlaps the compute of volume *i+1* (jax
        async dispatch) — this is where ~40% of single-volume wall time went
        over a remote/tunneled device link.
        """
        variables = self.device_variables(variables)
        # explicit async H2D: jax.device_put overlaps the transfer with
        # dispatch instead of staging it synchronously inside the call
        data = self._stage_volume(data_cdhw)
        return self._jitted_labels(variables, data, threshold)

    def unpack_labels(self, out) -> np.ndarray:
        """Materialize an async result: D2H + bit-unpack to the uint8 map."""
        if self.n_labels == 1:
            from fetal_mri_segmentation_tpu.utils.packing import (
                unpack_bit_mask)

            return unpack_bit_mask(out, self.image_shape)
        return np.asarray(out)

    def predict_labels(self, variables, data_cdhw,
                       threshold: float = 0.5) -> np.ndarray:
        """(C, D, H, W) → uint8 label map (D, H, W), minimal D2H transfer."""
        return self.unpack_labels(
            self.predict_labels_async(variables, data_cdhw, threshold))

    def predict_prob_async(self, variables, data_cdhw,
                           transfer_dtype: str = "float32"):
        """Dispatch the probability program without blocking (async twin of
        `predict_labels_async` for `--prob-map` surfaces); finish with
        ``unpack_prob``. ``transfer_dtype``: "float16" halves the D2H bytes
        (max quantization ~4.9e-4 on [0,1]), "uint8"/"uint16" fixed-point
        quarters/halves them (2.0e-3 / 7.6e-6) — documented opt-ins;
        threshold/argmax label maps derived from any of them are identical
        except exactly at the decision boundary. ``unpack_prob``
        dequantizes back to float32 host-side."""
        from fetal_mri_segmentation_tpu.utils.residency import (
            resolve_prob_transfer)

        variables = self.device_variables(variables)
        data = self._stage_volume(data_cdhw)
        kind = resolve_prob_transfer(transfer_dtype)
        if kind != "float32":
            return self._jitted_prob_q[kind](variables, data)
        return self._jitted(variables, data)

    def unpack_prob(self, out) -> np.ndarray:
        """Materialize an async probability result as float32 (L, D, H, W)."""
        from fetal_mri_segmentation_tpu.utils.residency import unpack_prob_f32

        return unpack_prob_f32(out)

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

    def _tta_flips_apply(self, variables, patches_dhwc):
        """Average model outputs over the 8-element axis-flip subgroup.

        ~6x cheaper than the full 48-symmetry average and valid for ANY
        patch shape (flips never transpose axes, so nothing requires a
        cube). Flips are involutions, so the inverse mapping is the same
        flip. Scanned over the 3-bit flip index — one compile, 8 passes.
        """
        def body(acc, idx):
            bits = [(idx >> 2) & 1, (idx >> 1) & 1, idx & 1]
            xp = patches_dhwc
            for ax, b in zip((1, 2, 3), bits):
                xp = jnp.where(b, jnp.flip(xp, axis=ax), xp)
            yp = self._apply_model(variables, xp)
            for ax, b in zip((1, 2, 3), bits):
                yp = jnp.where(b, jnp.flip(yp, axis=ax), yp)
            return acc + yp.astype(jnp.float32), None

        init = jnp.zeros(patches_dhwc.shape[:4] + (self.n_labels,),
                         jnp.float32)
        acc, _ = jax.lax.scan(body, init, jnp.arange(8))
        return acc / 8.0

    def scan_accumulate(self, variables, vol_dhwc, corners, valid,
                        init=None, track_wsum: bool = True):
        """Core on-device loop: scan corner batches, predict, overlap-add.

        Returns the (weighted-sum, weight) accumulator pair over the PADDED
        volume. Reused by the mesh-sharded predictor
        (parallel/distributed.py::make_sharded_predictor), which runs it on a
        shard of the corner list and psums the accumulators (there each
        shard's weight field IS data it must contribute, so ``track_wsum``
        stays on). Single-device callers pass ``track_wsum=False`` and
        divide by the host-precomputed ``_wsum_np`` instead — the weight
        field is data-independent, and skipping it halves the
        dynamic-slice/update scatter chain, the dominant cost of this path
        (docs/PERF.md addendum 5); the second element returned is then None.
        """
        pd, ph, pw = self.patch_shape
        C = vol_dhwc.shape[-1]
        L = self.n_labels
        apply_fn = {None: self._apply_model, "permute": self._tta_apply,
                    "flips": self._tta_flips_apply}[self.tta_mode]

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
                if wsum is not None:
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
                    jnp.zeros(self.padded_shape, jnp.float32)
                    if track_wsum else None)
        (acc, wsum), _ = jax.lax.scan(body, init, (corners, valid))
        return acc, wsum

    def _init_tiled(self):
        """Precompute the tiled (segment-sum) overlap-add decomposition.

        Every shifted patch corner is a multiple of the grid stride, so with
        a tile size T_a = gcd(stride_a-and-corners_a, patch_a) per axis, each
        patch splits into whole subtiles that land exactly on a regular tile
        grid over the padded volume. The overlap-add then becomes ONE
        ``jax.ops.segment_sum`` of (n_patches * subtiles_per_patch) rows
        into (volume tiles) — replacing the serial chain of full-buffer
        in-place adds that XLA emits for per-patch dynamic updates (same
        math: addition is reordered only).

        Enabled when every tile is >= 4 voxels wide and the row count stays
        small; `_predict_padded` falls back to the unrolled/scan paths
        otherwise (and for degenerate geometries like overlap = patch - 1).
        """
        self.use_tiled = False
        corners_flat = self._corners_np.reshape(-1, 3)
        tile = []
        for a in range(3):
            vals = corners_flat[:, a][self._valid_np.reshape(-1) > 0]
            g = int(np.gcd.reduce(np.concatenate(
                [vals.astype(np.int64), [self.patch_shape[a]]])))
            tile.append(g if g > 0 else self.patch_shape[a])
        spp = [self.patch_shape[a] // tile[a] for a in range(3)]
        n_rows_total = corners_flat.shape[0] * spp[0] * spp[1] * spp[2]
        if min(tile) < 4 or n_rows_total > 65536:
            return
        self._tile = tuple(tile)
        self._spp = tuple(spp)
        tiled_shape = tuple(-(-s // t) * t
                            for s, t in zip(self.padded_shape, tile))
        self._tiled_shape = tiled_shape
        self._nt = tuple(s // t for s, t in zip(tiled_shape, tile))
        self._n_tiles = int(np.prod(self._nt))
        # per-(patch, subtile) destination tile, grouped by scan batch:
        # (n_batches, batch * spp^3) int32
        seg = np.empty((corners_flat.shape[0], spp[0], spp[1], spp[2]),
                       np.int32)
        for i, c in enumerate(corners_flat):
            base = c // tile
            for sd in range(spp[0]):
                for sh in range(spp[1]):
                    for sw in range(spp[2]):
                        seg[i, sd, sh, sw] = (
                            (base[0] + sd) * self._nt[1]
                            + (base[1] + sh)) * self._nt[2] + (base[2] + sw)
        P = self._corners_np.shape[1]
        self._seg_ids = jnp.asarray(
            seg.reshape(-1, P * spp[0] * spp[1] * spp[2]))
        self.use_tiled = True

    def tiled_accumulate(self, variables, vol_dhwc, corners, valid, seg_ids,
                         init=None):
        """Scan corner batches into the TILE-tensor accumulator
        (n_tiles, T0, T1, T2, L) via one segment_sum per batch.

        Exposed (like `scan_accumulate`) for the mesh-sharded predictor
        (parallel/distributed.py), which runs it on a shard of the corner
        list and psums the tile tensors."""
        pd, ph, pw = self.patch_shape
        (t0, t1, t2), (s0, s1, s2) = self._tile, self._spp
        L = self.n_labels
        C = vol_dhwc.shape[-1]
        apply_fn = {None: self._apply_model, "permute": self._tta_apply,
                    "flips": self._tta_flips_apply}[self.tta_mode]

        def gather(corner):
            return jax.lax.dynamic_slice(
                vol_dhwc, (corner[0], corner[1], corner[2], 0),
                (pd, ph, pw, C))

        def body(acc, inp):
            corners_b, valid_b, seg_b = inp
            patches = jax.vmap(gather)(corners_b)
            preds = apply_fn(variables, patches).astype(jnp.float32)
            w = (preds * self.weight_map[None, ..., None]
                 * valid_b[:, None, None, None, None])
            rows = w.reshape(-1, s0, t0, s1, t1, s2, t2, L)
            rows = rows.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            rows = rows.reshape(-1, t0, t1, t2, L)
            acc = acc + jax.ops.segment_sum(rows, seg_b,
                                            num_segments=self._n_tiles)
            return acc, None

        if init is None:
            init = jnp.zeros((self._n_tiles, t0, t1, t2, L), jnp.float32)
        acc, _ = jax.lax.scan(body, init, (corners, valid, seg_ids))
        return acc

    def tiles_to_padded(self, acc):
        """(n_tiles, T0, T1, T2, L) tile tensor → padded-volume weighted sum."""
        (t0, t1, t2) = self._tile
        n0, n1, n2 = self._nt
        L = self.n_labels
        acc = acc.reshape(n0, n1, n2, t0, t1, t2, L)
        acc = acc.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            self._tiled_shape + (L,))
        return acc[: self.padded_shape[0], : self.padded_shape[1],
                   : self.padded_shape[2]]

    def _predict_padded_tiled(self, variables, vol_dhwc):
        """Gather → forward → tiled segment-sum overlap-add (see _init_tiled)."""
        acc = self.tiled_accumulate(variables, vol_dhwc, self.corners,
                                    self.valid, self._seg_ids)
        return (self.tiles_to_padded(acc)
                / jnp.asarray(self._wsum_np)[..., None])

    def _predict_padded_static(self, variables, vol_dhwc):
        """Static-unrolled gather → batched forward → in-place overlap-add."""
        pd, ph, pw = self.patch_shape
        L = self.n_labels
        apply_fn = {None: self._apply_model, "permute": self._tta_apply,
                    "flips": self._tta_flips_apply}[self.tta_mode]

        acc = jnp.zeros(self.padded_shape + (L,), jnp.float32)
        for corners_b, valid_b in zip(self._corners_np, self._valid_np):
            patches = jnp.stack([
                jax.lax.slice(
                    vol_dhwc,
                    (int(c[0]), int(c[1]), int(c[2]), 0),
                    (int(c[0]) + pd, int(c[1]) + ph, int(c[2]) + pw,
                     vol_dhwc.shape[-1]))
                for c in corners_b])
            preds = apply_fn(variables, patches).astype(jnp.float32)
            weighted = preds * self.weight_map[None, ..., None]
            for i, (c, v) in enumerate(zip(corners_b, valid_b)):
                if not v:
                    continue
                acc = acc.at[int(c[0]):int(c[0]) + pd,
                             int(c[1]):int(c[1]) + ph,
                             int(c[2]):int(c[2]) + pw, :].add(weighted[i])
        return acc / jnp.asarray(self._wsum_np)[..., None]

    def _predict_padded(self, variables, vol_dhwc):
        """vol_dhwc: padded (D', H', W', C) → (D', H', W', L) probabilities."""
        if self.use_tiled:
            return self._predict_padded_tiled(variables, vol_dhwc)
        if self.static_unroll:
            return self._predict_padded_static(variables, vol_dhwc)
        # single-device scan fallback (large grids): divide by the
        # host-precomputed weight field like the static/tiled paths — the
        # device wsum accumulation would double the scatter chain on
        # exactly the large grids this path serves
        acc, _ = self.scan_accumulate(variables, vol_dhwc,
                                      self.corners, self.valid,
                                      track_wsum=False)
        return acc / jnp.asarray(self._wsum_np)[..., None]

    # ------------------------------------------------------------------
    def __call__(self, variables, data_cdhw) -> np.ndarray:
        """data: (C, D, H, W) → probability map (L, D, H, W).

        Exactly one program dispatch and one transfer each way.
        """
        variables = self.device_variables(variables)
        data = self._stage_volume(data_cdhw)
        return np.asarray(self._jitted(variables, data))


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
