"""Fused upsample+concat+conv Pallas kernel for the dec0 decoder level.

The full-resolution decoder conv (192->64 @ 64^3) is 44% of the U-Net's
forward FLOPs (docs/PERF.md). models/layers.py::up_concat_conv3x3 already
collapses the nearest-up+conv algebra to 8 parity convs (XLA); this kernel
goes one step further and computes the WHOLE level — the 8 parity up-convs
AND the skip-half 3^3 conv AND bias+activation — in ONE Pallas program per
(batch, coarse-depth-plane), eliminating XLA's intermediate materialization
(8 parity outputs + interleave + skip output + add) between them.

Layout strategy ("parity-block coarse-flat"): all compute happens at the
COARSE resolution where the parity decomposition is FLOP-optimal.

- x_deep is stored as the flat-plane layout of ops/pallas_conv_flat.py:
  (B, dc+2, 128, Pc) with Pc = padded coarse plane (hc+2)(wc+2) rounded to
  lanes.
- skip (fine resolution) is PRE-SPLIT into its 8 parity blocks, each an
  independent coarse-resolution volume in the same flat layout:
  (B, 2, dc+2, 4, 64, Pc)  — indexed [b, r1, a, r2*2+r3, c, pc].
- the output is produced as 8 parity blocks (B, dc, 8, 64, Pc); the
  interleave back to the fine NDHWC grid happens ONCE in XLA afterwards
  (pure data movement at HBM bandwidth).

Under this layout every tap of both halves is a lane ROTATION of a
(C, Pc) plane (the same trick as the flat kernel):

- up tap (j1,j2,j3) for output parity (r1,r2,r3): coarse plane r1+j1 of the
  3-slab x_deep halo, rolled by (r2+j2-1, r3+j3-1) coarse pixels;
- skip tap (k1,k2,k3) for output parity r: source parity block
  r' = (r+k-1) mod 2 per axis with coarse shift floor((r+k-1)/2) — i.e.
  one of the DMA'd skip blocks rolled by a shift in {-1,0,1}.

Per output block ONE MXU pass computes
  OUT(64, Pc) = W_cat(64, 8*128 + 27*64) @ concat(A_up, A_skip)
with bias + activation fused, so the level's arithmetic runs in 8 GEMMs
per (b, coarse plane) with K = 2752 — no intermediate HBM traffic at all.

Numerics match models/layers.py::up_concat_conv3x3 (same Weff pre-summing,
fp32 accumulation); verified against it in tests (interpret mode on CPU,
real Mosaic on TPU).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetal_mri_segmentation_tpu.ops.pallas_conv_flat import (
    _interior_mask, _round_up, to_flat)


# ---------------------------------------------------------------------------
# host-side layout converters (XLA)
# ---------------------------------------------------------------------------

def skip_to_parity_blocks(skip: jnp.ndarray) -> jnp.ndarray:
    """(B, 2dc, 2hc, 2wc, C) -> (B, 2, dc+2, 4, C, Pc) parity-block flat.

    Each of the 8 parity blocks becomes an independent coarse-resolution
    volume with its own zero pad ring (the ring doubles as the conv's SAME
    padding at block granularity)."""
    B, Df, Hf, Wf, C = skip.shape
    dc, hc, wc = Df // 2, Hf // 2, Wf // 2
    x = skip.reshape(B, dc, 2, hc, 2, wc, 2, C)
    x = jnp.transpose(x, (0, 2, 4, 6, 1, 3, 5, 7))   # (B,2,2,2,dc,hc,wc,C)
    x = x.reshape(B * 8, dc, hc, wc, C)
    xf, _ = to_flat(x)                               # (B*8, dc+2, C, Pc)
    Pc = xf.shape[-1]
    xf = xf.reshape(B, 2, 4, dc + 2, C, Pc)
    return jnp.transpose(xf, (0, 1, 3, 2, 4, 5))     # (B,2,dc+2,4,C,Pc)


def blocks_to_fine(out_blocks: jnp.ndarray, dc: int, hc: int, wc: int
                   ) -> jnp.ndarray:
    """(B, dc, 8, CO, Pc) parity blocks -> (B, 2dc, 2hc, 2wc, CO) fine."""
    B, _, _, CO, Pc = out_blocks.shape
    plane = out_blocks[..., : (hc + 2) * (wc + 2)].reshape(
        B, dc, 2, 2, 2, CO, hc + 2, wc + 2)[..., 1:-1, 1:-1]
    # (B, dc, r1, r2, r3, CO, hc, wc) -> fine NDHWC
    y = jnp.transpose(plane, (0, 1, 2, 6, 3, 7, 4, 5))
    return y.reshape(B, 2 * dc, 2 * hc, 2 * wc, CO)


def _build_weights(kernel: jnp.ndarray, up_ch: int, dtype):
    """(3,3,3, up_ch+skip_ch, CO) ->
    up (8, CO, 8*up_ch) per output parity block + skip (CO, 27*skip_ch).

    up[r][.,(j1,j2,j3,ci)] = Weff_r[j] — the sum of kernel taps landing on
    coarse offset j at parity r (models/layers.py::up_concat_conv3x3's S
    matrices). skip is shared by every block (the per-block difference is
    which ROLLED source plane each tap reads, not the weight)."""
    w_up = kernel[:, :, :, :up_ch, :].astype(jnp.float32)
    w_skip = kernel[:, :, :, up_ch:, :].astype(jnp.float32)
    S = jnp.asarray([[[1, 0, 0], [0, 1, 1]],
                     [[1, 1, 0], [0, 0, 1]]], jnp.float32)
    rows = []
    co = kernel.shape[-1]
    skip_ch = kernel.shape[3] - up_ch
    for r1 in range(2):
        for r2 in range(2):
            for r3 in range(2):
                weff = jnp.einsum("ak,bl,cm,klmio->abcio",
                                  S[r1], S[r2], S[r3], w_up)
                rows.append(jnp.transpose(weff.reshape(8 * up_ch, co)))
    w_up_cat = jnp.stack(rows).astype(dtype)          # (8, CO, 8*up)
    w_skip_cat = jnp.transpose(                       # (3, CO, 9*skip):
        w_skip.reshape(3, 9 * skip_ch, co),           # per-k1 GEMM weights,
        (0, 2, 1)).astype(dtype)                      # cols (k2, k3, ci)
    return w_up_cat, w_skip_cat


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _dec0_kernel(x_hbm, s_hbm, wu_ref, ws_ref, b_ref, mask_ref, out_ref,
                 x_slab, s_even, s_odd, sem_x, sem_e, sem_o, *,
                 CU, CS, CO, Pc, W2, activation, negative_slope, out_dtype):
    b = pl.program_id(0)
    a = pl.program_id(1)

    # x_deep: padded coarse planes a..a+2 (halo, like the flat conv kernel)
    dma_x = pltpu.make_async_copy(x_hbm.at[b, pl.ds(a, 3)], x_slab, sem_x)
    # skip parity blocks: depth-parity 0 needs padded planes a+1..a+2
    # (coarse delta 0,+1); parity 1 needs a..a+1 (delta -1,0)
    dma_e = pltpu.make_async_copy(s_hbm.at[b, 0, pl.ds(a + 1, 2)],
                                  s_even, sem_e)
    dma_o = pltpu.make_async_copy(s_hbm.at[b, 1, pl.ds(a, 2)], s_odd, sem_o)
    dma_x.start()
    dma_e.start()
    dma_o.start()
    dma_x.wait()
    dma_e.wait()
    dma_o.wait()

    def rolled(plane, dh, dw):
        shift = dh * W2 + dw
        return jnp.roll(plane, -shift, axis=1) if shift else plane

    # source selector for a skip tap: fine offset t = r + k - 1 per axis
    # -> (parity r', coarse shift) with r' = t & 1, shift = t >> 1
    # (Python's arithmetic right shift gives -1 >> 1 == -1, as needed)
    def skip_src(r, k):
        t = r + k - 1
        return t & 1, t >> 1

    for blk in range(8):
        r1, r2, r3 = (blk >> 2) & 1, (blk >> 1) & 1, blk & 1
        # --- up half: one GEMM per j1 (K = 4*CU — bounds the A buffer) ---
        acc = jnp.zeros((CO, Pc), jnp.float32)
        for j1 in range(2):
            a_up = jnp.concatenate(
                [rolled(x_slab[r1 + j1], r2 + j2 - 1, r3 + j3 - 1)
                 for j2 in range(2) for j3 in range(2)],
                axis=0)                                    # (4*CU, Pc)
            acc += jax.lax.dot_general(
                wu_ref[blk, :, j1 * 4 * CU:(j1 + 1) * 4 * CU], a_up,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (CO, Pc)
        # --- skip half: one GEMM per k1, K = 9*CS (bounds the A buffer) ---
        for k1 in range(3):
            p1, d1 = skip_src(r1, k1)
            # s_even holds (delta 0,+1) for parity 0; s_odd (delta -1,0)
            src = s_even if p1 == 0 else s_odd
            idx = d1 if p1 == 0 else d1 + 1
            a_skip = jnp.concatenate(
                [rolled(src[idx, (skip_src(r2, k2)[0]) * 2
                             + skip_src(r3, k3)[0]],
                        skip_src(r2, k2)[1], skip_src(r3, k3)[1])
                 for k2 in range(3) for k3 in range(3)],
                axis=0)                                    # (9*CS, Pc)
            acc += jax.lax.dot_general(
                ws_ref[k1], a_skip,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc + b_ref[:, 0][:, None]
        if activation == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif activation == "leaky_relu":
            acc = jnp.where(acc > 0, acc, acc * negative_slope)
        acc = acc * mask_ref[0][None, :]
        out_ref[0, 0, blk] = acc.astype(out_dtype)


def _dec0_call(xf, sf, w_up, w_skip, bias, mask, *, W2c, activation,
               negative_slope, interpret):
    B, D2, CU, Pc = xf.shape
    CS = sf.shape[-2]
    CO = w_up.shape[1]
    dc = D2 - 2
    kernel = functools.partial(
        _dec0_kernel, CU=CU, CS=CS, CO=CO, Pc=Pc, W2=W2c,
        activation=activation, negative_slope=negative_slope,
        out_dtype=xf.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, dc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x_deep flat (DMA'd)
            pl.BlockSpec(memory_space=pl.ANY),   # skip blocks (DMA'd)
            pl.BlockSpec((8, CO, 8 * CU), lambda b, a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, CO, 9 * CS), lambda b, a: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CO, 1), lambda b, a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pc), lambda b, a: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, CO, Pc),
                               lambda b, a: (b, a, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, dc, 8, CO, Pc), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, CU, Pc), xf.dtype),       # x halo slab
            pltpu.VMEM((2, 4, CS, Pc), xf.dtype),    # skip parity 0 planes
            pltpu.VMEM((2, 4, CS, Pc), xf.dtype),    # skip parity 1 planes
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # the 8-block output window (2.6 MB at 64^3) plus the A/roll
        # transients legitimately exceed Mosaic's conservative 16 MB scoped
        # default; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xf, sf, w_up, w_skip, bias, mask)


def dec0_available(x_shape: Tuple[int, ...], up_ch: int, skip_ch: int,
                   co: int, itemsize: int = 2,
                   skip_shape: Tuple[int, ...] = None) -> bool:
    """Eligibility: TPU (or interpret mode), skip spatial dims exactly 2x
    the coarse grid (pass ``skip_shape`` to check — odd dims surviving a
    pooling level would otherwise fail inside jit with an opaque reshape
    error instead of falling back to the XLA path), VMEM fit."""
    if os.environ.get("FETAL_TPU_NO_PALLAS", "0") == "1":
        return False
    if (jax.default_backend() != "tpu"
            and os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") != "1"):
        return False
    if up_ch % 8 or skip_ch % 8 or co % 8:
        return False
    if skip_shape is not None and tuple(skip_shape[1:4]) != tuple(
            2 * int(s) for s in x_shape[1:4]):
        return False
    hc, wc = int(x_shape[2]), int(x_shape[3])
    Pc = _round_up((hc + 2) * (wc + 2), 128)
    vmem = (3 * up_ch * Pc * itemsize              # x slab
            + 2 * 2 * 4 * skip_ch * Pc * itemsize  # skip slabs
            + 8 * co * 8 * up_ch * itemsize        # up weights
            + 3 * co * 9 * skip_ch * itemsize      # skip weights
            + max(8 * up_ch, 9 * skip_ch) * Pc * itemsize  # A buffer
            + co * Pc * 4                          # f32 acc
            + 2 * 8 * co * Pc * itemsize           # double-buffered out
            + Pc * 4)
    return vmem < 14 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("activation", "negative_slope",
                                             "interpret"))
def _dec0_fwd(x_deep, skip, kernel, bias, *, activation="none",
              negative_slope=0.3, interpret=None):
    if interpret is None:
        interpret = (os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") == "1")
    B, dc, hc, wc, CU = x_deep.shape
    xf, (_, _, Pc) = to_flat(x_deep)
    sf = skip_to_parity_blocks(skip.astype(x_deep.dtype))
    w_up, w_skip = _build_weights(kernel, CU, x_deep.dtype)
    mask = jnp.asarray(_interior_mask(hc, wc, Pc))
    bias2 = bias.reshape(-1, 1).astype(jnp.float32)
    out = _dec0_call(xf, sf, w_up, w_skip, bias2, mask, W2c=wc + 2,
                     activation=activation, negative_slope=negative_slope,
                     interpret=interpret)
    return blocks_to_fine(out, dc, hc, wc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def up_concat_conv3x3_pallas(x_deep, skip, kernel, bias,
                             activation="none", negative_slope=0.3):
    """Fused dec0 level: conv3^3(concat([up2(x_deep), skip])) + bias
    (+ activation), one Pallas program per coarse plane. Same contract as
    models/layers.py::up_concat_conv3x3 (+ optional fused activation);
    backward = XLA recompute through the parity-conv formulation (whose
    autodiff round 2 measured as good as a hand-written VJP)."""
    return _dec0_fwd(x_deep, skip, kernel, bias, activation=activation,
                     negative_slope=negative_slope)


def _ref_fwd(x_deep, skip, kernel, bias, activation, negative_slope):
    from fetal_mri_segmentation_tpu.models.layers import up_concat_conv3x3
    y = up_concat_conv3x3(x_deep, skip, kernel, bias)
    if activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif activation == "leaky_relu":
        y = jnp.where(y > 0, y, y * negative_slope)
    return y


def _vjp_fwd(x_deep, skip, kernel, bias, activation, negative_slope):
    y = up_concat_conv3x3_pallas(x_deep, skip, kernel, bias, activation,
                                 negative_slope)
    return y, (x_deep, skip, kernel, bias)


def _vjp_bwd(activation, negative_slope, res, g):
    x_deep, skip, kernel, bias = res
    _, vjp = jax.vjp(
        lambda xd, s, k, b: _ref_fwd(xd, s, k, b, activation,
                                     negative_slope),
        x_deep, skip, kernel, bias)
    return vjp(g)


up_concat_conv3x3_pallas.defvjp(_vjp_fwd, _vjp_bwd)
