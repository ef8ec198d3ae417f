"""Pallas TPU kernel: fused 3x3x3 conv + bias + activation (implicit GEMM).

Why: XLA's TPU lowering of `conv_general_dilated` for these shapes
materializes im2col-style buffers in HBM — cost analysis of the depth-3
U-Net forward shows 2.7 GB of traffic for 393 GFLOP (measured ~290 GB/s ⇒
bandwidth-bound at ~20% MXU utilization). This kernel builds its GEMM
A-tiles in VMEM from 27 shifted reads of a halo slab DMA'd once per tile —
the activation tensor crosses HBM exactly twice (read input, write output).

Contract (the hot conv of both U-Net families — reference:
unet3d/model/unet.py::create_convolution_block):

    y[b, d, h, w, co] = act( sum_{kd,kh,kw,ci} x[b, d+kd-1, h+kh-1, w+kw-1, ci]
                             * W[kd, kh, kw, ci, co] + bias[co] )

- NDHWC, SAME padding (realized by padding x once outside the kernel),
  stride 1, kernel 3^3; activation in {"relu", "leaky_relu", "none"}.
- bf16 inputs/weights, f32 accumulation, bf16 output.
- Grid: (B, D, H / TH). Each program DMAs the (3, TH+2, W+2, C_in) halo
  slab HBM→VMEM, then accumulates 27 tap-GEMMs of (TH*W, C_in) x
  (C_in, C_out) on the MXU.
- Used for inference forwards (training uses a custom_vjp whose backward
  falls back to XLA convs — see `conv3x3`).

Gated: only eligible when C_in >= 8 (K-dim too thin otherwise — the 1-channel
stem stays on XLA) and spatial dims fit the tiling. `FETAL_TPU_NO_PALLAS=1`
disables globally.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, slab, sem, *, TH, W, CI, CO,
            activation, negative_slope):
    b = pl.program_id(0)
    d = pl.program_id(1)
    ht = pl.program_id(2)

    # halo slab for this (b, d, h-tile): (3, TH+2, Wp, CI) where Wp is the
    # 8-aligned padded W extent (full W and C are DMA'd; only the untiled
    # d/h dims are sliced -> alignment-safe)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(d, 3), pl.ds(ht * TH, TH + 2), :, :],
        slab, sem)
    dma.start()
    dma.wait()

    # K-packing: concatenate the 9 (kh, kw) shifted views into one
    # (TH*W, 9*CI) A-tile so each MXU pass runs with K = 9*CI instead of a
    # thin K = CI (32-wide K uses a quarter of the 128-deep systolic array).
    acc = jnp.zeros((TH * W, CO), jnp.float32)
    for kd in range(3):
        a = jnp.concatenate(
            [slab[kd, kh:kh + TH, kw:kw + W, :].reshape(TH * W, CI)
             for kh in range(3) for kw in range(3)], axis=1)
        acc += jnp.dot(a, w_ref[kd], preferred_element_type=jnp.float32)

    acc = acc + b_ref[0, :].astype(jnp.float32)[None, :]
    if activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif activation == "leaky_relu":
        acc = jnp.where(acc > 0, acc, acc * negative_slope)
    out_ref[...] = acc.reshape(1, 1, TH, W, CO).astype(out_ref.dtype)


def _pick_th(d: int, h: int, w: int, ci: int, co: int) -> Optional[int]:
    """Pick an H-tile so the slab + acc fit comfortably in VMEM."""
    for th in (32, 16, 8, 4):
        if h % th != 0:
            continue
        slab = 3 * (th + 2) * (w + 2) * ci * 2
        acc = th * w * co * 4
        wts = 27 * ci * co * 2
        if slab + acc + wts + th * w * co * 2 < 12 * 1024 * 1024:
            return th
    return None


def pallas_conv3x3_available(x_shape, ci: int, co: int) -> bool:
    if os.environ.get("FETAL_TPU_NO_PALLAS", "0") == "1":
        return False
    if (jax.default_backend() != "tpu"
            and os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") != "1"):
        return False  # Mosaic TPU kernels need a TPU (or interpret mode)
    if ci < 8:
        return False
    if (ci % 128 != 0
            and os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") != "1"):
        # Mosaic HBM->VMEM DMA requires the lane (channel) dim of the halo
        # slab to be 128-aligned; narrower channels would need 4x zero
        # padding, which erases the traffic win. The wide deep levels
        # (128/256 ch) still qualify.
        return False
    b, d, h, w = x_shape[0], x_shape[1], x_shape[2], x_shape[3]
    return _pick_th(d, h, w, ci, co) is not None


@functools.partial(jax.jit, static_argnames=("activation", "negative_slope",
                                             "interpret"))
def _conv3x3_fwd(x, w, bias, *, activation="relu", negative_slope=0.01,
                 interpret=None):
    """x: (B, D, H, W, CI) bf16 -> (B, D, H, W, CO) bf16."""
    if interpret is None:
        interpret = (os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") == "1")
    B, D, H, W, CI = x.shape
    CO = w.shape[-1]
    TH = _pick_th(D, H, W, CI, CO)
    if TH is None:
        raise ValueError(f"no valid tile for shape {x.shape}")

    # conv halo pad; the W axis is additionally padded up to a multiple of 8
    # because Mosaic requires HBM DMA slice shapes to be sublane-aligned
    # (the slab copy reads the full padded W extent).
    w_extra = (-(W + 2)) % 8
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1 + w_extra), (0, 0)))
    # (3, 3, 3, CI, CO) -> (kd, (kh, kw, ci), CO): matches the kernel's
    # concat order of the 9 shifted views.
    w27 = w.reshape(3, 9 * CI, CO)
    bias2 = bias.reshape(1, CO)

    kernel = functools.partial(_kernel, TH=TH, W=W, CI=CI, CO=CO,
                               activation=activation,
                               negative_slope=negative_slope)
    return pl.pallas_call(
        kernel,
        grid=(B, D, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x_pad stays in HBM
            pl.BlockSpec((3, 9 * CI, CO), lambda b, d, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO), lambda b, d, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TH, W, CO),
                               lambda b, d, t: (b, d, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, CO), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, TH + 2, W + 2 + w_extra, CI), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, w27, bias2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x, w, bias, activation="relu", negative_slope=0.01):
    """Fused conv3^3+bias+activation; Pallas forward, XLA backward.

    Differentiable: the custom VJP recomputes the pre-activation with XLA
    convs for the backward pass (training keeps full-speed XLA autodiff
    while inference forwards take the Pallas path).
    """
    return _conv3x3_fwd(x, w, bias, activation=activation,
                        negative_slope=negative_slope)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def _fwd(x, w, bias, activation, negative_slope):
    y = conv3x3(x, w, bias, activation, negative_slope)
    return y, (x, w, bias)


def _bwd(activation, negative_slope, res, g):
    x, w, bias = res
    # recompute pre-activation with XLA autodiff machinery — keeps the
    # pallas kernel forward-only while training stays exactly correct.
    # run the VJP in f32: lax.conv transposition requires uniform dtypes,
    # and astype's own VJP routes the casts for us.
    def conv_f32(x_, w_):
        return _xla_conv(x_.astype(jnp.float32), w_.astype(jnp.float32))

    pre, vjp = jax.vjp(conv_f32, x, w)
    pre = pre + bias.astype(jnp.float32)
    if activation == "relu":
        dact = (pre > 0)
    elif activation == "leaky_relu":
        dact = jnp.where(pre > 0, 1.0, negative_slope)
    else:
        dact = jnp.ones_like(pre)
    g2 = (g.astype(jnp.float32) * dact).astype(jnp.float32)
    dx, dw = vjp(g2)
    db = g2.sum(axis=(0, 1, 2, 3)).astype(bias.dtype)
    return dx.astype(x.dtype), dw.astype(w.dtype), db


conv3x3.defvjp(_fwd, _bwd)
