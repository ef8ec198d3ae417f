"""Pallas TPU conv3^3 in "flat-plane" layout — works for ANY channel count.

The first kernel (ops/pallas_conv.py) keeps NDHWC and DMAs halo slabs, which
Mosaic only allows when C is a multiple of 128 (lane alignment). This variant
removes that limit by changing the data layout instead of fighting the DMA:

    x_flat: (B, D+2, C, P)   with P = (H+2)*(W+2) rounded up to 128

i.e. each depth-slab stores the zero-PADDED H x W plane flattened into the
lane dimension, channels in sublanes. Then:

- the halo DMA per (b, d) program slices only the untiled D axis and copies
  full (C, P) planes — always tile-aligned, any C;
- a conv tap (kh, kw) is a STATIC LANE ROTATION of the plane by
  (kh-1)*(W+2) + (kw-1) (`pltpu.roll`), because the padded plane layout makes
  neighbor pixels adjacent lanes;
- per kd-plane one MXU pass computes OUT(CO, P) += W9^T(CO, 9C) @ A(9C, P)
  with K = 9*C (taps K-packed in sublanes);
- the OUTPUT is written in the same flat layout with its border ring
  re-zeroed by a precomputed lane mask — so consecutive convs CHAIN with no
  relayout and the zero ring doubles as the next conv's SAME padding.

Border voxels computed from rolled-in garbage are exactly the masked ring, so
correctness is restored by the mask (verified against the XLA oracle).

`conv3x3_chain` runs N successive conv+bias+act layers (a U-Net level's
conv pair) with one layout conversion at each end.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# layout converters (XLA side)
# ---------------------------------------------------------------------------

def to_flat(x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """(B, D, H, W, C) -> (B, D+2, C, P) zero-padded flat layout."""
    B, D, H, W, C = x.shape
    P = _round_up((H + 2) * (W + 2), 128)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = jnp.transpose(xp, (0, 1, 4, 2, 3)).reshape(B, D + 2, C,
                                                    (H + 2) * (W + 2))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, P - (H + 2) * (W + 2))))
    return xp, (H, W, P)


def from_flat(xf: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, D+2, C, P) -> (B, D, H, W, C) (drop pad ring)."""
    B, D2, C, P = xf.shape
    plane = xf[:, 1:-1, :, : (H + 2) * (W + 2)].reshape(
        B, D2 - 2, C, H + 2, W + 2)
    return jnp.transpose(plane[:, :, :, 1:-1, 1:-1], (0, 1, 3, 4, 2))


def _interior_mask(H: int, W: int, P: int) -> np.ndarray:
    """(1, P) float mask: 1 on interior (h in 1..H, w in 1..W), 0 on ring/pad."""
    m = np.zeros((H + 2, W + 2), np.float32)
    m[1:-1, 1:-1] = 1.0
    out = np.zeros((1, P), np.float32)
    out[0, : (H + 2) * (W + 2)] = m.reshape(-1)
    return out


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _flat_kernel(x_hbm, w_ref, b_ref, mask_ref, out_ref, slab, sem, *,
                 C, CO, P, W2, tap_group, activation, negative_slope,
                 out_dtype):
    b = pl.program_id(0)
    d = pl.program_id(1)

    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(d, 3), :, :], slab, sem)
    dma.start()
    dma.wait()

    def rolled(plane, kh, kw):
        # A[p] = plane[p + shift]: lane rotation; wraparound only
        # touches ring/pad outputs, which the mask re-zeroes.
        shift = (kh - 1) * W2 + (kw - 1)
        return jnp.roll(plane, -shift, axis=1) if shift else plane

    acc = jnp.zeros((CO, P), jnp.float32)
    for kd in range(3):
        plane = slab[kd]  # (C, P)
        if tap_group == 9:
            # all 27 taps in 3 MXU passes with K = 9*C
            a = jnp.concatenate([rolled(plane, kh, kw)
                                 for kh in range(3) for kw in range(3)],
                                axis=0)              # (9C, P)
            acc += jax.lax.dot_general(
                w_ref[kd], a, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (CO, 9C) @ (9C, P)
        else:
            # wide-C fallback: one pass per kh with K = 3*C — the (9C, P)
            # concat would exceed scoped VMEM (w_ref is (3, 3, CO, 3C))
            for kh in range(3):
                a = jnp.concatenate([rolled(plane, kh, kw)
                                     for kw in range(3)], axis=0)  # (3C, P)
                acc += jax.lax.dot_general(
                    w_ref[kd, kh], a,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    acc = acc + b_ref[:, 0][:, None]
    if activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif activation == "leaky_relu":
        acc = jnp.where(acc > 0, acc, acc * negative_slope)
    acc = acc * mask_ref[0][None, :]                 # re-zero ring + tail pad
    out_ref[...] = acc.reshape(1, 1, CO, P).astype(out_dtype)


def _tap_group(ci: int, P: int, itemsize: int = 2) -> int:
    """9 (all taps in one K-packed GEMM) unless the (9C, P) concat buffer
    would crowd scoped VMEM; then 3 (one GEMM per kh row, K = 3C)."""
    return 9 if 9 * ci * P * itemsize <= 6 * 1024 * 1024 else 3


def _conv_flat(xf, w, bias, mask, *, H, W, activation, negative_slope,
               interpret):
    """xf: (B, D+2, C, P) -> (B, D+2, CO, P) (border ring zeroed)."""
    B, D2, C, P = xf.shape
    CO = w.shape[-1]
    tap_group = _tap_group(C, P, jnp.dtype(xf.dtype).itemsize)
    if tap_group == 9:
        # (3,3,3,C,CO) -> per-kd (CO, 9C), columns ordered (kh, kw, ci)
        w_k = jnp.transpose(w.reshape(3, 9 * C, CO), (0, 2, 1))
        w_spec = pl.BlockSpec((3, CO, 9 * C), lambda b, d: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        # per-(kd, kh) (CO, 3C), columns ordered (kw, ci)
        w_k = jnp.transpose(w.reshape(3, 3, 3 * C, CO), (0, 1, 3, 2))
        w_spec = pl.BlockSpec((3, 3, CO, 3 * C), lambda b, d: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    bias2 = bias.reshape(CO, 1).astype(jnp.float32)

    kernel = functools.partial(_flat_kernel, C=C, CO=CO, P=P, W2=W + 2,
                               tap_group=tap_group,
                               activation=activation,
                               negative_slope=negative_slope,
                               out_dtype=xf.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, D2 - 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            w_spec,
            pl.BlockSpec((CO, 1), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # write into the d+1 slab of a (B, D+2, CO, P) output whose first and
        # last slabs stay zero -> output is ready-padded for the next conv
        out_specs=pl.BlockSpec((1, 1, CO, P), lambda b, d: (b, d + 1, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D2, CO, P), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, C, P), xf.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, w_k, bias2, mask)
    # pallas outputs are uninitialized where no block was written: the first
    # and last D-slabs (the next conv's D-halo) must be zero.
    zero = jnp.zeros((B, 1, CO, P), xf.dtype)
    out = jax.lax.dynamic_update_slice(out, zero, (0, 0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, zero, (0, D2 - 1, 0, 0))
    return out


def pallas_conv_flat_available(x_shape, ci: int, co: int,
                               itemsize: int = 2) -> bool:
    """Eligibility for the flat-plane kernel: any channel count >= 8.

    Complements ops/pallas_conv.py's slab kernel (which needs C % 128 == 0):
    together they cover every conv level except the 1-channel stem.
    """
    if os.environ.get("FETAL_TPU_NO_PALLAS", "0") == "1":
        return False
    if (jax.default_backend() != "tpu"
            and os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") != "1"):
        return False  # Mosaic TPU kernels need a TPU (or interpret mode)
    if ci < 8:
        return False  # K = 9*ci too thin for the MXU; XLA keeps the stem
    h, w = int(x_shape[2]), int(x_shape[3])
    P = _round_up((h + 2) * (w + 2), 128)
    # VMEM per program: input slab + tap-concat buffer (the dominant
    # transient; see _tap_group) + weights + mask + f32 acc + 2x out
    # (double-buffered across grid steps). Mosaic's scoped-vmem limit is
    # 16 MB; leave headroom for rotation temporaries.
    group = _tap_group(ci, P, itemsize)
    vmem = (3 * ci * P * itemsize + group * ci * P * itemsize
            + 27 * ci * co * itemsize + P * 4
            + co * P * 4 + 2 * co * P * itemsize)
    # 14 MB cap against the 16 MB scoped limit — the C=192 @ 64^3 decoder
    # level (estimate ~13.3 MB) verified compiling + matching XLA on chip.
    return vmem < 14 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("activation", "negative_slope",
                                             "interpret"))
def _conv3x3_flat_fwd(x, w, bias, *, activation="relu", negative_slope=0.3,
                      interpret=None):
    """Single fused conv+bias+act through the flat-plane kernel, NDHWC in/out."""
    if interpret is None:
        interpret = (os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") == "1")
    B, D, H, W, _ = x.shape
    xf, (H, W, P) = to_flat(x)
    mask = jnp.asarray(_interior_mask(H, W, P))
    yf = _conv_flat(xf, w.astype(x.dtype), bias, mask, H=H, W=W,
                    activation=activation, negative_slope=negative_slope,
                    interpret=interpret)
    return from_flat(yf, H, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_flat(x, w, bias, activation="relu", negative_slope=0.3):
    """Differentiable fused conv3^3+bias+activation for ANY channel count:
    Pallas flat-plane forward, XLA-recompute backward (shared with
    ops/pallas_conv.py::conv3x3 — identical NDHWC contract)."""
    return _conv3x3_flat_fwd(x, w, bias, activation=activation,
                             negative_slope=negative_slope)


def _flat_vjp_fwd(x, w, bias, activation, negative_slope):
    y = conv3x3_flat(x, w, bias, activation, negative_slope)
    return y, (x, w, bias)


def _flat_vjp_bwd(activation, negative_slope, res, g):
    from fetal_mri_segmentation_tpu.ops import pallas_conv as _pc
    return _pc._bwd(activation, negative_slope, res, g)


conv3x3_flat.defvjp(_flat_vjp_fwd, _flat_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("activations", "negative_slope",
                                             "interpret"))
def conv3x3_chain(x, weights: Sequence, biases: Sequence,
                  activations: Tuple[str, ...] = ("relu",),
                  negative_slope: float = 0.01, interpret=None):
    """Run a chain of 3^3 convs (e.g. a U-Net level's conv pair) in the flat
    layout with ONE conversion at each end.

    x: (B, D, H, W, C0); weights[i]: (3,3,3,Ci,Ci+1); returns NDHWC.
    """
    if interpret is None:
        interpret = (os.environ.get("FETAL_TPU_PALLAS_INTERPRET", "0") == "1")
    B, D, H, W, _ = x.shape
    xf, (H, W, P) = to_flat(x)
    mask = jnp.asarray(_interior_mask(H, W, P))
    for wgt, bias, act in zip(weights, biases, activations):
        xf = _conv_flat(xf, wgt.astype(x.dtype), bias, mask, H=H, W=W,
                        activation=act, negative_slope=negative_slope,
                        interpret=interpret)
    return from_flat(xf, H, W)
