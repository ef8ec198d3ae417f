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
                 C, CO, P, W2, activation, negative_slope, out_dtype):
    b = pl.program_id(0)
    d = pl.program_id(1)

    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(d, 3), :, :], slab, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((CO, P), jnp.float32)
    for kd in range(3):
        plane = slab[kd]  # (C, P)
        taps = []
        for kh in range(3):
            for kw in range(3):
                # A[p] = plane[p + shift]: lane rotation; wraparound only
                # touches ring/pad outputs, which the mask re-zeroes.
                shift = (kh - 1) * W2 + (kw - 1)
                taps.append(jnp.roll(plane, -shift, axis=1) if shift
                            else plane)
        a = jnp.concatenate(taps, axis=0)            # (9C, P)
        acc += jax.lax.dot_general(
            w_ref[kd], a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (CO, 9C) @ (9C, P)

    acc = acc + b_ref[:, 0][:, None]
    if activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif activation == "leaky_relu":
        acc = jnp.where(acc > 0, acc, acc * negative_slope)
    acc = acc * mask_ref[0][None, :]                 # re-zero ring + tail pad
    out_ref[...] = acc.reshape(1, 1, CO, P).astype(out_dtype)


def _conv_flat(xf, w, bias, mask, *, H, W, activation, negative_slope,
               interpret):
    """xf: (B, D+2, C, P) -> (B, D+2, CO, P) (border ring zeroed)."""
    B, D2, C, P = xf.shape
    CO = w.shape[-1]
    # (3,3,3,C,CO) -> per-kd (CO, 9C), columns ordered (kh, kw, ci)
    w_k = jnp.transpose(w.reshape(3, 9 * C, CO), (0, 2, 1))
    bias2 = bias.reshape(CO, 1).astype(jnp.float32)

    kernel = functools.partial(_flat_kernel, C=C, CO=CO, P=P, W2=W + 2,
                               activation=activation,
                               negative_slope=negative_slope,
                               out_dtype=xf.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, D2 - 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, CO, 9 * C), lambda b, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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
