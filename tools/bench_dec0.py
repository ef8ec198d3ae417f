#!/usr/bin/env python
"""Attribution microbench for the dec0 decoder conv (the one quantified
perf lever left per docs/PERF.md "What would move the needle").

Measures, with the in-jit scan protocol (evolving carry defeats the
runtime's memoization; dispatch amortized):

  1. plain 27-tap 192->64 @64^3 conv (XLA)       — the pre-fusion baseline
  2. up_concat_conv3x3 (parity-decomposed, XLA)  — what ships today
  3. its pieces: 8 parity convs / skip conv / interleave
  4. the Pallas flat kernel on the plain conv    — prior kernel reference
  5. (when present) the fused parity-block Pallas kernel

plus the HBM/MXU roofline for each formulation. Run on the TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_dec0.py [--batch 1]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, args, iters=30, warmup=2):
    """Wall time per iteration of fn inside one jitted lax.scan, with the
    output coupled into the next input (docs/PERF.md methodology).

    Round-3 measurement gotchas on the tunneled runtime (both produce
    microsecond-scale fantasy numbers if violated):
    - the carry-coupling coefficients must be LARGE enough to actually
      change bf16 values (eps ~0.8%; a 1e-6 nudge underflows, the carry
      never changes, and the runtime memoizes every later execution);
    - ``block_until_ready`` no longer blocks for real on this runtime
      build — completion must be forced by a host readback (``float()``
      of a scalar output).
    """

    @jax.jit
    def run(x0, rest):
        def body(x, _):
            y = fn(x, *rest)
            x = x * 0.99 + 0.05 * jnp.mean(y).astype(x.dtype)
            return x, ()
        x, _ = jax.lax.scan(body, x0, None, length=iters)
        return x, jnp.sum(x).astype(jnp.float32)

    x0, *rest = args
    x0, s = run(x0, rest)
    float(s)  # compile + warm; host readback forces completion
    for _ in range(warmup - 1):
        x0, s = run(x0, rest)
        float(s)
    t0 = time.perf_counter()
    x0, s = run(x0, rest)
    float(s)
    return (time.perf_counter() - t0) / iters


def main(batch: int):
    from fetal_mri_segmentation_tpu.models.layers import up_concat_conv3x3

    rng = np.random.default_rng(0)
    B, d = batch, 32            # coarse 32^3 -> fine 64^3
    ci_up, ci_skip, co = 128, 64, 64
    dt = jnp.bfloat16

    x_deep = jnp.asarray(rng.normal(size=(B, d, d, d, ci_up)), dt)
    skip = jnp.asarray(rng.normal(size=(B, 2 * d, 2 * d, 2 * d, ci_skip)), dt)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, ci_up + ci_skip, co))
                         * 0.05, jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)

    gflop_plain = (2 * B * (2 * d) ** 3 * 27 * (ci_up + ci_skip) * co) / 1e9
    gflop_fused = (2 * B * (2 * d) ** 3 * (8 * ci_up + 27 * ci_skip) * co
                   ) / 1e9
    print(f"B={B}  plain {gflop_plain:.1f} GFLOP   "
          f"parity-fused {gflop_fused:.1f} GFLOP")

    # 1. plain conv on the materialized upsample+concat
    def plain(x, s, w, b):
        up = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
        cat = jnp.concatenate([up, s], axis=-1)
        return jax.lax.conv_general_dilated(
            cat, w.astype(cat.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b.astype(cat.dtype)

    t = scan_time(plain, (x_deep, skip, kernel, bias))
    print(f"plain up+concat+conv (XLA):      {t*1e3:8.2f} ms  "
          f"{gflop_plain/t/1e3:6.1f} TFLOP/s")

    # 2. shipped parity decomposition
    t = scan_time(lambda x, s, w, b: up_concat_conv3x3(x, s, w, b),
                  (x_deep, skip, kernel, bias))
    print(f"up_concat_conv3x3 (XLA, ships):  {t*1e3:8.2f} ms  "
          f"{gflop_fused/t/1e3:6.1f} TFLOP/s eff")

    # 2b. input-dilated single-conv formulation (models/layers.py)
    from fetal_mri_segmentation_tpu.models.layers import (
        up_concat_conv3x3_dilated)
    t = scan_time(lambda x, s, w, b: up_concat_conv3x3_dilated(x, s, w, b),
                  (x_deep, skip, kernel, bias))
    print(f"up_concat_conv3x3_dilated (XLA): {t*1e3:8.2f} ms  "
          f"{gflop_fused/t/1e3:6.1f} TFLOP/s eff")

    # 2c. fwd+bwd for both exact-math formulations (training dispatch)
    def fb(impl):
        def f(x, s, w, b):
            def loss(args):
                xx, ss, ww = args
                return jnp.sum(impl(xx, ss, ww, b).astype(jnp.float32)) * 1e-6
            l, g = jax.value_and_grad(loss)((x, s, w))
            return l + jnp.mean(g[2])
        return f
    t = scan_time(fb(up_concat_conv3x3), (x_deep, skip, kernel, bias))
    print(f"  fwd+bwd parity form:           {t*1e3:8.2f} ms")
    t = scan_time(fb(up_concat_conv3x3_dilated), (x_deep, skip, kernel, bias))
    print(f"  fwd+bwd dilated form:          {t*1e3:8.2f} ms")

    # 3a. skip half only
    def skip_half(s, w, b):
        wk = w[:, :, :, ci_up:, :]
        return jax.lax.conv_general_dilated(
            s, wk.astype(s.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    gf_skip = 2 * B * (2 * d) ** 3 * 27 * ci_skip * co / 1e9
    t = scan_time(skip_half, (skip, kernel, bias))
    print(f"  skip half 64->64@64^3 (XLA):   {t*1e3:8.2f} ms  "
          f"{gf_skip/t/1e3:6.1f} TFLOP/s")

    # 3b. up half only (8 parity convs + interleave)
    def up_half(x, w, b):
        return up_concat_conv3x3(x, None, w[:, :, :, :ci_up, :],
                                 jnp.zeros((co,), jnp.float32))
    gf_up = 2 * B * (2 * d) ** 3 * 8 * ci_up * co / 1e9
    t = scan_time(up_half, (x_deep, kernel, bias))
    print(f"  up half (8 parity convs+ilv):  {t*1e3:8.2f} ms  "
          f"{gf_up/t/1e3:6.1f} TFLOP/s")

    # 3c. interleave alone (data movement of the 8 parity outputs)
    def interleave(parts):
        y = jnp.transpose(parts.reshape(B, 2, 2, 2, d, d, d, co),
                          (0, 4, 1, 5, 2, 6, 3, 7))
        return y.reshape(B, 2 * d, 2 * d, 2 * d, co)
    parts = jnp.asarray(rng.normal(size=(B, 8, d, d, d, co)), dt)
    t = scan_time(lambda p: interleave(p), (parts,))
    print(f"  interleave only:               {t*1e3:8.2f} ms")

    # 4. Pallas flat kernel on the plain formulation (reference)
    from fetal_mri_segmentation_tpu.ops.pallas_conv_flat import (
        conv3x3_flat, pallas_conv_flat_available)
    if pallas_conv_flat_available((B, 2 * d, 2 * d, 2 * d, ci_up + ci_skip),
                                  ci_up + ci_skip, co):
        def plain_pallas(x, s, w, b):
            up = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
            cat = jnp.concatenate([up, s], axis=-1)
            return conv3x3_flat(cat, w, b, "none", 0.0)
        t = scan_time(plain_pallas, (x_deep, skip, kernel, bias))
        print(f"plain conv via Pallas flat:      {t*1e3:8.2f} ms  "
              f"{gflop_plain/t/1e3:6.1f} TFLOP/s")

    # 5. fused parity-block Pallas kernel, if built
    try:
        from fetal_mri_segmentation_tpu.ops.pallas_dec0 import (
            dec0_available, up_concat_conv3x3_pallas)
    except ImportError:
        print("(pallas_dec0 not built yet)")
        return
    if dec0_available((B, d, d, d, ci_up), ci_up, ci_skip, co):
        t = scan_time(
            lambda x, s, w, b: up_concat_conv3x3_pallas(x, s, w, b),
            (x_deep, skip, kernel, bias))
        print(f"fused parity-block Pallas:       {t*1e3:8.2f} ms  "
              f"{gflop_fused/t/1e3:6.1f} TFLOP/s eff")
        # correctness: both bf16 paths vs the fp32 oracle (reduction-order
        # noise shows up as comparable oracle distance, not path skew)
        oracle = up_concat_conv3x3(
            x_deep.astype(jnp.float32), skip.astype(jnp.float32),
            kernel, bias).astype(jnp.float32)
        a = up_concat_conv3x3(x_deep, skip, kernel, bias).astype(jnp.float32)
        bres = up_concat_conv3x3_pallas(x_deep, skip, kernel,
                                        bias).astype(jnp.float32)
        scale = float(jnp.std(oracle))
        print(f"  rel err vs fp32 oracle: xla "
              f"{float(jnp.max(jnp.abs(a - oracle)))/scale:.4f}  pallas "
              f"{float(jnp.max(jnp.abs(bres - oracle)))/scale:.4f}  "
              f"(xla-vs-pallas {float(jnp.max(jnp.abs(a - bres)))/scale:.4f})")
    else:
        print("(pallas_dec0 not eligible for this shape)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    main(args.batch)
