#!/usr/bin/env python
"""Probe: does int8 buy anything on this TPU's convs? (v5e MXU lists 2x
int8 peak vs bf16.)

Measures, with the in-jit scan protocol (tools/bench_dec0.py::scan_time):

  1. a large square matmul, bf16 vs int8xint8->int32 (does the stack map
     int8 dot_general to the double-rate MXU path at all?)
  2. the hot conv shape (192->64 @ 64^3, the dec0 level), bf16 vs int8
  3. the full depth-3 U-Net forward at the inference batch shape (B=27),
     bf16 vs a w8a8-quantized variant (per-layer symmetric scales)

If (1) or (2) shows ~2x, a quantized serving path is worth building; if
not, this file is the committed negative result.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_int8.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_dec0 import scan_time


def probe_matmul(n=4096):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
    gflop = 2 * n ** 3 / 1e9

    t = scan_time(lambda x, y: jnp.dot(x, y).astype(jnp.bfloat16) * 0.01,
                  (a, b))
    print(f"matmul {n}^3 bf16:            {t*1e3:8.2f} ms  "
          f"{gflop/t/1e3:6.1f} TFLOP/s")

    ai = jnp.asarray(rng.integers(-127, 127, size=(n, n)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 127, size=(n, n)), jnp.int8)

    def int8_mm(x, y):
        o = jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # couple through int8 so the carry stays int8 (scan_time multiplies
        # the carry by 0.99 — keep it float-free by reinterpreting)
        return (o // (127 * n)).astype(jnp.int8)

    # scan_time's carry update (x*0.99 + 0.05*mean) doesn't work on int8;
    # use a local scan with int arithmetic instead
    import time

    @jax.jit
    def run(x0, y):
        def body(x, _):
            o = int8_mm(x, y)
            return o, ()
        x, _ = jax.lax.scan(body, x0, None, length=30)
        return x, jnp.sum(x.astype(jnp.int32))

    x, s = run(ai, bi)
    int(s)
    t0 = time.perf_counter()
    x, s = run(x, bi)
    int(s)
    t = (time.perf_counter() - t0) / 30
    print(f"matmul {n}^3 int8->int32:     {t*1e3:8.2f} ms  "
          f"{gflop/t/1e3:6.1f} TOP/s")


def probe_conv():
    rng = np.random.default_rng(0)
    B, D, Ci, Co = 1, 64, 192, 64
    x = jnp.asarray(rng.normal(size=(B, D, D, D, Ci)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.05, jnp.bfloat16)
    gflop = 2 * B * D ** 3 * 27 * Ci * Co / 1e9

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    t = scan_time(lambda x, w: conv(x, w) * 0.01, (x, w))
    print(f"conv 192->64@64^3 bf16:       {t*1e3:8.2f} ms  "
          f"{gflop/t/1e3:6.1f} TFLOP/s")

    xi = jnp.asarray(rng.integers(-127, 127, size=(B, D, D, D, Ci)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, size=(3, 3, 3, Ci, Co)), jnp.int8)

    import time

    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32)

    @jax.jit
    def run(x0, w):
        def body(x, _):
            o = conv_i8(x, w)
            # couple output back into the (wider) input carry: tile the
            # 64-channel result to 192 channels and add
            upd = jnp.tile((o // (127 * 27 * Ci)).astype(jnp.int8),
                           (1, 1, 1, 1, Ci // Co))
            return x + upd, ()
        x, _ = jax.lax.scan(body, x0, None, length=30)
        return x, jnp.sum(x.astype(jnp.int32))

    try:
        xx, s = run(xi, wi)
        int(s)
        t0 = time.perf_counter()
        xx, s = run(xx, wi)
        int(s)
        t = (time.perf_counter() - t0) / 30
        print(f"conv 192->64@64^3 int8:       {t*1e3:8.2f} ms  "
              f"{gflop/t/1e3:6.1f} TOP/s")
    except Exception as e:
        print(f"conv int8: FAILED to lower/run: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    probe_matmul()
    probe_conv()
