#!/usr/bin/env python
"""Space-to-depth probe: can channel folding beat the thin-channel floor?

The level-0 convs of the flagship depth-3/32 U-Net run at 8-28% of the
v5e's bf16 peak (docs/PERF.md "Where the device time goes") because 1-64
channels underfill the 128-lane MXU. ops/fold.py reformulates those convs
EXACTLY in folded space (2x per-axis space-to-depth) at a dense-FLOP
multiplier of (4/3)^n_folded (parity forms) or 2^n_folded (dense form).
This probe measures every (fold, formulation) variant on the real TPU
with the in-jit scan protocol (evolving carry + forced host readback —
docs/PERF.md round-3 addendum 6b), per conv shape and for the composed
level-0 encoder/decoder sandwiches including the fold/unfold layout ops.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_fold.py \
        [--section convs|sandwich|train] [--spatial 64] [--batch 1]

Effective TFLOP/s are computed against the NAIVE conv's FLOPs, so a
variant is faster iff its eff number is higher — the dense-FLOP inflation
is the variant's problem, not the metric's.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fetal_mri_segmentation_tpu.ops.fold import (
    conv3_folded, fold, pool_folded, unfold, up_conv3_folded)

DN = ("NDHWC", "DHWIO", "NDHWC")
FACTOR_SETS = [(1, 1, 2), (1, 2, 2), (2, 2, 2)]
FORMS = ["parity", "parity_batched", "dense"]


def scan_time(fn, args, iters=30, warmup=2):
    """tools/bench_dec0.py::scan_time (same hardened protocol)."""

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
    float(s)
    for _ in range(warmup - 1):
        x0, s = run(x0, rest)
        float(s)
    t0 = time.perf_counter()
    x0, s = run(x0, rest)
    float(s)
    return (time.perf_counter() - t0) / iters


def probe_convs(B: int, S: int, dt=jnp.bfloat16):
    """Each level-0 conv shape, naive vs all folded variants."""
    rng = np.random.default_rng(0)
    shapes = [(1, 32), (32, 64), (64, 64)]
    for cin, cout in shapes:
        x = jnp.asarray(rng.normal(size=(B, S, S, S, cin)), dt)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        gflop = 2 * B * S ** 3 * 27 * cin * cout / 1e9

        def naive(x, k, b):
            return jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1, 1), "SAME",
                dimension_numbers=DN) + b.astype(x.dtype)

        t = scan_time(naive, (x, k, b))
        print(f"[{cin:3d}->{cout:3d} @{S}^3 B={B}] naive            "
              f"{t*1e3:8.3f} ms  {gflop/t/1e3:6.1f} T eff", flush=True)

        for factors in FACTOR_SETS:
            xf = fold(x, factors)
            for form in FORMS:
                n_folded = sum(1 for f in factors if f == 2)
                mult = (2.0 ** n_folded if form == "dense"
                        else (4.0 / 3.0) ** n_folded)
                try:
                    t = scan_time(
                        lambda xf, k, b, factors=factors, form=form:
                            conv3_folded(xf, k, b, factors,
                                         formulation=form),
                        (xf, k, b))
                except Exception as e:  # compile failures are results too
                    print(f"    f={factors} {form:<14} FAILED: "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                    continue
                print(f"    f={factors} {form:<14} {t*1e3:8.3f} ms  "
                      f"{gflop/t/1e3:6.1f} T eff  (x{mult:.2f} FLOPs)",
                      flush=True)


def probe_sandwich(B: int, S: int, dt=jnp.bfloat16, form_sel=None):
    """Composed level-0 encoder and decoder, incl. fold/unfold layout ops.

    Encoder: x(B,S^3,1) -> conv1(1->32) -> conv2(32->64) -> pool -> level-1
    input (B,(S/2)^3,64). Decoder: x_deep(B,(S/2)^3,128), skip(B,S^3,64)
    -> up+concat+conv(192->64) -> conv2(64->64) -> head 1^3 (64->n) ->
    sigmoid, at S^3. ReLU between convs as in the model.
    """
    from fetal_mri_segmentation_tpu.models.layers import (
        up_concat_conv3x3, up_concat_conv3x3_dilated)

    rng = np.random.default_rng(1)
    d = S // 2
    n_labels = 2

    x = jnp.asarray(rng.normal(size=(B, S, S, S, 1)), dt)
    k1 = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 32)) * 0.2, jnp.float32)
    b1 = jnp.zeros((32,), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 64)) * 0.1, jnp.float32)
    b2 = jnp.zeros((64,), jnp.float32)

    def enc_naive(x, k1, b1, k2, b2):
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            x, k1.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=DN) + b1.astype(x.dtype))
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            y, k2.astype(y.dtype), (1, 1, 1), "SAME",
            dimension_numbers=DN) + b2.astype(y.dtype))
        return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                                     "VALID")

    t = scan_time(enc_naive, (x, k1, b1, k2, b2))
    print(f"[enc0 @{S}^3 B={B}] naive                      "
          f"{t*1e3:8.3f} ms", flush=True)

    for factors in FACTOR_SETS:
        for form in (form_sel or FORMS):
            def enc_folded(x, k1, b1, k2, b2, factors=factors, form=form):
                yf = fold(x, factors)
                yf = jax.nn.relu(conv3_folded(yf, k1, b1, factors, form))
                yf = jax.nn.relu(conv3_folded(yf, k2, b2, factors, form))
                return pool_folded(yf, factors)
            try:
                t = scan_time(enc_folded, (x, k1, b1, k2, b2))
            except Exception as e:
                print(f"    enc f={factors} {form:<14} FAILED: "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"    enc f={factors} {form:<14}        {t*1e3:8.3f} ms",
                  flush=True)

    x_deep = jnp.asarray(rng.normal(size=(B, d, d, d, 128)), dt)
    skip = jnp.asarray(rng.normal(size=(B, S, S, S, 64)), dt)
    kc = jnp.asarray(rng.normal(size=(3, 3, 3, 192, 64)) * 0.05, jnp.float32)
    bc = jnp.zeros((64,), jnp.float32)
    kd = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 64)) * 0.1, jnp.float32)
    bd = jnp.zeros((64,), jnp.float32)
    kh = jnp.asarray(rng.normal(size=(1, 1, 1, 64, n_labels)) * 0.1,
                     jnp.float32)
    bh = jnp.zeros((n_labels,), jnp.float32)

    def head_naive(y, kh, bh):
        y32 = y.astype(jnp.float32)
        return jax.nn.sigmoid(jax.lax.conv_general_dilated(
            y32, kh, (1, 1, 1), "SAME", dimension_numbers=DN) + bh)

    for name, upimpl in (("parity-ilv", up_concat_conv3x3),
                         ("dilated", up_concat_conv3x3_dilated)):
        def dec_naive(x_deep, skip, kc, bc, kd, bd, kh, bh, upimpl=upimpl):
            y = jax.nn.relu(upimpl(x_deep, skip, kc, bc))
            y = jax.nn.relu(jax.lax.conv_general_dilated(
                y, kd.astype(y.dtype), (1, 1, 1), "SAME",
                dimension_numbers=DN) + bd.astype(y.dtype))
            return head_naive(y, kh, bh)
        t = scan_time(dec_naive, (x_deep, skip, kc, bc, kd, bd, kh, bh))
        print(f"[dec0 @{S}^3 B={B}] naive ({name:<10})      "
              f"{t*1e3:8.3f} ms", flush=True)

    for factors in FACTOR_SETS:
        F = factors[0] * factors[1] * factors[2]
        for form in (form_sel or FORMS):
            def dec_folded(x_deep, skip, kc, bc, kd, bd, kh, bh,
                           factors=factors, form=form, F=F):
                # up half emitted folded; skip half folded conv; shared bias
                skf = fold(skip, factors)
                yf = up_conv3_folded(x_deep, kc[:, :, :, :128, :], factors)
                yf = yf + conv3_folded(skf, kc[:, :, :, 128:, :], None,
                                       factors, form)
                yf = jax.nn.relu(yf + jnp.tile(bc, F).astype(yf.dtype))
                yf = jax.nn.relu(conv3_folded(yf, kd, bd, factors, form))
                # head: per-subvoxel 1^3 conv == 1^3 conv with the kernel
                # block-diagonalized; cheaper as reshape-matmul
                b_, dd, hh, ww, fc = yf.shape
                y32 = yf.reshape(b_, dd, hh, ww, F, fc // F).astype(
                    jnp.float32)
                logits = jnp.einsum("bdhwsc,co->bdhwso", y32,
                                    kh[0, 0, 0]) + bh
                probs = jax.nn.sigmoid(logits)
                return unfold(probs.reshape(b_, dd, hh, ww, -1), factors)
            try:
                t = scan_time(dec_folded,
                              (x_deep, skip, kc, bc, kd, bd, kh, bh))
            except Exception as e:
                print(f"    dec f={factors} {form:<14} FAILED: "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"    dec f={factors} {form:<14}        {t*1e3:8.3f} ms",
                  flush=True)


def probe_train(B: int, S: int, only: str = None, fwd_only: bool = False):
    """Whole-model forward and fwd+bwd: flagship depth-3/32 unet, plain
    vs folded level 0 — the composite's 8 train steps are the dominant
    term, so this is the integration decision's number."""
    from fetal_mri_segmentation_tpu.models.unet3d import UNet3D

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, S, S, S, 1)), jnp.bfloat16)
    tgt = jnp.asarray((rng.random(size=(B, S, S, S, 2)) > 0.7), jnp.float32)

    # "off" explicitly: the model's DEFAULT is fold_level0="auto", which
    # would silently fold the baseline on TPU and void the comparison
    plain = UNet3D(n_labels=2, depth=3, n_base_filters=32,
                   activation_name="sigmoid", dtype=jnp.bfloat16,
                   fold_level0="off")
    params = plain.init(jax.random.PRNGKey(0), x[:1, :32, :32, :32])

    def variants():
        yield "plain", plain
        for factors in FACTOR_SETS:
            for form in ["parity", "dense"]:  # parity_batched: measured
                # negative at the conv level (3-8x slower; vmap lowers to
                # a grouped conv the emitter handles poorly) — excluded
                yield (f"f={factors} {form}",
                       UNet3D(n_labels=2, depth=3, n_base_filters=32,
                              activation_name="sigmoid", dtype=jnp.bfloat16,
                              fold_level0=factors, fold_formulation=form))

    for name, model in variants():
        if only and only not in name.replace(" ", "").replace(",", ""):
            continue

        def fwd(x, params):
            return model.apply(params, x)

        def step(x, params, tgt):
            def loss(p):
                y = model.apply(p, x).astype(jnp.float32)
                num = jnp.sum(y * tgt)
                den = jnp.sum(y) + jnp.sum(tgt) + 1.0
                return 1.0 - 2.0 * num / den
            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.mean(v)
                           for v in jax.tree.leaves(g)).astype(jnp.float32)

        try:
            tf = scan_time(fwd, (x, params), iters=20)
            ts = (None if fwd_only else
                  scan_time(lambda x, p, t: step(x, p, t), (x, params, tgt),
                            iters=20))
        except Exception as e:
            print(f"[model @{S}^3 B={B}] {name:<28} FAILED: "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
            continue
        tail = "" if ts is None else f"   fwd+bwd {ts*1e3:8.3f} ms"
        print(f"[model @{S}^3 B={B}] {name:<28} fwd {tf*1e3:8.3f} ms{tail}",
              flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--section", default="convs",
                    choices=["convs", "sandwich", "train"])
    ap.add_argument("--spatial", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--form", default=None, choices=FORMS,
                    help="restrict sandwich probes to one formulation")
    ap.add_argument("--only", default=None,
                    help="train section: substring filter on the variant "
                         "name with spaces/commas stripped, e.g. 'plain' "
                         "or '(112)dense'")
    ap.add_argument("--fwd-only", action="store_true",
                    help="train section: skip the fwd+bwd program")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if args.section == "convs":
        probe_convs(args.batch, args.spatial)
    elif args.section == "train":
        probe_train(args.batch, args.spatial, only=args.only,
                    fwd_only=args.fwd_only)
    else:
        probe_sandwich(args.batch, args.spatial,
                       form_sel=[args.form] if args.form else None)


if __name__ == "__main__":
    main()
