#!/usr/bin/env python
"""Isensee2017 (BASELINE config #4) step-time attribution on the real TPU.

Applies the docs/PERF.md measurement protocol (in-jit ``lax.scan`` loops
with value-changing carries + forced host readback — isolated-op
microbenchmarks lie on this box's memoizing tunneled runtime) to the
depth-5 Isensee step: where do its ~52 ms go vs the unet's ~31?

Components probed (each an independent jitted scan, 20 iterations):
  fwd              forward, eval mode (no dropout)
  fwd_train        forward, train mode (SpatialDropout masks live)
  fwd_bwd          forward + full grads, grads CONSUMED by the carry
  step             the real train step (Adam update, donated state)
  variants         n_segmentation_levels=1 (deep-supervision chain off),
                   dropout_rate=0 (mask generation off),
                   fuse_decoder=False (upsample-then-conv decoder form),
                   unet depth-3/32 reference point

Usage: python tools/profile_isensee.py [--iters 20] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATCH = (64, 64, 64)


def _scan_time(fn, carry, n_iters, n_timed=3):
    """Median wall of n_timed runs of an n_iters in-jit scan, per iter."""
    import jax

    out = fn(carry)  # compile
    np.asarray(jax.tree_util.tree_leaves(out)[-1])  # forced readback
    times = []
    carry_live = out[0] if isinstance(out, tuple) else carry
    for _ in range(n_timed):
        t0 = time.perf_counter()
        out = fn(carry_live)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
        times.append((time.perf_counter() - t0) / n_iters)
        carry_live = out[0] if isinstance(out, tuple) else carry_live
    return float(np.median(times))


def _forward_loop(model, variables, n_iters, train, rng_needed):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(v, i):
            kw = {"train": train}
            if train and rng_needed:
                y = model.apply(variables, v, rngs={
                    "dropout": jax.random.fold_in(jax.random.PRNGKey(0), i)},
                    **kw)
            else:
                y = model.apply(variables, v, **kw)
            # couple next input to this output (memoization guard)
            return v * 0.999 + y.astype(v.dtype).mean() * 1e-4, y.sum()
        return jax.lax.scan(body, x, jnp.arange(n_iters))
    return loop


def _fwd_bwd_loop(model, variables, n_iters):
    import jax
    import jax.numpy as jnp

    params = variables["params"]

    @jax.jit
    def loop(x):
        def body(carry, i):
            v, acc = carry

            # dropout rng per iter
            def loss_rng(p):
                y = model.apply(
                    {"params": p}, v, train=True,
                    rngs={"dropout": jax.random.fold_in(
                        jax.random.PRNGKey(0), i)})
                y = y.astype(jnp.float32)
                return -(2 * (y * 0.3).sum() + 1) / (y.sum() + 0.3 + 1)

            loss, grads = jax.value_and_grad(loss_rng)(params)
            # CONSUME the grads (else XLA DCEs the whole backward)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return (v * 0.999 + (loss * 1e-5).astype(v.dtype), acc + gsum), loss
        (v, acc), losses = jax.lax.scan(body, (x, jnp.float32(0)),
                                        jnp.arange(n_iters))
        # carry out a PLAIN array (same type as the input) so _scan_time can
        # feed it back in; acc is folded in so the backward is not DCE'd
        return v + (acc * 1e-20).astype(v.dtype), losses
    return loop


def measure(name, make_model_cfg, n_iters):
    import jax
    import jax.numpy as jnp

    from fetal_mri_segmentation_tpu.training import (create_train_state,
                                                     make_train_step)

    model, config = make_model_cfg()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + PATCH + (1,), jnp.float32))
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1,) + PATCH + (1,)).astype(np.float32)).astype(model.dtype)

    row = {}
    row["fwd_eval_ms"] = 1e3 * _scan_time(
        _forward_loop(model, variables, n_iters, False, False), x, n_iters)
    row["fwd_train_ms"] = 1e3 * _scan_time(
        _forward_loop(model, variables, n_iters, True, True), x, n_iters)
    row["fwd_bwd_ms"] = 1e3 * _scan_time(
        _fwd_bwd_loop(model, variables, n_iters), x, n_iters)

    # the real train step (eager loop; dispatch shown hidden in PERF add.4)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    step = make_train_step(model, config)
    rng = np.random.default_rng(0)
    yb = (rng.random((1, 1) + PATCH) > 0.7).astype(np.float32)
    xb = (yb * 2 + rng.normal(0, 0.3, yb.shape)).astype(np.float32)
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)
    key = jax.random.PRNGKey(1)
    state, m = step(state, xb, yb, key, None)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, xb, yb, key, None)
    float(m["loss"])
    row["train_step_ms"] = 1e3 * (time.perf_counter() - t0) / n_iters
    return {k: round(v, 2) for k, v in row.items()}


def measure_grad_depth(n_iters=20):
    """Backward depth profile (docs/PERF.md addendum-1b method): grads wrt
    only the modules at-or-after a cut point, frozen before it. The delta
    over the head-only row (whose backward DCEs to ~the forward) is the
    cost of extending the input-grad/weight-grad chain to that depth."""
    import jax
    import jax.numpy as jnp

    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.models import build_model

    cfg = Config(model_name="isensee", depth=5, n_base_filters=16,
                 patch_shape=PATCH, batch_size=1, compute_dtype="bfloat16",
                 initial_learning_rate=5e-4)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + PATCH + (1,), jnp.float32))
    params = variables["params"]
    x0 = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1,) + PATCH + (1,)).astype(np.float32)).astype(model.dtype)

    # cut points, shallowest-frozen first: grads wrt heads only, then
    # + decoder levels, then + encoder levels (full)
    cuts = [
        ("seg_heads_only", lambda k: k.startswith("seg")),
        ("plus_dec0", lambda k: k.startswith("seg") or k.startswith("dec0")),
        ("plus_decoder", lambda k: k.startswith(("seg", "dec"))),
        ("plus_enc4..2", lambda k: k.startswith(("seg", "dec")) or
            (k.startswith("enc") and int(k[3]) >= 2)),
        ("full", lambda k: True),
    ]
    out = {}
    for name, pred in cuts:
        live = {k: v for k, v in params.items() if pred(k)}
        frozen = {k: v for k, v in params.items() if not pred(k)}

        @jax.jit
        def loop(x, live=live, frozen=frozen):
            def body(carry, i):
                v, acc = carry

                def loss_fn(p):
                    y = model.apply(
                        {"params": {**frozen, **p}}, v, train=True,
                        rngs={"dropout": jax.random.fold_in(
                            jax.random.PRNGKey(0), i)})
                    y = y.astype(jnp.float32)
                    return -(2 * (y * 0.3).sum() + 1) / (y.sum() + 0.3 + 1)

                loss, grads = jax.value_and_grad(loss_fn)(live)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return (v * 0.999 + (loss * 1e-5).astype(v.dtype),
                        acc + gsum), loss
            (v, acc), losses = jax.lax.scan(body, (x, jnp.float32(0)),
                                            jnp.arange(n_iters))
            return v + (acc * 1e-20).astype(v.dtype), losses

        out[name] = {"ms": round(1e3 * _scan_time(loop, x0, n_iters), 2),
                     "n_groups": len(live)}
        print(name, json.dumps(out[name]), flush=True)
    return out


def main(n_iters=20, json_path=None, only=None, grad_depth=False):
    if grad_depth:
        from fetal_mri_segmentation_tpu.utils.compilation_cache import (
            enable_compilation_cache)
        enable_compilation_cache()
        results = measure_grad_depth(n_iters)
        if json_path:
            with open(json_path, "w") as f:
                json.dump(results, f, indent=1)
        return results
    from fetal_mri_segmentation_tpu.config import Config
    from fetal_mri_segmentation_tpu.models import build_model
    from fetal_mri_segmentation_tpu.utils.compilation_cache import (
        enable_compilation_cache)

    enable_compilation_cache()

    def isensee(**kw):
        def make():
            cfg = Config(model_name="isensee", depth=5, n_base_filters=16,
                         patch_shape=PATCH, batch_size=1,
                         compute_dtype="bfloat16",
                         initial_learning_rate=5e-4)
            model = build_model(cfg)
            if kw:
                model = model.clone(**kw)
            return model, cfg
        return make

    def unet(**kw):
        def make():
            cfg = Config(model_name="unet", depth=3, n_base_filters=32,
                         patch_shape=PATCH, batch_size=1,
                         compute_dtype="bfloat16",
                         initial_learning_rate=1e-5)
            model = build_model(cfg)
            if kw:
                model = model.clone(**kw)
            return model, cfg
        return make

    results = {}
    probes = [
        ("isensee_default", isensee()),
        ("isensee_nseg1", isensee(n_segmentation_levels=1)),
        ("isensee_nodropout", isensee(dropout_rate=0.0)),
        ("isensee_unfused_decoder", isensee(fuse_decoder=False)),
        ("unet_d3_ref", unet()),
        # same lever as the Isensee measured dispatch: is the fused
        # decoder's lhs-dilated backward also slower for the unet?
        ("unet_unfused_decoder", unet(fuse_decoder=False)),
    ]
    if only:
        probes = [(n, mk) for n, mk in probes
                  if any(tok in n for tok in only)]
    for name, mk in probes:
        try:
            results[name] = measure(name, mk, n_iters)
        except Exception as e:  # keep probing; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, json.dumps(results[name]), flush=True)
    if json_path:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", default=None)
    ap.add_argument("--only", nargs="+", default=None,
                    help="probe-name substrings to run (compiles on the "
                         "tunneled runtime cost minutes per probe — chunk "
                         "long sessions)")
    ap.add_argument("--grad-depth", action="store_true",
                    help="backward depth profile instead of the variant "
                         "probes (grads wrt progressively deeper param "
                         "groups)")
    a = ap.parse_args()
    main(a.iters, a.json, only=a.only, grad_depth=a.grad_depth)
