"""Model forward-shape tables + gradient finiteness (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetal_mri_segmentation_tpu.config import Config
from fetal_mri_segmentation_tpu.models import (
    Isensee2017, UNet3D, apply_channels_first, build_model)


@pytest.mark.parametrize("depth,shape", [(3, (16, 16, 16)), (4, (32, 32, 32))])
def test_unet_forward_shapes(depth, shape):
    model = UNet3D(n_labels=1, depth=depth, n_base_filters=4, dtype=jnp.float32)
    x = jnp.zeros((2, *shape, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, *shape, 1)
    assert np.all(np.asarray(y) >= 0) and np.all(np.asarray(y) <= 1)  # sigmoid


def test_unet_multilabel_softmax():
    model = UNet3D(n_labels=3, depth=3, n_base_filters=4,
                   activation_name="softmax", dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 3)
    assert np.allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)


def test_unet_deconvolution_and_norm_options():
    for kw in [dict(deconvolution=True), dict(batch_normalization=True),
               dict(instance_normalization=True)]:
        model = UNet3D(n_labels=1, depth=3, n_base_filters=2,
                       dtype=jnp.float32, **kw)
        x = jnp.zeros((1, 8, 8, 8, 1))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        if kw.get("batch_normalization"):
            y, _ = model.apply(vars_, x, train=True, mutable=["batch_stats"])
        else:
            y = model.apply(vars_, x)
        assert y.shape == (1, 8, 8, 8, 1)


def test_isensee_forward_shape_and_dropout():
    model = Isensee2017(n_labels=2, depth=4, n_base_filters=2,
                        n_segmentation_levels=2, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 2)
    yt = model.apply(params, jnp.ones_like(x), train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert yt.shape == (1, 16, 16, 16, 2)


def test_channels_first_wrapper():
    model = UNet3D(n_labels=1, depth=3, n_base_filters=2, dtype=jnp.float32)
    x_cf = jnp.zeros((2, 1, 8, 8, 8))
    params = model.init(jax.random.PRNGKey(0), jnp.transpose(x_cf, (0, 2, 3, 4, 1)))
    y = apply_channels_first(model, params, x_cf)
    assert y.shape == (2, 1, 8, 8, 8)


def test_gradients_finite():
    from fetal_mri_segmentation_tpu.ops.dice import dice_coefficient_loss
    model = UNet3D(n_labels=1, depth=3, n_base_filters=2, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 8, 8, 8, 1)), jnp.float32)
    t = (x > 0.5).astype(jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        return dice_coefficient_loss(t, model.apply(p, x))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_build_model_factory():
    cfg = Config(model_name="unet", depth=3, n_base_filters=2)
    assert isinstance(build_model(cfg), UNet3D)
    cfg2 = Config(model_name="isensee", n_base_filters=2)
    m2 = build_model(cfg2)
    assert isinstance(m2, Isensee2017)
    assert m2.depth == 5  # isensee default depth
    # an explicitly configured depth is honored verbatim (no sentinel remap)
    cfg3 = Config(model_name="isensee", depth=4, n_base_filters=2)
    assert build_model(cfg3).depth == 4
    assert Config(model_name="unet").depth == 4


def test_isensee_rejects_too_many_seg_levels():
    import pytest as _pytest

    model = Isensee2017(n_labels=1, depth=3, n_base_filters=2,
                        n_segmentation_levels=3, dtype=jnp.float32)
    with _pytest.raises(ValueError, match="n_segmentation_levels"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))


def test_config_roundtrip(tmp_path):
    cfg = Config(image_shape=(96, 96, 96), patch_shape=(32, 32, 32),
                 labels=(1, 2), n_labels=2)
    p = tmp_path / "cfg.json"
    cfg.save(str(p))
    cfg2 = Config.load(str(p))
    assert cfg2.image_shape == (96, 96, 96)
    assert cfg2.input_shape == (1, 32, 32, 32)
    assert cfg2.labels == (1, 2)


def test_fused_decoder_matches_plain_unet():
    """upsample+concat+conv collapsed (fuse_decoder) == plain composition on
    the SAME params (exact math up to fp reassociation)."""
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 16, 16, 16, 1)),
                    jnp.float32)
    plain = UNet3D(n_labels=1, depth=3, n_base_filters=4, dtype=jnp.float32,
                   fuse_decoder=False)
    fused = UNet3D(n_labels=1, depth=3, n_base_filters=4, dtype=jnp.float32,
                   fuse_decoder=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    y_plain = plain.apply(params, x)
    y_fused = fused.apply(params, x)
    assert np.allclose(np.asarray(y_plain), np.asarray(y_fused), atol=1e-5), \
        float(np.abs(np.asarray(y_plain) - np.asarray(y_fused)).max())


def test_fused_decoder_matches_plain_isensee():
    x = jnp.asarray(np.random.default_rng(4).normal(0, 1, (1, 16, 16, 16, 1)),
                    jnp.float32)
    plain = Isensee2017(n_labels=1, depth=3, n_base_filters=4,
                        n_segmentation_levels=2, dtype=jnp.float32,
                        fuse_decoder=False)
    fused = Isensee2017(n_labels=1, depth=3, n_base_filters=4,
                        n_segmentation_levels=2, dtype=jnp.float32,
                        fuse_decoder=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    y_plain = plain.apply(params, x)
    y_fused = fused.apply(params, x)
    assert np.allclose(np.asarray(y_plain), np.asarray(y_fused), atol=1e-5), \
        float(np.abs(np.asarray(y_plain) - np.asarray(y_fused)).max())


def test_isensee_train_eval_decoder_dispatch_same_params():
    """fuse_decoder=True dispatches to the unfused form under train=True
    (measured -5% step, docs/PERF.md addendum 14) — same param tree, same
    output (dropout off so train/eval math is otherwise identical)."""
    x = jnp.asarray(np.random.default_rng(7).normal(0, 1, (1, 16, 16, 16, 1)),
                    jnp.float32)
    model = Isensee2017(n_labels=1, depth=3, n_base_filters=4,
                        n_segmentation_levels=2, dtype=jnp.float32,
                        dropout_rate=0.0, fuse_decoder=True)
    params_train = model.init(jax.random.PRNGKey(0), x, train=True)
    params_eval = model.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(params_train)
            == jax.tree_util.tree_structure(params_eval))
    for a, b in zip(jax.tree_util.tree_leaves(params_train),
                    jax.tree_util.tree_leaves(params_eval)):
        assert a.shape == b.shape
    y_train = model.apply(params_train, x, train=True)
    y_eval = model.apply(params_train, x, train=False)
    assert np.allclose(np.asarray(y_train), np.asarray(y_eval), atol=1e-5), \
        float(np.abs(np.asarray(y_train) - np.asarray(y_eval)).max())


def test_fused_decoder_grads_match_plain():
    x = jnp.asarray(np.random.default_rng(5).normal(0, 1, (1, 8, 8, 8, 1)),
                    jnp.float32)
    y = jnp.asarray((np.random.default_rng(6).random((1, 8, 8, 8, 1)) > 0.5),
                    jnp.float32)
    plain = UNet3D(n_labels=1, depth=2, n_base_filters=2, dtype=jnp.float32,
                   fuse_decoder=False)
    fused = UNet3D(n_labels=1, depth=2, n_base_filters=2, dtype=jnp.float32,
                   fuse_decoder=True)
    params = plain.init(jax.random.PRNGKey(0), x)

    def loss(model):
        return lambda p: ((model.apply(p, x) - y) ** 2).mean()

    g1 = jax.grad(loss(plain))(params)
    g2 = jax.grad(loss(fused))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), \
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
