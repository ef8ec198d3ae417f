"""Export this framework's weights back to a Keras model (reverse migration).

Counterpart of `utils/keras_import.py`: users coming FROM the reference can
pull their `.h5` in; users who train HERE but keep reference-era tooling
(Keras inference scripts, `load_old_model` pipelines — reference:
unet3d/training.py::load_old_model) can push weights back out. The mapping
inverts the exact transforms the importer applies (Conv3DTranspose spatial
flip + channel swap included) and is verified by forward-parity round-trip
tests against Keras itself (tests/test_keras_import.py).

Both functions SET weights in place on an already-built twin Keras model
(e.g. `baseline_keras.build_keras_unet3d`, or the user's own reference
graph); call ``keras_model.save(...)`` afterwards to produce the `.h5`.
"""

from __future__ import annotations

from typing import List

import numpy as np

from fetal_mri_segmentation_tpu.utils.keras_import import (
    _is_conv, _is_norm, _isensee_param_order, _unet_param_order)


def _weighted_layers(keras_model) -> List[object]:
    return [l for l in keras_model.layers if l.get_weights()]


def _set_weights(layer, arrays) -> None:
    layer.set_weights([np.asarray(a, np.float32) for a in arrays])


def export_keras_unet_weights(params: dict, keras_model,
                              assign=_set_weights) -> None:
    """Write a UNet3D params tree onto a twin Keras plain-UNet, in place.

    ``params``: ``variables["params"]`` of our `models.UNet3D` (no
    batch/instance norm — mirror of `import_keras_unet_weights`'s scope).
    ``assign(layer, arrays)`` receives the layout-transformed arrays per
    layer; the default sets the layer weights, `utils/keras_opt.py`
    redirects the same traversal at Adam slot variables.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, dict(params))
    for k, sub in params.items():
        if isinstance(sub, dict) and ("bn" in sub or "in" in sub):
            raise ValueError(
                f"{k}: params contain normalization variables — this "
                f"plain-UNet exporter maps conv weights only")
    order = _unet_param_order(params)

    layers = _weighted_layers(keras_model)
    if any(_is_norm(type(l).__name__) for l in layers):
        raise ValueError(
            "keras model contains normalization layers — not a plain-UNet "
            "twin; for Isensee use export_keras_isensee_weights")
    transpose_q = [l for l in layers
                   if "transpose" in type(l).__name__.lower()]
    conv_q = [l for l in layers if _is_conv(type(l).__name__)]
    n_deconv = sum(1 for k in order if "deconv" in params.get(k, {}))
    if len(transpose_q) != n_deconv or len(conv_q) != len(order) - n_deconv:
        raise ValueError(
            f"layer count mismatch: keras model has {len(conv_q)} conv + "
            f"{len(transpose_q)} transpose layers, our UNet3D provides "
            f"{len(order) - n_deconv} + {n_deconv} ({order}) — check "
            f"depth/deconvolution settings")

    for target in order:
        sub = params[target]
        if "deconv" in sub:
            layer = transpose_q.pop(0)
            k = np.asarray(sub["deconv"]["kernel"], np.float32)
            # inverse of the import transform (keras (k..., out, in) with
            # mirrored taps): undo the spatial flip, then swap the channel
            # axes back.
            kernel = np.transpose(k[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
            bias = sub["deconv"]["bias"]
        else:
            layer = conv_q.pop(0)
            payload = sub if "kernel" in sub else sub["conv"]
            kernel, bias = payload["kernel"], payload["bias"]
        want = layer.get_weights()[0].shape
        if tuple(kernel.shape) != tuple(want):
            raise ValueError(
                f"{target}: kernel shape {kernel.shape} != keras layer "
                f"{layer.name} expects {tuple(want)}")
        assign(layer, [np.ascontiguousarray(kernel, np.float32),
                       np.asarray(bias, np.float32)])


def export_keras_isensee_weights(params: dict, keras_model,
                                 assign=_set_weights) -> None:
    """Write an Isensee2017 params tree onto a twin Keras graph, in place.

    Pairs each Keras conv with its immediately-following InstanceNorm
    (GroupNormalization(groups=-1)) as one conv block and treats bare 1^3
    convs as segmentation heads — the same structural invariant
    `import_keras_isensee_weights` relies on. ``assign`` as in
    `export_keras_unet_weights`.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, dict(params))
    block_order, head_order = _isensee_param_order(params)

    layers = _weighted_layers(keras_model)
    blocks_q, heads_q = [], []
    i = 0
    while i < len(layers):
        name = type(layers[i]).__name__
        if _is_conv(name):
            if (i + 1 < len(layers)
                    and _is_norm(type(layers[i + 1]).__name__)):
                blocks_q.append((layers[i], layers[i + 1]))
                i += 2
                continue
            heads_q.append(layers[i])
        elif not _is_norm(name):
            raise ValueError(
                f"unexpected weight-bearing keras layer {layers[i].name} "
                f"({name}) — not an Isensee2017 twin")
        i += 1

    if len(blocks_q) != len(block_order) or len(heads_q) != len(head_order):
        raise ValueError(
            f"layer count mismatch: keras model has {len(blocks_q)} "
            f"conv+norm blocks and {len(heads_q)} bare segmentation convs, "
            f"our Isensee2017 provides {len(block_order)} blocks and "
            f"{len(head_order)} heads — check depth/n_segmentation_levels")

    for target, (conv_l, norm_l) in zip(block_order, blocks_q):
        sub = params[target]
        kernel = np.ascontiguousarray(sub["conv"]["kernel"], np.float32)
        if tuple(kernel.shape) != tuple(conv_l.get_weights()[0].shape):
            raise ValueError(
                f"{target}: kernel shape {kernel.shape} != keras layer "
                f"{conv_l.name} expects "
                f"{tuple(conv_l.get_weights()[0].shape)}")
        assign(conv_l, [kernel,
                        np.asarray(sub["conv"]["bias"], np.float32)])
        assign(norm_l, [np.asarray(sub["in"]["scale"], np.float32),
                        np.asarray(sub["in"]["bias"], np.float32)])
    for target, layer in zip(head_order, heads_q):
        sub = params[target]
        assign(layer, [np.ascontiguousarray(sub["kernel"], np.float32),
                       np.asarray(sub["bias"], np.float32)])
