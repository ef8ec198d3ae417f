"""Import reference (Keras) 3D U-Net weights into this framework.

Migration path for users of the reference: their trained model is one Keras
``.h5`` (reference: unet3d/training.py::load_old_model — keras load_model on
ModelCheckpoint output). This module maps those weights onto our flax
``UNet3D`` parameters so inference/fine-tuning continues here without
retraining — and the mapping is verified numerically against Keras itself in
tests/test_keras_import.py (forward-parity, including the
Conv3DTranspose kernel-layout difference flagged in SURVEY.md section 7).

Layout facts used:
- Keras Conv3D kernel: ``(kd, kh, kw, c_in, c_out)`` — identical to flax
  ``nn.Conv`` (NDHWC), copied as-is.
- Keras Conv3DTranspose kernel: ``(kd, kh, kw, c_out, c_in)`` — transposed on
  the last two axes relative to flax ``nn.ConvTranspose``'s
  ``(kd, kh, kw, c_in, c_out)``.
- The reference trains channels_first, but Keras stores conv kernels in the
  same (spatial..., in, out) order regardless of data_format; only the
  channel axis of inputs differs, which our channels-first wrapper already
  handles.

Weight ordering: the reference's ``unet_model_3d`` builds layers in a
deterministic order (encoder conv pairs top-down, then per decoder level an
up-conv + two convs, then the 1^3 head — SURVEY.md section 3.5). We traverse
our parameter tree in that same order and zip with the Keras weight list.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def keras_weight_list_from_model(keras_model) -> List[Tuple[str, list]]:
    """[(layer_name, [weights...])] for layers that have weights, in build order."""
    out = []
    for layer in keras_model.layers:
        w = layer.get_weights()
        if w:
            out.append((layer.__class__.__name__, w))
    return out


def keras_weight_list_from_h5(path: str) -> List[Tuple[str, list]]:
    """Read a Keras-saved weights HDF5 (legacy ``model_weights`` layout or
    Keras 3 ``.weights.h5`` with ``layers/<name>/vars``) into
    [(layer_name, [weights...])].

    Order caveat: HDF5 group iteration is alphabetical, so same-type layers
    come back in numeric-suffix order (conv3d, conv3d_1, ...) but different
    types are NOT interleaved in build order — `import_keras_unet_weights`
    therefore matches by TYPE QUEUE, not by global position.
    """
    import h5py

    def suffix_index(name: str) -> int:
        tail = name.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else 0

    out = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        if "layer_names" in root.attrs:  # legacy TF1/TF2 format (build order)
            for lname in root.attrs["layer_names"]:
                lname = lname.decode() if isinstance(lname, bytes) else lname
                g = root[lname]
                wnames = [n.decode() if isinstance(n, bytes) else n
                          for n in g.attrs.get("weight_names", [])]
                if wnames:
                    out.append((lname, [np.asarray(g[n]) for n in wnames]))
        elif "layers" in root:  # Keras 3 .weights.h5
            layers_grp = root["layers"]
            names = sorted(layers_grp.keys(),
                           key=lambda n: (n.rstrip("0123456789_"),
                                          suffix_index(n)))
            for lname in names:
                g = layers_grp[lname]
                if "vars" in g and len(g["vars"]):
                    ws = [np.asarray(g["vars"][k])
                          for k in sorted(g["vars"], key=int)]
                    out.append((lname, ws))
        else:
            raise ValueError(f"{path}: unrecognized Keras weights layout")
    return out


def _unet_param_order(params: dict) -> List[str]:
    """Our UNet3D module names in the reference's layer-creation order."""
    enc = sorted(k for k in params if k.startswith("enc"))
    dec = sorted((k for k in params if k.startswith("dec")), reverse=True)

    def level(k):
        return int(k[3])

    order = []
    for lvl in sorted({level(k) for k in enc}):
        order += [f"enc{lvl}_conv1", f"enc{lvl}_conv2"]
    for lvl in sorted({level(k) for k in dec}, reverse=True):
        if f"dec{lvl}_up" in params:
            order.append(f"dec{lvl}_up")
        order += [f"dec{lvl}_conv1", f"dec{lvl}_conv2"]
    order.append("head")
    return [k for k in order if k in params]


def import_keras_unet_weights(params: dict, keras_weights: Sequence[Tuple[str, list]]
                              ) -> dict:
    """Map Keras conv weights (build order) onto a UNet3D params tree.

    ``params``: the flax params dict (``variables["params"]``). Returns a new
    tree with kernels/biases replaced. Layers without weights (pooling,
    upsampling, concat, activations) must already be absent from
    ``keras_weights``.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, dict(params))
    order = _unet_param_order(params)

    # split the keras layers into type queues (same-type order is reliable
    # both in build order and in alphabetical h5 order).
    transpose_q = [(n, w) for n, w in keras_weights
                   if "transpose" in n.lower()]
    conv_q = [(n, w) for n, w in keras_weights
              if "transpose" not in n.lower()]
    n_deconv = sum(1 for k in order if "deconv" in params.get(k, {}))
    if len(transpose_q) != n_deconv or len(conv_q) != len(order) - n_deconv:
        raise ValueError(
            f"weight count mismatch: keras has {len(conv_q)} conv + "
            f"{len(transpose_q)} transpose layers, our UNet3D expects "
            f"{len(order) - n_deconv} + {n_deconv} ({order}) — check "
            f"depth/deconvolution settings")

    new = {k: dict(v) for k, v in params.items()}
    for target in order:
        sub = new[target]
        if "deconv" in sub:
            lname, weights = transpose_q.pop(0)
            # Keras Conv3DTranspose kernel (k..., out, in) realizes
            # out[s*i+a] += in[i] * K[a, o, c]; flax ConvTranspose
            # (transpose_kernel=False) uses the mirrored taps, so map with a
            # channel swap AND a spatial flip (verified exact in
            # tests/test_keras_import.py).
            kernel = np.transpose(weights[0], (0, 1, 2, 4, 3))[::-1, ::-1, ::-1]
            slot = "deconv"
        else:
            lname, weights = conv_q.pop(0)
            kernel = weights[0]
            slot = None if "kernel" in sub else "conv"
        bias = weights[1]
        want = np.asarray(sub[slot]["kernel"] if slot else sub["kernel"]).shape
        if kernel.shape != want:
            raise ValueError(
                f"{target}: kernel shape {kernel.shape} != expected {want} "
                f"(keras layer {lname})")
        payload = {"kernel": np.ascontiguousarray(kernel, np.float32),
                   "bias": bias.astype(np.float32)}
        new[target] = payload if slot is None else {**sub, slot: payload}
    return new
