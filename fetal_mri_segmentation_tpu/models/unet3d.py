"""Plain 3D U-Net (encoder–decoder with skip concatenation).

Graph parity with the reference (reference: unet3d/model/unet.py::
unet_model_3d, create_convolution_block, get_up_convolution):

- Encoder, per level L in [0, depth): ConvBlock(n_base * 2^L) →
  ConvBlock(n_base * 2^L * 2); MaxPool3D(2) between levels (none after the
  bottom level).
- Decoder, per level L in [depth-2, 0]: up-convolution (transposed conv or
  nearest upsample), concat with the level-L skip on the channel axis, then
  two ConvBlocks with the skip's channel count.
- Head: Conv3D(n_labels, 1x1x1) → sigmoid (or softmax).

TPU-native deltas: NDHWC layout, bf16 compute / fp32 params, fp32 head.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fetal_mri_segmentation_tpu.models.layers import (
    ConvBlock, UpConv, head_activation, max_pool_3d)


class UNet3D(nn.Module):
    """Reference: unet3d/model/unet.py::unet_model_3d (defaults mirrored)."""
    n_labels: int = 1
    depth: int = 4
    n_base_filters: int = 32
    pool_size: Tuple[int, int, int] = (2, 2, 2)
    deconvolution: bool = False
    batch_normalization: bool = False
    instance_normalization: bool = False
    activation_name: str = "sigmoid"
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    use_pallas_dec0: bool = False  # one-program decoder level (ops/pallas_dec0.py)
    bn_axis_name: Any = None  # sync-BN mesh axis under data parallelism
    fuse_decoder: bool = True  # collapse upsample+concat+conv (exact math,
                               # 27->8 taps on the up half; docs/PERF.md)

    def _conv_block(self, f, name):
        return ConvBlock(f, batch_normalization=self.batch_normalization,
                         instance_normalization=self.instance_normalization,
                         dtype=self.dtype, use_pallas=self.use_pallas,
                         use_pallas_dec0=self.use_pallas_dec0,
                         bn_axis_name=self.bn_axis_name, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 logits: bool = False) -> jnp.ndarray:
        """x: (B, D, H, W, C) → (B, D, H, W, n_labels)."""
        x = x.astype(self.dtype)
        skips = []
        for level in range(self.depth):
            f = self.n_base_filters * (2 ** level)
            x = self._conv_block(f, f"enc{level}_conv1")(x, train=train)
            x = self._conv_block(f * 2, f"enc{level}_conv2")(x, train=train)
            if level < self.depth - 1:
                skips.append(x)
                x = max_pool_3d(x, self.pool_size)

        fuse = (self.fuse_decoder and not self.deconvolution
                and self.pool_size == (2, 2, 2))
        for level in range(self.depth - 2, -1, -1):
            skip = skips[level]
            f = skip.shape[-1]
            if fuse:
                # upsample_nearest + concat + conv collapsed into one op
                # (identical math and param tree; see
                # layers.up_concat_conv3x3)
                x = self._conv_block(f, f"dec{level}_conv1")((x, skip),
                                                             train=train)
            else:
                x = UpConv(x.shape[-1], deconvolution=self.deconvolution,
                           size=self.pool_size, dtype=self.dtype,
                           name=f"dec{level}_up")(x)
                x = jnp.concatenate([x, skip], axis=-1)
                x = self._conv_block(f, f"dec{level}_conv1")(x, train=train)
            x = self._conv_block(f, f"dec{level}_conv2")(x, train=train)

        x = nn.Conv(self.n_labels, (1, 1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32, name="head")(x.astype(jnp.float32))
        if logits:
            return x
        return head_activation(x, self.activation_name)
