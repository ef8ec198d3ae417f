"""Shared building blocks for the 3D U-Net family.

TPU-first design notes (not a Keras translation):

- Internal layout is NDHWC (channels-last). XLA's TPU convolution emitter
  tiles the channel dimension onto the 128-wide MXU lanes; channels-last keeps
  C contiguous in lane dimension and avoids per-conv relayouts. The public
  API stays channels-first like the reference (Keras channels_first; see
  models/wrappers) — the transpose happens once at the jit boundary and is
  fused by XLA.
- Params are fp32; compute dtype is configurable (bf16 default) — norm
  statistics and the loss accumulate in fp32.
- InstanceNorm is stateless math (per-sample, per-channel moments over
  D,H,W) — the reference needed keras-contrib for it
  (reference: unet3d/model/unet.py::create_convolution_block,
  keras_contrib InstanceNormalization).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over the spatial axes (D, H, W).

    Matches keras-contrib InstanceNormalization(axis=channel) semantics:
    learned scale/offset per channel, eps inside the sqrt.
    """
    epsilon: float = 1e-3  # keras-contrib default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * gamma + beta
        return y.astype(self.dtype)


class FoldedInstanceNorm(nn.Module):
    """InstanceNorm on a space-to-depth-folded tensor — exact.

    Input (B, d, h, w, F*C) in sub-voxel-major folded layout: per-sample,
    per-ORIGINAL-channel moments over (d, h, w, sub-voxel) are exactly the
    unfolded (D, H, W) moments (the fold is a permutation of the same
    voxels). Params identical to :class:`InstanceNorm` ((C,) scale/bias
    under the same names), so checkpoints interchange with the plain path.
    """
    group: int  # F = prod(fold factors)
    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, fc = x.shape
        c = fc // self.group
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32).reshape(b, d, h, w, self.group, c)
        mean = jnp.mean(xf, axis=(1, 2, 3, 4), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3, 4), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * gamma + beta
        return y.reshape(b, d, h, w, fc).astype(self.dtype)


class _ConvParams(nn.Module):
    """Parameter-only holder mirroring nn.Conv's {"kernel","bias"} layout."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class HeadParams(nn.Module):
    """nn.Conv(features, (1,1,1))-shaped params without the conv op.

    Used by the folded head (models/unet3d.py): the 1^3 conv in folded
    space is a per-sub-voxel matmul against the SAME (1,1,1,C,n) kernel,
    so the op is custom but the checkpoint layout must stay nn.Conv's.
    """
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


def _dilated_backend_ok() -> bool:
    """Gate for the input-dilated decoder dispatch: XLA:CPU lowers
    lhs-dilated convs poorly (measured 2.7× slower DP step on the virtual
    mesh), so only TPU uses the dilated form. Module-level so tests can
    monkeypatch it and exercise the dispatch condition off-TPU."""
    return jax.default_backend() == "tpu"


# trace-time override of the fused-decoder formulation ("parity" |
# "dilated" | None = backend/batch heuristic). The heuristic reads the
# TRACING host's backend, which is wrong for cross-platform exports: a
# TPU-host `jax.export` targeting CPU consumers would bake the lhs-dilated
# form the CPU gate exists to avoid (utils/export.py forces "parity" for
# portable artifacts instead — exact same math, see up_concat_conv3x3).
_DECODER_FORM_OVERRIDE: Optional[str] = None


# trace-time override of space-to-depth folding. "off" forces the plain
# path even where a config requested folding — utils/export.py pins it for
# portable artifacts the same way it pins the decoder form (the folded
# dense conv is a TPU win but a mild CPU loss, and "auto" reads the
# TRACING host's backend).
_FOLD_OVERRIDE: Optional[str] = None

# measured winner of the round-5 space-to-depth probe on v5e
# (docs/PERF.md round-5 addendum 18): fold W into channels, dense-embedded
# kernel — whole-model fwd -7%, fwd+bwd -24% on the flagship unet.
FOLD_AUTO = ((1, 1, 2), "dense")


def _fold_backend_ok() -> bool:
    """Auto-folding applies on TPU only: the dense folded conv trades 2x
    dense FLOPs for full MXU lanes — a measured win on v5e, a measured
    loss on XLA:CPU (tools/probe_fold.py). Module-level so tests can
    monkeypatch it and exercise the auto path off-TPU.

    ``FETAL_TPU_FOLD=off`` in the environment disables auto-folding
    process-wide (A/B measurement + ops escape hatch; explicit config
    tuples still fold)."""
    import os
    if os.environ.get("FETAL_TPU_FOLD", "").lower() == "off":
        return False
    return jax.default_backend() == "tpu"


def resolve_fold(fold_level0, formulation: str, x,
                 extra_gates: bool = True):
    """Resolve a model's ``fold_level0`` setting at trace time.

    Single source for the auto gates shared by UNet3D and Isensee2017
    (models pass their family-specific conditions via ``extra_gates``):
    "auto" folds only for batch-1 programs on a TPU backend with evenly
    divisible folded axes (the measured win bracket — docs/PERF.md
    addenda 18–18d); None/"off" disable; an explicit tuple passes
    through. ``fold_override("off")`` pins everything off.

    Returns ``(factors_or_None, formulation)``.
    """
    ff, form = fold_level0, formulation
    if ff in (None, "off"):
        ff = None
    elif ff == "auto":
        ff, form = FOLD_AUTO
        if not (extra_gates and x.shape[0] == 1 and _fold_backend_ok()
                and all(s % f == 0 for s, f in zip(x.shape[1:4], ff))):
            ff = None
    if _FOLD_OVERRIDE == "off":
        ff = None
    return ff, form


class fold_override:
    """Context manager pinning space-to-depth folding during a trace.

    with fold_override("off"):   # plain convs everywhere (portable export)
        exported = jax.export(...)
    """

    def __init__(self, mode: Optional[str]):
        if mode not in (None, "off"):
            raise ValueError(f"unknown fold override {mode!r}")
        self._mode = mode
        self._prev: Optional[str] = None

    def __enter__(self):
        global _FOLD_OVERRIDE
        self._prev = _FOLD_OVERRIDE
        _FOLD_OVERRIDE = self._mode
        return self

    def __exit__(self, *exc):
        global _FOLD_OVERRIDE
        _FOLD_OVERRIDE = self._prev
        return False


class decoder_form_override:
    """Context manager pinning the fused-decoder formulation during a trace.

    with decoder_form_override("parity"):   # runs everywhere
        exported = jax.export(...)
    """

    def __init__(self, form: Optional[str]):
        if form not in (None, "parity", "dilated"):
            raise ValueError(f"unknown decoder form {form!r}")
        self._form = form
        self._prev: Optional[str] = None

    def __enter__(self):
        global _DECODER_FORM_OVERRIDE
        self._prev = _DECODER_FORM_OVERRIDE
        _DECODER_FORM_OVERRIDE = self._form
        return self

    def __exit__(self, *exc):
        global _DECODER_FORM_OVERRIDE
        _DECODER_FORM_OVERRIDE = self._prev
        return False


class ConvBlock(nn.Module):
    """Conv3D(same) → optional BatchNorm/InstanceNorm → activation.

    Reference: unet3d/model/unet.py::create_convolution_block
    (kernel 3x3x3 default, ReLU default; Isensee variant uses
    InstanceNorm + LeakyReLU, optional stride 2).
    """
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    batch_normalization: bool = False
    instance_normalization: bool = False
    activation: str = "relu"  # "relu" | "leaky_relu" | "none"
    negative_slope: float = 0.3  # Keras LeakyReLU default alpha (the
                                 # reference Isensee blocks use LeakyReLU())
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False  # fused implicit-GEMM conv (ops/pallas_conv.py)
    use_pallas_dec0: bool = False  # single-program decoder level
                                   # (ops/pallas_dec0.py)
    bn_axis_name: Optional[str] = None  # sync-BN: all-reduce the batch
                                        # moments over this mesh axis (DP)
    fold_factors: Optional[Tuple[int, int, int]] = None  # space-to-depth:
        # inputs/outputs live in folded layout (ops/fold.py); kernel 3x3x3
        # stride 1 only; param tree unchanged (the UNFOLDED (3,3,3,Cin,
        # Cout) kernel), so checkpoints/Keras import are unaffected.
    fold_formulation: str = "parity"

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jnp.ndarray:
        if self.fold_factors is not None:
            return self._folded_path(x, train=train)
        if isinstance(x, (tuple, list)):
            # fused upsample(+concat)+conv input: (x_deep, skip-or-None).
            # Same param tree as the plain path (one (3,3,3, Cin, f) kernel
            # over the concat channel order) — see up_concat_conv3x3.
            x_deep, skip = x
            cin = x_deep.shape[-1] + (skip.shape[-1] if skip is not None
                                      else 0)
            kernel, bias = _ConvParams(self.features, name="conv")(cin)
            if skip is not None and self.use_pallas_dec0:
                from fetal_mri_segmentation_tpu.ops.pallas_dec0 import (
                    dec0_available, up_concat_conv3x3_pallas)
                if dec0_available(x_deep.shape, x_deep.shape[-1],
                                  skip.shape[-1], self.features,
                                  jnp.dtype(self.dtype).itemsize,
                                  skip_shape=skip.shape):
                    act_fused = not (self.batch_normalization
                                     or self.instance_normalization)
                    y = up_concat_conv3x3_pallas(
                        x_deep.astype(self.dtype), skip.astype(self.dtype),
                        kernel.astype(self.dtype), bias.astype(jnp.float32),
                        self.activation if act_fused else "none",
                        self.negative_slope)
                    return self._epilogue(y.astype(self.dtype), train=train,
                                          skip_activation=act_fused)
            # Two exact-math formulations of the same op (same params, same
            # result up to fp reassociation); measured on v5e (docs/PERF.md
            # round-3 addendum): the input-dilated single conv wins whenever
            # the MXU has batch to chew on or a backward pass follows
            # (B=27 fwd −6.9%, B=1/8 fwd+bwd −2..3%); the 8-parity decomposed
            # form only wins the B=1 forward-only case (direct/serving path).
            # TPU only: XLA:CPU lowers lhs-dilated convs poorly (measured
            # 2.7× slower DP step on the virtual mesh), so other backends
            # keep the parity form everywhere.
            if _DECODER_FORM_OVERRIDE == "parity":
                impl = up_concat_conv3x3
            elif _DECODER_FORM_OVERRIDE == "dilated":
                impl = up_concat_conv3x3_dilated
            else:
                impl = (up_concat_conv3x3_dilated
                        if (train or x_deep.shape[0] > 1)
                        and _dilated_backend_ok()
                        else up_concat_conv3x3)
            y = impl(
                x_deep.astype(self.dtype),
                None if skip is None else skip.astype(self.dtype),
                kernel.astype(self.dtype), bias.astype(jnp.float32))
            return self._epilogue(y.astype(self.dtype), train=train)
        if self._pallas_eligible(x):
            return self._pallas_path(x, train=train)
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return self._epilogue(x, train=train)

    def _folded_path(self, x, *, train) -> jnp.ndarray:
        """Space-to-depth variants of the conv-block ops (ops/fold.py).

        Exact reformulations on folded activations; the parameters stay in
        the reference layout. Covers: 3^3 stride-1 (enc/dec blocks), the
        fused upsample(+concat)+conv decoder input, 1^3 stride-1
        (Isensee localization tails — a per-sub-voxel matmul), 3^3
        stride-2 (Isensee's down-sampling entry; output UNFOLDED at the
        next level's natural resolution), and InstanceNorm with moments
        over (spatial x sub-voxel) per original channel. BatchNorm's
        running stats have no folded twin — still gated off.
        """
        if self.batch_normalization:
            raise ValueError("fold_factors requires norm-free conv blocks "
                             "(InstanceNorm is supported; BatchNorm is not)")
        from fetal_mri_segmentation_tpu.ops.fold import (
            conv1_folded, conv3_folded, conv3_folded_stride2,
            up_conv3_folded)
        ff = self.fold_factors
        F = ff[0] * ff[1] * ff[2]
        if isinstance(x, (tuple, list)):
            # fused upsample(+concat)+conv: x_deep at cell resolution
            # (unfolded channels), skip in folded layout
            if self.kernel_size != (3, 3, 3) or self.strides != (1, 1, 1):
                raise ValueError("folded fused-decoder input needs a 3x3x3 "
                                 "stride-1 block")
            x_deep, skip = x
            skip_c = 0 if skip is None else skip.shape[-1] // F
            up_ch = x_deep.shape[-1]
            kernel, bias = _ConvParams(self.features, name="conv")(
                up_ch + skip_c)
            y = up_conv3_folded(x_deep.astype(self.dtype),
                                kernel[:, :, :, :up_ch, :].astype(self.dtype),
                                ff)
            if skip is not None:
                y = y + conv3_folded(skip.astype(self.dtype),
                                     kernel[:, :, :, up_ch:, :], None, ff,
                                     formulation=self.fold_formulation)
            y = y + jnp.tile(bias, F).astype(y.dtype)
        elif self.kernel_size == (1, 1, 1) and self.strides == (1, 1, 1):
            kernel, bias = HeadParams(self.features, name="conv")(
                x.shape[-1] // F)
            y = conv1_folded(x.astype(self.dtype), kernel, bias, ff)
        elif self.kernel_size == (3, 3, 3) and self.strides == (1, 1, 1):
            kernel, bias = _ConvParams(self.features, name="conv")(
                x.shape[-1] // F)
            y = conv3_folded(x.astype(self.dtype), kernel, bias, ff,
                             formulation=self.fold_formulation)
        elif self.kernel_size == (3, 3, 3) and self.strides == (2, 2, 2):
            kernel, bias = _ConvParams(self.features, name="conv")(
                x.shape[-1] // F)
            # output is UNFOLDED (the stride lands on the cell grid) —
            # norm/activation below see plain channels, which is exactly
            # what the next (unfolded) level expects
            y = conv3_folded_stride2(x.astype(self.dtype), kernel, bias, ff)
            return self._epilogue(y.astype(self.dtype), train=train)
        else:
            raise ValueError(
                f"fold_factors supports 3x3x3 stride-1/2 and 1x1x1 blocks, "
                f"got kernel {self.kernel_size} strides {self.strides}")
        y = y.astype(self.dtype)
        if self.instance_normalization:
            y = FoldedInstanceNorm(F, dtype=self.dtype, name="in")(y)
            return self._apply_activation(y)
        return self._epilogue(y, train=train)

    def _apply_activation(self, x):
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x

    def _epilogue(self, x, *, train, skip_activation: bool = False):
        """Optional norm + activation after the conv (any conv path)."""
        if self.batch_normalization:
            x = nn.BatchNorm(use_running_average=not train, axis=-1,
                             momentum=0.99, epsilon=1e-3, dtype=jnp.float32,
                             axis_name=self.bn_axis_name,
                             name="bn")(x).astype(self.dtype)
        elif self.instance_normalization:
            x = InstanceNorm(dtype=self.dtype, name="in")(x)
        if skip_activation:
            return x
        return self._apply_activation(x)

    def _pallas_eligible(self, x) -> bool:
        return self._pallas_op(x) is not None

    def _pallas_op(self, x) -> Optional[Callable]:
        """Pick the fused kernel for this conv's shape: the halo-slab kernel
        when C is 128-aligned (no layout conversion), else the flat-plane
        kernel (any C >= 8). None -> plain XLA path."""
        if not self.use_pallas:
            return None
        if self.kernel_size != (3, 3, 3) or self.strides != (1, 1, 1):
            return None
        from fetal_mri_segmentation_tpu.ops.pallas_conv import (
            conv3x3, pallas_conv3x3_available)
        from fetal_mri_segmentation_tpu.ops.pallas_conv_flat import (
            conv3x3_flat, pallas_conv_flat_available)

        if pallas_conv3x3_available(x.shape, x.shape[-1], self.features):
            return conv3x3
        if pallas_conv_flat_available(x.shape, x.shape[-1], self.features,
                                      jnp.dtype(self.dtype).itemsize):
            return conv3x3_flat
        return None

    def _pallas_path(self, x, *, train):
        """Fused conv+bias(+activation) through the Pallas implicit-GEMM
        kernel; param tree identical to the nn.Conv path
        ({"conv": {"kernel", "bias"}}) so checkpoints are interchangeable."""
        conv_op = self._pallas_op(x)
        kernel, bias = _ConvParams(self.features, name="conv")(x.shape[-1])
        act_fused = not (self.batch_normalization
                         or self.instance_normalization)
        y = conv_op(x.astype(self.dtype), kernel.astype(self.dtype),
                    bias.astype(jnp.float32),
                    self.activation if act_fused else "none",
                    self.negative_slope)
        return self._epilogue(y, train=train, skip_activation=act_fused)


def up_concat_conv3x3(x_deep: jnp.ndarray, skip: jnp.ndarray,
                      kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """conv3³(concat([upsample_nearest2(x_deep), skip])) with the upsample
    algebraically collapsed — identical math, ~2× fewer FLOPs.

    Nearest ×2 upsampling makes the 3³ conv redundant: for output parity
    r∈{0,1} per axis, the three taps hit only TWO distinct source voxels
    (floor((p+k-1)/2) with p=2a+r), so

        conv3³(up2(x)) == interleave_r( conv2³(x, Weff_r) )

    with Weff_r[j] = Σ_{k∈G(r,j)} W[k] per axis (G(0,·)={0},{1,2};
    G(1,·)={0,1},{2}). That cuts the up-half of the conv from 27 to 8 MACs
    per output — the full-resolution decoder conv is ~44% of the U-Net's
    forward FLOPs (docs/PERF.md). The skip half stays a plain SAME conv.
    The channel split follows the concat order ``[upsampled, skip]``
    (reference: unet3d/model/unet.py decoder concatenate), so the SAME
    ``(3,3,3, up_ch+skip_ch, f)`` kernel parameter serves both paths —
    checkpoints and the Keras importer are unaffected.
    """
    up_ch = x_deep.shape[-1]
    w_up = kernel[:, :, :, :up_ch, :]

    y_skip = None
    if skip is not None:  # Isensee's up-sampling module has no concat
        w_skip = kernel[:, :, :, up_ch:, :]
        y_skip = jax.lax.conv_general_dilated(
            skip, w_skip.astype(skip.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    # per-axis tap-merge matrices: S[r][j, k] = 1 iff kernel tap k lands on
    # source offset j for output parity r
    S = jnp.asarray([[[1, 0, 0], [0, 1, 1]],
                     [[1, 1, 0], [0, 0, 1]]], kernel.dtype)
    B = x_deep.shape[0]
    d, h, w = x_deep.shape[1:4]
    co = kernel.shape[-1]
    xpad = jnp.pad(x_deep, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    outs = []
    for r1 in range(2):
        for r2 in range(2):
            for r3 in range(2):
                weff = jnp.einsum("ak,bl,cm,klmio->abcio",
                                  S[r1], S[r2], S[r3],
                                  w_up.astype(jnp.float32)).astype(x_deep.dtype)
                xs = jax.lax.slice(
                    xpad, (0, r1, r2, r3, 0),
                    (B, r1 + d + 1, r2 + h + 1, r3 + w + 1, up_ch))
                outs.append(jax.lax.conv_general_dilated(
                    xs, weff, (1, 1, 1), "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    y_up = jnp.stack(outs, axis=1).reshape(B, 2, 2, 2, d, h, w, co)
    y_up = jnp.transpose(y_up, (0, 4, 1, 5, 2, 6, 3, 7)).reshape(
        B, 2 * d, 2 * h, 2 * w, co)
    if y_skip is not None:
        y_up = y_up + y_skip
    return y_up + bias.astype(y_up.dtype)


# Per-axis tap-spread matrix for the input-dilated formulation:
# M[a, j] = 1 iff 3³-kernel tap j contributes to 4³-kernel tap a when the
# nearest-×2 upsample is absorbed into the kernel. Row a covers output
# offset a−1 relative to 2·(source index); taps {0},{0,1},{1,2},{2} —
# exactly the transpose-expansion of up_concat_conv3x3's S matrices
# (S[0] = rows {0,2} of M, S[1] = rows {1,3}).
_DILATE_M = ((1, 0, 0), (1, 1, 0), (0, 1, 1), (0, 0, 1))


def up_concat_conv3x3_dilated(x_deep: jnp.ndarray, skip: jnp.ndarray,
                              kernel: jnp.ndarray,
                              bias: jnp.ndarray) -> jnp.ndarray:
    """Same op as :func:`up_concat_conv3x3`, as ONE input-dilated conv.

    conv3³(up_nearest2(x)) == conv4³(x, M⊗M⊗M·W, lhs_dilation=2, pad 2) —
    the upsample is absorbed into a 4³ kernel over the ×2-dilated input.
    Identical math and FLOPs (the dilated input's zeros are skipped by
    XLA's lowering, which performs the same parity split internally), but
    a 2-op graph instead of the 9-op slice/stack/transpose graph, so XLA
    schedules it better whenever the MXU is busy: measured −6.9% model
    forward at B=27 and −2..3% fwd+bwd at B=1/8 on v5e; the decomposed
    form retains a small edge only for B=1 forward-only (docs/PERF.md
    round-3 addendum). Param layout identical (concat order
    ``[upsampled, skip]``): checkpoints, Keras import, and the Pallas
    dec0 kernel all interoperate unchanged.
    """
    up_ch = x_deep.shape[-1]
    M = jnp.asarray(_DILATE_M, jnp.float32)
    w_up = kernel[:, :, :, :up_ch, :].astype(jnp.float32)
    k4 = jnp.einsum("aj,bk,cl,jklio->abcio", M, M, M,
                    w_up).astype(x_deep.dtype)
    y = jax.lax.conv_general_dilated(
        x_deep, k4, (1, 1, 1), [(2, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if skip is not None:  # Isensee's up-sampling module has no concat
        w_skip = kernel[:, :, :, up_ch:, :]
        y = y + jax.lax.conv_general_dilated(
            skip, w_skip.astype(skip.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias.astype(y.dtype)


class UpConv(nn.Module):
    """Upsampling: transposed conv (kernel=stride=2) or nearest-neighbor repeat.

    Reference: unet3d/model/unet.py::get_up_convolution — Conv3DTranspose(2^3,
    strides 2) when ``deconvolution`` else UpSampling3D(2). With kernel==stride
    the transposed conv has no overlap, so Keras/XLA padding conventions agree
    exactly (output = 2x input).
    """
    features: int
    deconvolution: bool = False
    size: Tuple[int, int, int] = (2, 2, 2)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.deconvolution:
            return nn.ConvTranspose(self.features, kernel_size=self.size,
                                    strides=self.size, padding="VALID",
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name="deconv")(x)
        return upsample_nearest(x, self.size)


def upsample_nearest(x: jnp.ndarray, size: Tuple[int, int, int]) -> jnp.ndarray:
    """UpSampling3D — nearest-neighbor repeat on the spatial axes (NDHWC)."""
    for ax, s in zip((1, 2, 3), size):
        if s != 1:
            x = jnp.repeat(x, s, axis=ax)
    return x


def max_pool_3d(x: jnp.ndarray, window: Tuple[int, int, int] = (2, 2, 2)
                ) -> jnp.ndarray:
    """MaxPooling3D, stride == window (reference: MaxPooling3D(pool_size))."""
    return nn.max_pool(x, window_shape=window, strides=window)


def spatial_dropout_3d(rng: jax.Array, x: jnp.ndarray, rate: float,
                       group: int = 1) -> jnp.ndarray:
    """SpatialDropout3D: drops whole channels (broadcast over D,H,W).

    Reference: isensee2017.py::create_context_module (SpatialDropout3D(0.3),
    channels_first there; channel axis is -1 here).

    ``group > 1``: x is space-to-depth folded (sub-voxel-major, F = group);
    the mask is drawn per ORIGINAL channel and tiled across the sub-voxel
    blocks, so a dropped channel is dropped at every sub-voxel — the same
    semantics (and the same rng consumption) as the unfolded op.
    """
    keep = 1.0 - rate
    c = x.shape[-1] // group
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1, c))
    if group > 1:
        mask = jnp.tile(mask, (1, 1, 1, 1, group))
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def head_activation(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Final activation over the channel axis (NDHWC)."""
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if name in ("none", "linear", None):
        return x
    raise ValueError(f"unknown activation {name!r}")
