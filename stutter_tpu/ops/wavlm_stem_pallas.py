"""Fully-fused Pallas kernel for the WavLM conv feature-encoder stem.

MEASURED NEGATIVE RESULT (scripts/stem_fused_ab.py, v5e, B=128 x 3.2 s,
turbo preset, interleaved loops): stem 48.8 ms fused vs 20.7 ms XLA; end to
end 143.9 vs 116.3 ms (2852 vs 3531 audio-s/s). Fidelity is fine (pooled
embeddings 2.8e-4 vs f32, same as the XLA turbo path) — the loss is purely
throughput. Root cause of the premise error: the XLA stem is NOT 2x above
its FLOP floor — at B=128 x 3.2 s the stem is ~2.0 TFLOP, so 20.7 ms is
~98 TFLOP/s = ~50% MXU utilization already (the "~10.5 ms floor" below
under-counted the k3 convs). The fused kernel's (B x nblk) grid serializes
1280 small-matmul steps whose late layers ([64..16, 512] x [512, 512])
underfill the MXU, and that costs more than the saved HBM traffic. Kept
(with tests) as an off-by-default path: wavlm_forward(use_fused_stem=True);
no production caller enables it.

The XLA stem (models/wavlm.py:conv_feature_encoder) writes every layer's
activation to HBM: at B=128 x 3 s the seven conv outputs total ~2.5 GB of
intermediates per batch (the first 512-channel layer alone is ~1 GB), and
each is re-read by the next conv plus the LN/GELU elementwise chain.

This kernel computes the ENTIRE stem for one (batch row, 16-output-frame
block) in VMEM: the wave's im2col frames stream in (~24 MB for the whole
batch), the [16, 512] output frames stream out (~19 MB), and no intermediate
ever touches HBM. The receptive-field chain for 16 output frames is

    16 <- 32 <- 64 <- 129 <- 259 <- 519 <- 1039 frames <- 5200 samples

(k2s2, k2s2, k3s2, k3s2, k3s2, k3s2, k10s5), i.e. adjacent blocks overlap by
15 layer-0 frames (1.5%) — that halo is duplicated into a blocked im2col
tensor on the XLA side, which costs one ~24 MB copy instead of in-kernel
dynamic DMA.

Each k3 s2 conv is computed as 3 tap matmuls on strided row views (window t
reads rows 2t, 2t+1, 2t+2: taps 0/1 are the columns of a [n/2, 2, C]
reshape, tap 2 is tap 0 shifted by one), k2 s2 as 2 tap matmuls — all MXU
[n, 512] x [512, 512] shapes. LayerNorm statistics compute in f32 on the
VPU; GELU uses the tanh form, matching the bf16 XLA path (_gelu).

LARGE-config only (layer-norm stem): per-frame LN has no time-axis
statistics, so padding needs masking only at the final output (proven
equivalent in scripts/stem_mask_probe.py) — the base config's layer-0 group
norm normalizes over TIME and is excluded (applicability is checked by
fused_stem_applicable; callers fall back to the XLA path).

Inference-only: a raw pallas_call with no custom VJP. The fine-tune path
never sets use_fused_stem (same rule as the long-bucket attention kernel).

Kernel guide: /opt/skills/guides/pallas_guide.md. Reference stem behavior:
HF modeling_wavlm.py:754-789 via /root/reference/WavLM_embeddings.py:482.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The standard wav2vec2-family 7-layer stem geometry (receptive field 400,
# stride 320) this kernel is specialized to.
_KERNELS = (10, 3, 3, 3, 3, 2, 2)
_STRIDES = (5, 2, 2, 2, 2, 2, 2)
_BLOCK_FRAMES = 16  # output frames per grid step
_BLOCK_L0 = 64 * _BLOCK_FRAMES + 15  # layer-0 frames feeding one block
_BLOCK_L0_PAD = _BLOCK_L0 + 1  # rounded to even for the [n/2, 2, C] reshape


def _ln_gelu(acc, vec, out_dtype):
    """conv bias + LayerNorm(f32 stats) + tanh-GELU, matching the XLA path.

    acc: [n, C] f32 matmul accumulator; vec: [3, C] f32 (conv bias, LN scale,
    LN bias)."""
    # XLA path order: the conv emits bf16 (f32 MXU accum, bf16 result), bias
    # adds in bf16, LN recomputes stats in f32 — reproduce the bf16 rounding
    # point so fused == unfused to within one rounding step
    h = acc.astype(out_dtype) + vec[0].astype(out_dtype)[None, :]
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mean), axis=-1, keepdims=True)
    hf = (hf - mean) * jax.lax.rsqrt(var + 1e-5) * vec[1][None, :] + vec[2][None, :]
    return jax.nn.gelu(hf.astype(out_dtype), approximate=out_dtype == jnp.bfloat16)


def _pad_even(x):
    if x.shape[0] % 2:
        x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return x


def _conv_k3s2(x, w3, vec):
    """[n_in, C] -> [(n_in-3)//2+1, C]: 3 tap matmuls on strided row views.

    The zero pad row added when n_in is odd only legalizes the reshape — tap
    index math never reads it."""
    n_out = (x.shape[0] - 3) // 2 + 1
    xr = _pad_even(x).reshape(-1, 2, x.shape[1])
    acc = jax.lax.dot(xr[:n_out, 0], w3[0], preferred_element_type=jnp.float32)
    acc += jax.lax.dot(xr[:n_out, 1], w3[1], preferred_element_type=jnp.float32)
    acc += jax.lax.dot(xr[1 : n_out + 1, 0], w3[2], preferred_element_type=jnp.float32)
    return _ln_gelu(acc, vec, x.dtype)


def _conv_k2s2(x, w2, vec):
    """[n_in, C] -> [n_in//2, C]: non-overlapping windows, 2 tap matmuls."""
    xr = x.reshape(-1, 2, x.shape[1])
    acc = jax.lax.dot(xr[:, 0], w2[0], preferred_element_type=jnp.float32)
    acc += jax.lax.dot(xr[:, 1], w2[1], preferred_element_type=jnp.float32)
    return _ln_gelu(acc, vec, x.dtype)


def _stem_kernel(f0_ref, w0_ref, w14_ref, w56_ref, vec_ref, out_ref):
    # layer 0: [1040, 10] im2col frames x [10, 512] (contraction dim padded
    # by the MXU; layer 0 is ~1% of the stem FLOPs)
    x = _ln_gelu(
        jax.lax.dot(f0_ref[0, 0], w0_ref[:], preferred_element_type=jnp.float32),
        vec_ref[0], out_ref.dtype,
    )[:_BLOCK_L0]  # [1039, 512] (row 1039 is the blocked-load junk row)
    for li in range(4):  # k3 s2 x4: 1039 -> 519 -> 259 -> 129 -> 64
        x = _conv_k3s2(x, w14_ref[li], vec_ref[1 + li])
    for li in range(2):  # k2 s2 x2: 64 -> 32 -> 16
        x = _conv_k2s2(x, w56_ref[li], vec_ref[5 + li])
    out_ref[0] = x


def stem_frames_for_samples(T: int) -> int:
    """Final frame count of the (400, 320) stem floor chain."""
    L = T
    for k, s in zip(_KERNELS, _STRIDES):
        L = (L - k) // s + 1
    return L


def fused_stem_applicable(cfg, n_samples: int, conv_layers) -> bool:
    """True when this kernel exactly reproduces conv_feature_encoder:
    layer-norm stem, standard 7-layer geometry, 512 channels, plain
    (unquantized) weights, and a bucket length the 16-frame blocking tiles."""
    if getattr(cfg, "feat_extract_norm", None) != "layer":
        return False
    if tuple(cfg.conv_kernel) != _KERNELS or tuple(cfg.conv_stride) != _STRIDES:
        return False
    if any(d != cfg.conv_dim[0] for d in cfg.conv_dim) or cfg.conv_dim[0] % 128:
        return False
    if any(isinstance(layer["w"], dict) for layer in conv_layers):
        return False  # int8 stem experiments stay on the XLA path
    L = stem_frames_for_samples(n_samples)
    # exact inverse chain (no dangling remainder samples) + 16-frame tiling:
    # the bucket batcher's frame_align snapping produces exactly this shape
    return L >= _BLOCK_FRAMES and L % _BLOCK_FRAMES == 0 \
        and n_samples == L * 320 + 80


@functools.partial(jax.jit, static_argnames=("interpret",))
def wavlm_fused_stem(
    waveform: jax.Array,  # [B, T] (f32 or bf16)
    conv_layers,  # list of {"w": [O, I, k], "b": [O], "norm": {scale, bias}}
    interpret: bool = False,
) -> jax.Array:
    """Raw wave [B, T] -> stem frames [B, L, C] bf16, all 7 layers fused.

    Caller contract: fused_stem_applicable(...) is True, and the output is
    UNMASKED — callers with padded batches zero frames >= frame_lengths
    themselves (for the layer-norm stem that is equivalent to the XLA path's
    per-layer masking; scripts/stem_mask_probe.py)."""
    B, T = waveform.shape
    C = conv_layers[0]["w"].shape[0]
    L = stem_frames_for_samples(T)
    nblk = L // _BLOCK_FRAMES
    dtype = jnp.bfloat16

    # --- XLA-side prologue: layer-0 im2col, blocked with the 15-frame halo.
    # k10 s5 windows of the bf16 wave: [B, L0, 10] with L0 = 64L + 15, padded
    # by one junk row so every block can load a full [1040, 10] tile.
    from stutter_tpu.models.wavlm import _stem_im2col

    f0 = _stem_im2col(waveform[:, :, None].astype(dtype), 10, 5)
    f0 = jnp.pad(
        f0, ((0, 0), (0, (nblk - 1) * 1024 + _BLOCK_L0_PAD - f0.shape[1]), (0, 0)))
    f0 = jnp.stack(
        [jax.lax.slice_in_dim(f0, 1024 * i, 1024 * i + _BLOCK_L0_PAD, axis=1)
         for i in range(nblk)],
        axis=1,
    )  # [B, nblk, 1040, 10]

    # --- weight packing (VMEM-resident across the whole grid: every index
    # map below is constant, so Pallas fetches each once)
    def taps(w_oik):  # [O, I, k] -> [k, I, O]
        return jnp.transpose(w_oik, (2, 1, 0)).astype(dtype)

    w0 = taps(conv_layers[0]["w"])[:, 0, :]  # [10, C]
    w14 = jnp.stack([taps(conv_layers[i]["w"]) for i in range(1, 5)])  # [4,3,C,C]
    w56 = jnp.stack([taps(conv_layers[i]["w"]) for i in range(5, 7)])  # [2,2,C,C]
    vec = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.asarray(layer["b"], jnp.float32)
                    if layer.get("b") is not None
                    else jnp.zeros((C,), jnp.float32),
                    jnp.asarray(layer["norm"]["scale"], jnp.float32),
                    jnp.asarray(layer["norm"]["bias"], jnp.float32),
                ]
            )
            for layer in conv_layers
        ]
    )  # [7, 3, C] f32

    return pl.pallas_call(
        _stem_kernel,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, _BLOCK_L0_PAD, 10), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 3, C, C), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, C, C), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, 3, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_FRAMES, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), dtype),
        interpret=interpret,
    )(f0, w0, w14, w56, vec)
