"""Perceiver encoder in flax.

Native equivalent of the external ``perceiver_pytorch.Perceiver`` as consumed
by the reference (reference ``models/perceiver/perceiver.py:70-80``:
``input_channels, input_axis=2, num_freq_bands=6, max_freq=10, depth,
num_latents, latent_dim, num_classes, weight_tie_layers=True``), matching
that library's architecture and defaults:

* Fourier position encoding: per axis, positions in [-1, 1], ``num_freq_bands``
  linearly spaced frequencies up to ``max_freq/2``, sin+cos+raw → 2·bands+1
  channels per axis, concatenated to the data channels;
* per depth: cross-attention (1 head, 64-dim) from latents to the flattened
  input, GEGLU feed-forward, then one latent self-attention block (8 heads,
  64-dim) + feed-forward, all pre-norm with residuals;
* head: mean over latents → LayerNorm → Dense(num_classes).

TPU-first design: with ``weight_tie_layers=True`` (the only mode the
reference uses) the depth loop is an ``nn.scan`` with broadcast parameters —
the compiled program contains ONE scanned block regardless of depth, so
compile time and code size are O(1) in depth (the reference's depth equals
the sequence length, up to 31). Tying follows perceiver_pytorch's
``cache_fn`` exactly: ``should_cache = i > 0 and weight_tie_layers``, i.e.
the FIRST depth step keeps its own parameters (``block0``) and steps
1..depth-1 share a second set (``block``) — two parameter sets total, same
as the library. Attention is einsum-based and runs on the MXU in the module
dtype (bf16 under mixed precision).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

#: the mesh axis attention weights shard over under tensor parallelism
MODEL_AXIS = "model"


def _maybe_partitioned(partition: bool, axes: Tuple[Optional[str], ...]):
    """Kernel initialiser, optionally boxed with mesh-axis names.

    Megatron-style TP for the attention/FF blocks: input projections are
    column-sharded (P(None, "model")), output projections row-sharded
    (P("model", None)); GSPMD inserts the single psum after each output
    projection. With ``partition=False`` (the default) the param is a plain
    array and everything stays replicated — identical to the original model.
    """
    init = nn.initializers.lecun_normal()
    if not partition:
        return init
    return nn.with_partitioning(init, axes)


def fourier_encode(shape: Tuple[int, ...], num_freq_bands: int, max_freq: float) -> np.ndarray:
    """Position features for a spatial grid, shape (*shape, n_axes*(2*bands+1)).

    Computed once at trace time (static shapes) — ends up a constant folded
    into the XLA program.
    """
    axes = [np.linspace(-1.0, 1.0, size, dtype=np.float32) for size in shape]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)  # (*shape, n_axes)
    scales = np.linspace(1.0, max_freq / 2.0, num_freq_bands, dtype=np.float32)
    scaled = grid[..., None] * scales * math.pi  # (*shape, n_axes, bands)
    features = np.concatenate(
        [np.sin(scaled), np.cos(scaled), grid[..., None]], axis=-1
    )  # (*shape, n_axes, 2*bands+1)
    return features.reshape(*shape, -1)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    partition: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.partition:
            # Separate value/gate projections so each model-axis shard holds
            # MATCHING value/gate columns and the gating multiply is local.
            # A single fused projection split with jnp.split would cut
            # exactly on the shard boundary (shard 0 = all value, shard 1 =
            # all gate) and force a reshard inside every feed-forward.
            column = _maybe_partitioned(True, (None, MODEL_AXIS))
            value = nn.Dense(
                self.dim * self.mult, dtype=self.dtype, name="in_value",
                kernel_init=column,
            )(x)
            gate = nn.Dense(
                self.dim * self.mult, dtype=self.dtype, name="in_gate",
                kernel_init=column,
            )(x)
        else:
            projected = nn.Dense(
                self.dim * self.mult * 2, dtype=self.dtype, name="in"
            )(x)
            value, gate = jnp.split(projected, 2, axis=-1)
        # exact (erf) GELU — perceiver_pytorch's F.gelu, not the tanh approx
        gated = value * nn.gelu(gate, approximate=False)
        return nn.Dense(
            self.dim, dtype=self.dtype, name="out",
            kernel_init=_maybe_partitioned(self.partition, (MODEL_AXIS, None)),
        )(gated)


class Attention(nn.Module):
    """Multi-head attention; cross-attention when ``context`` is given."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    partition: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        context = x if context is None else context
        inner = self.heads * self.dim_head
        qkv_init = _maybe_partitioned(self.partition, (None, MODEL_AXIS))
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q", kernel_init=qkv_init)(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k", kernel_init=qkv_init)(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v", kernel_init=qkv_init)(context)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / math.sqrt(self.dim_head)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(
            self.query_dim, dtype=self.dtype, name="to_out",
            kernel_init=_maybe_partitioned(self.partition, (MODEL_AXIS, None)),
        )(out)


class PerceiverBlock(nn.Module):
    """One depth step: cross-attn + FF + latent self-attn + FF (pre-norm)."""

    latent_dim: int
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    self_per_cross_attn: int = 1
    partition: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, latents: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
        x = latents
        normed = nn.LayerNorm(dtype=self.dtype, name="cross_norm")(x)
        data_normed = nn.LayerNorm(dtype=self.dtype, name="cross_context_norm")(data)
        x = x + Attention(
            query_dim=self.latent_dim,
            heads=self.cross_heads,
            dim_head=self.cross_dim_head,
            partition=self.partition,
            dtype=self.dtype,
            name="cross_attn",
        )(normed, data_normed)
        x = x + GEGLUFeedForward(
            self.latent_dim, partition=self.partition, dtype=self.dtype,
            name="cross_ff",
        )(
            nn.LayerNorm(dtype=self.dtype, name="cross_ff_norm")(x)
        )
        for i in range(self.self_per_cross_attn):
            x = x + Attention(
                query_dim=self.latent_dim,
                heads=self.latent_heads,
                dim_head=self.latent_dim_head,
                partition=self.partition,
                dtype=self.dtype,
                name=f"self_attn{i}",
            )(nn.LayerNorm(dtype=self.dtype, name=f"self_norm{i}")(x))
            x = x + GEGLUFeedForward(
                self.latent_dim, partition=self.partition, dtype=self.dtype,
                name=f"self_ff{i}",
            )(
                nn.LayerNorm(dtype=self.dtype, name=f"self_ff_norm{i}")(x)
            )
        return x


class Perceiver(nn.Module):
    """The full encoder: image(s) → class/feature vector."""

    input_channels: int
    input_axis: int = 2
    num_freq_bands: int = 6
    max_freq: float = 10.0
    depth: int = 6
    num_latents: int = 512
    latent_dim: int = 512
    num_classes: int = 1000
    weight_tie_layers: bool = False
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    self_per_cross_attn: int = 1
    fourier_encode_data: bool = True
    #: Rematerialise each depth block in the backward pass — trades recompute
    #: for activation memory (jax.checkpoint; useful when depth × latents
    #: outgrows HBM, SURVEY §7 "rematerialisation" note).
    remat: bool = False
    #: Tensor parallelism: box attention/FF kernels with mesh-axis names so
    #: the engine shards them over the mesh's ``model`` axis
    #: (Megatron-style column/row split; GSPMD inserts the psums).
    partition_attention: bool = False
    #: Unroll the tied depth loop into ``depth-1`` inlined calls of ONE
    #: shared block (identical params and param tree) instead of ``nn.scan``.
    #: With tying, the cross-attention K/V projections of the (constant)
    #: input are loop-INVARIANT — identical computations XLA's CSE merges
    #: once the loop is unrolled, but which ``lax.scan`` recomputes every
    #: iteration. Trades O(depth) program size / compile time for step time;
    #: numerics identical.
    depth_unroll: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, data: jnp.ndarray) -> jnp.ndarray:
        # data: (B, *spatial, C) with len(spatial) == input_axis
        # (perceiver_pytorch asserts the rank; without it a channel-less
        # input silently misparses spatial axes as tokens/channels)
        if data.ndim != 2 + self.input_axis:
            raise ValueError(
                f"expected (batch, *{self.input_axis} spatial axes, "
                f"channels) = {2 + self.input_axis}-d input, got "
                f"{data.ndim}-d {data.shape}"
            )
        if data.shape[-1] != self.input_channels:
            # the reference sizes its K/V Linear from input_channels and
            # crashes on mismatch; flax Dense infers from data, so check
            raise ValueError(
                f"input has {data.shape[-1]} channels but the module was "
                f"built with input_channels={self.input_channels}"
            )
        batch = data.shape[0]
        spatial = data.shape[1 : 1 + self.input_axis]

        if self.fourier_encode_data:
            pos = fourier_encode(tuple(spatial), self.num_freq_bands, self.max_freq)
            pos = jnp.broadcast_to(
                jnp.asarray(pos, dtype=data.dtype), (batch, *pos.shape)
            )
            data = jnp.concatenate([data, pos], axis=-1)

        data = data.reshape(batch, -1, data.shape[-1])  # flatten spatial -> N tokens

        # perceiver_pytorch: nn.Parameter(torch.randn(...)) — unit-normal,
        # not a small-stddev init; matching it keeps early-training
        # cross-attention dynamics comparable to the reference.
        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=1.0),
            (self.num_latents, self.latent_dim),
        )
        x = jnp.broadcast_to(latents, (batch, *latents.shape)).astype(
            self.dtype or jnp.float32
        )

        block_kwargs = dict(
            latent_dim=self.latent_dim,
            cross_heads=self.cross_heads,
            latent_heads=self.latent_heads,
            cross_dim_head=self.cross_dim_head,
            latent_dim_head=self.latent_dim_head,
            self_per_cross_attn=self.self_per_cross_attn,
            partition=self.partition_attention,
            dtype=self.dtype,
        )
        if self.weight_tie_layers:
            # perceiver_pytorch ties layers 1..depth-1 but leaves layer 0
            # untied (cache_fn: should_cache = i > 0). Same here: an
            # unshared first block, then ONE block scanned over the
            # remaining depth-1 steps with broadcast params — O(1) program
            # size however deep the encoder is.
            first_cls = nn.remat(PerceiverBlock, prevent_cse=False) if self.remat else PerceiverBlock
            x = first_cls(name="block0", **block_kwargs)(x, data)
            if self.depth > 1:
                if self.depth_unroll and self.remat:
                    # remat wraps each block in a checkpoint boundary that
                    # blocks the cross-iteration CSE the unroll exists for —
                    # and prevent_cse=False makes nn.scan the better carrier
                    logging.getLogger(__name__).warning(
                        "depth_unroll is ignored with remat=True: the remat "
                        "boundary defeats the K/V-hoisting CSE; using nn.scan"
                    )
                if self.depth_unroll and not self.remat:
                    # one module instance called depth-1 times: flax shares
                    # the params (same block/inner/* tree as the scan) and
                    # XLA CSE hoists the loop-invariant K/V projections
                    shared = _ScanBlock(name="block", **block_kwargs)
                    for _ in range(self.depth - 1):
                        x, _ = shared(x, data)
                else:
                    block_cls = nn.remat(_ScanBlock, prevent_cse=False) if self.remat else _ScanBlock
                    ScannedBlock = nn.scan(
                        block_cls,
                        variable_broadcast="params",
                        split_rngs={"params": False},
                        in_axes=nn.broadcast,
                        length=self.depth - 1,
                    )
                    x, _ = ScannedBlock(name="block", **block_kwargs)(x, data)
        else:
            for i in range(self.depth):
                block_cls = nn.remat(PerceiverBlock, prevent_cse=False) if self.remat else PerceiverBlock
                x = block_cls(name=f"block{i}", **block_kwargs)(x, data)

        x = jnp.mean(x, axis=1)
        x = nn.LayerNorm(dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="to_logits")(x)


class _ScanBlock(nn.Module):
    """PerceiverBlock under the (carry, broadcast-input) calling convention
    ``nn.scan`` expects."""

    latent_dim: int
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    self_per_cross_attn: int = 1
    partition: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, latents, data):
        out = PerceiverBlock(
            latent_dim=self.latent_dim,
            cross_heads=self.cross_heads,
            latent_heads=self.latent_heads,
            cross_dim_head=self.cross_dim_head,
            latent_dim_head=self.latent_dim_head,
            self_per_cross_attn=self.self_per_cross_attn,
            partition=self.partition,
            dtype=self.dtype,
            name="inner",
        )(latents, data)
        return out, None


def split_geglu_params(params):
    """Fused GEGLU ``in`` projections → the partitioned ``in_value`` /
    ``in_gate`` layout.

    ``partition_attention=True`` stores the feed-forward input projection as
    two Denses (so each model-axis shard holds matching value/gate columns),
    which changes the checkpoint parameter tree. This converter lets a
    replicated-run checkpoint (or a reference torch import, which only knows
    the fused layout) restore into a TP model: value = first half of the
    fused output columns, gate = second half — exactly ``jnp.split``'s
    boundary, so numerics are identical.
    """

    def walk(node):
        if not isinstance(node, dict):
            return node
        if (
            "in" in node
            and "out" in node
            and isinstance(node["in"], dict)
            and "kernel" in node["in"]
        ):
            fused = node["in"]
            kernel = np.asarray(fused["kernel"])
            half = kernel.shape[-1] // 2
            new = {k: walk(v) for k, v in node.items() if k != "in"}
            new["in_value"] = {"kernel": kernel[..., :half]}
            new["in_gate"] = {"kernel": kernel[..., half:]}
            if "bias" in fused:
                bias = np.asarray(fused["bias"])
                new["in_value"]["bias"] = bias[..., :half]
                new["in_gate"]["bias"] = bias[..., half:]
            return new
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def fuse_geglu_params(params):
    """Inverse of :func:`split_geglu_params`: a TP checkpoint's
    ``in_value``/``in_gate`` pairs concatenate back into the fused ``in``
    layout, so TP-trained parameters export through ``convert.py`` (which
    speaks only the fused layout) and restore into replicated models."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        if (
            "in_value" in node
            and "in_gate" in node
            and isinstance(node["in_value"], dict)
        ):
            value, gate = node["in_value"], node["in_gate"]
            new = {
                k: walk(v)
                for k, v in node.items()
                if k not in ("in_value", "in_gate")
            }
            fused = {
                "kernel": np.concatenate(
                    [np.asarray(value["kernel"]), np.asarray(gate["kernel"])],
                    axis=-1,
                )
            }
            if "bias" in value:
                fused["bias"] = np.concatenate(
                    [np.asarray(value["bias"]), np.asarray(gate["bias"])],
                    axis=-1,
                )
            new["in"] = fused
            return new
        return {k: walk(v) for k, v in node.items()}

    return walk(params)
