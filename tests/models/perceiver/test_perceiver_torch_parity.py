"""Numerical parity: flax PerceiverBlock vs a minimal torch reimplementation
of one perceiver_pytorch depth step (cross-attn + GEGLU FF + self-attn + FF,
all pre-norm with residuals — the architecture the reference consumes at
``models/perceiver/perceiver.py:70-80``).

Mirrors the conv3d approach in tests/test_convert.py: build the block in
plain torch from the library's documented structure, convert the weights,
and require 1e-4 agreement on random inputs. perceiver_pytorch itself is not
installed; this pins the *semantics* (head split order, GEGLU chunk order,
exact-erf GELU, pre-norm residual wiring) rather than the import.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from predict_pv_yield_tpu.models.perceiver_core import PerceiverBlock  # noqa: E402

LATENT_DIM = 32
INPUT_DIM = 24
CROSS_HEADS = 1
LATENT_HEADS = 4
DIM_HEAD = 16


class TorchAttention(nn.Module):
    """perceiver_pytorch.Attention: q from x, k/v from context, no biases on
    projections, heads folded as ``(h d)`` with h slowest."""

    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Linear(inner, query_dim)

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).view(b, n, h, d).transpose(1, 2)
        k = self.to_k(context).view(b, context.shape[1], h, d).transpose(1, 2)
        v = self.to_v(context).view(b, context.shape[1], h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-2, -1) * d**-0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, h * d)
        return self.to_out(out)


class TorchGEGLUFF(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net_in = nn.Linear(dim, dim * mult * 2)
        self.net_out = nn.Linear(dim * mult, dim)

    def forward(self, x):
        value, gate = self.net_in(x).chunk(2, dim=-1)
        return self.net_out(value * F.gelu(gate))


class TorchPerceiverBlock(nn.Module):
    def __init__(self, latent_dim=LATENT_DIM, input_dim=INPUT_DIM,
                 cross_heads=CROSS_HEADS, latent_heads=LATENT_HEADS,
                 dim_head=DIM_HEAD):
        super().__init__()
        self.cross_norm = nn.LayerNorm(latent_dim)
        self.cross_context_norm = nn.LayerNorm(input_dim)
        self.cross_attn = TorchAttention(latent_dim, input_dim, cross_heads, dim_head)
        self.cross_ff_norm = nn.LayerNorm(latent_dim)
        self.cross_ff = TorchGEGLUFF(latent_dim)
        self.self_norm = nn.LayerNorm(latent_dim)
        self.self_attn = TorchAttention(latent_dim, latent_dim, latent_heads, dim_head)
        self.self_ff_norm = nn.LayerNorm(latent_dim)
        self.self_ff = TorchGEGLUFF(latent_dim)

    def forward(self, latents, data):
        x = latents
        x = x + self.cross_attn(self.cross_norm(x), self.cross_context_norm(data))
        x = x + self.cross_ff(self.cross_ff_norm(x))
        x = x + self.self_attn(self.self_norm(x))
        x = x + self.self_ff(self.self_ff_norm(x))
        return x


def _dense(linear: nn.Linear, bias=True):
    params = {"kernel": linear.weight.detach().numpy().T}
    if bias:
        params["bias"] = linear.bias.detach().numpy()
    return params


def _norm(layer_norm: nn.LayerNorm):
    return {
        "scale": layer_norm.weight.detach().numpy(),
        "bias": layer_norm.bias.detach().numpy(),
    }


def _attention(attn: TorchAttention):
    return {
        "to_q": _dense(attn.to_q, bias=False),
        "to_k": _dense(attn.to_k, bias=False),
        "to_v": _dense(attn.to_v, bias=False),
        "to_out": _dense(attn.to_out),
    }


def _feed_forward(ff: TorchGEGLUFF):
    return {"in": _dense(ff.net_in), "out": _dense(ff.net_out)}


def test_perceiver_block_torch_parity():
    torch.manual_seed(0)
    torch_block = TorchPerceiverBlock().eval()

    rng = np.random.default_rng(0)
    latents = rng.standard_normal((2, 6, LATENT_DIM)).astype(np.float32)
    data = rng.standard_normal((2, 50, INPUT_DIM)).astype(np.float32)

    with torch.no_grad():
        y_torch = torch_block(torch.from_numpy(latents), torch.from_numpy(data)).numpy()

    block = PerceiverBlock(
        latent_dim=LATENT_DIM,
        cross_heads=CROSS_HEADS,
        latent_heads=LATENT_HEADS,
        cross_dim_head=DIM_HEAD,
        latent_dim_head=DIM_HEAD,
    )
    variables = {
        "params": {
            "cross_norm": _norm(torch_block.cross_norm),
            "cross_context_norm": _norm(torch_block.cross_context_norm),
            "cross_attn": _attention(torch_block.cross_attn),
            "cross_ff_norm": _norm(torch_block.cross_ff_norm),
            "cross_ff": _feed_forward(torch_block.cross_ff),
            "self_norm0": _norm(torch_block.self_norm),
            "self_attn0": _attention(torch_block.self_attn),
            "self_ff_norm0": _norm(torch_block.self_ff_norm),
            "self_ff0": _feed_forward(torch_block.self_ff),
        }
    }
    y_flax = np.asarray(block.apply(variables, jnp.asarray(latents), jnp.asarray(data)))
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-4, atol=1e-4)

    # the converted param tree is exactly the block's expected structure
    expected = jax.tree_util.tree_structure(
        block.init(jax.random.key(0), jnp.asarray(latents), jnp.asarray(data))
    )
    assert jax.tree_util.tree_structure(variables) == expected


# ---------------------------------------------------------------------------
# Full-encoder and full-model parity (VERDICT r2 #3): the Fourier encoder +
# depth tying + mean-latent head composition, then the whole PerceiverModel
# (encoder + fc head + ID embedding + GRU seq2seq) against a torch mirror of
# reference models/perceiver/perceiver.py:70-200.
# ---------------------------------------------------------------------------

import math  # noqa: E402

from predict_pv_yield_tpu.convert import (  # noqa: E402
    convert_perceiver_encoder,
    convert_perceiver_model,
)
from predict_pv_yield_tpu.models.perceiver_core import Perceiver  # noqa: E402


class TorchPerceiver(nn.Module):
    """perceiver_pytorch.Perceiver rebuilt in plain torch from the library's
    documented structure (Fourier position features in [-1, 1] with
    ``num_freq_bands`` linearly spaced frequencies up to max_freq/2 and
    sin|cos|raw channels per axis; cache_fn tying: block0 untied, one shared
    block for depth steps 1..d-1; mean over latents → LayerNorm → Linear)."""

    def __init__(self, input_channels, num_freq_bands, max_freq, depth,
                 num_latents, latent_dim, num_classes,
                 cross_heads=1, latent_heads=8, dim_head=64):
        super().__init__()
        self.num_freq_bands = num_freq_bands
        self.max_freq = max_freq
        self.depth = depth
        input_dim = input_channels + 2 * (2 * num_freq_bands + 1)
        self.latents = nn.Parameter(torch.randn(num_latents, latent_dim))
        self.block0 = TorchPerceiverBlock(
            latent_dim, input_dim, cross_heads, latent_heads, dim_head
        )
        if depth > 1:
            self.block = TorchPerceiverBlock(
                latent_dim, input_dim, cross_heads, latent_heads, dim_head
            )
        self.head_norm = nn.LayerNorm(latent_dim)
        self.to_logits = nn.Linear(latent_dim, num_classes)

    def forward(self, data):  # (B, H, W, C)
        b, h, w, _ = data.shape
        axis_pos = [torch.linspace(-1.0, 1.0, steps=size) for size in (h, w)]
        pos = torch.stack(torch.meshgrid(*axis_pos, indexing="ij"), dim=-1)
        scales = torch.linspace(1.0, self.max_freq / 2.0, self.num_freq_bands)
        scaled = pos.unsqueeze(-1) * scales * math.pi
        enc = torch.cat([scaled.sin(), scaled.cos(), pos.unsqueeze(-1)], dim=-1)
        enc = enc.reshape(h, w, -1).unsqueeze(0).expand(b, -1, -1, -1)
        data = torch.cat([data, enc], dim=-1).reshape(b, h * w, -1)

        x = self.latents.unsqueeze(0).expand(b, -1, -1)
        x = self.block0(x, data)
        for _ in range(self.depth - 1):
            x = self.block(x, data)
        x = x.mean(dim=1)
        return self.to_logits(self.head_norm(x))


def test_perceiver_encoder_full_torch_parity():
    """The whole encoder at 1e-4: Fourier features, tied depth loop (nn.scan
    on the flax side, a Python loop over ONE shared torch block on the torch
    side), and the mean-latent head — the composition where a transposition
    bug would hide."""
    torch.manual_seed(3)
    depth = 5
    torch_model = TorchPerceiver(
        input_channels=3, num_freq_bands=6, max_freq=10.0, depth=depth,
        num_latents=6, latent_dim=LATENT_DIM, num_classes=7,
        cross_heads=CROSS_HEADS, latent_heads=LATENT_HEADS, dim_head=DIM_HEAD,
    ).eval()

    rng = np.random.default_rng(3)
    data = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        y_torch = torch_model(torch.from_numpy(data)).numpy()

    model = Perceiver(
        input_channels=3, input_axis=2, num_freq_bands=6, max_freq=10.0,
        depth=depth, num_latents=6, latent_dim=LATENT_DIM, num_classes=7,
        weight_tie_layers=True, cross_heads=CROSS_HEADS,
        latent_heads=LATENT_HEADS, cross_dim_head=DIM_HEAD,
        latent_dim_head=DIM_HEAD,
    )
    variables = {"params": convert_perceiver_encoder(torch_model.state_dict())}
    y_flax = np.asarray(model.apply(variables, jnp.asarray(data)))
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-4, atol=1e-4)

    expected = jax.tree_util.tree_structure(
        model.init(jax.random.key(0), jnp.asarray(data))
    )
    assert jax.tree_util.tree_structure(variables) == expected


class TorchPerceiverModel(nn.Module):
    """Reference PerceiverModel forward (perceiver.py:113-200): fold time
    into batch → Perceiver per frame → fc1 → ID-embedding concat → fc2..fc5
    → unfold → NWP zero-pad + flatten → GRU encoder over the history window
    (+ yield-history channel) → GRU decoder seeded with the encoder state →
    decoder fc head."""

    PERCEIVER_OUTPUT_SIZE = 512
    FC_OUTPUT_SIZE = 8
    RNN_HIDDEN_SIZE = 16

    def __init__(self, native, perceiver=None):
        super().__init__()
        self.native = native
        n_sat_channels = 11  # reference params["sat_channels"] length
        self.perceiver = perceiver if perceiver is not None else TorchPerceiver(
            input_channels=n_sat_channels, num_freq_bands=6, max_freq=10.0,
            depth=native.total_seq_length, num_latents=native.num_latents,
            latent_dim=native.latent_dim, num_classes=self.PERCEIVER_OUTPUT_SIZE,
        )
        self.fc1 = nn.Linear(self.PERCEIVER_OUTPUT_SIZE, 256)
        self.fc2 = nn.Linear(256 + native.embedding_dem, 128)
        self.fc3 = nn.Linear(128, 64)
        self.fc4 = nn.Linear(64, 32)
        self.fc5 = nn.Linear(32, self.FC_OUTPUT_SIZE)
        self.pv_system_id_embedding = nn.Embedding(2048, native.embedding_dem)
        nwp_size = len(native.nwp_channels) * 16 * 16  # fixture nwp grid
        self.encoder_rnn = nn.GRU(
            input_size=self.FC_OUTPUT_SIZE + 1 + nwp_size,
            hidden_size=self.RNN_HIDDEN_SIZE, num_layers=2, batch_first=True,
        )
        self.decoder_rnn = nn.GRU(
            input_size=self.FC_OUTPUT_SIZE + nwp_size,
            hidden_size=self.RNN_HIDDEN_SIZE, num_layers=2, batch_first=True,
        )
        self.decoder_fc1 = nn.Linear(self.RNN_HIDDEN_SIZE, 8)
        self.decoder_fc2 = nn.Linear(8, 1)

    def forward(self, sat_data, nwp_data, pv_yield, pv_system_row_number):
        m = self.native
        sat_data = sat_data[0 : m.batch_size].float()
        batch_size, n_chans, seq_len, width, height = sat_data.shape
        sat_data = sat_data.permute(0, 2, 3, 4, 1)
        new_batch_size = batch_size * seq_len
        sat_data = sat_data.reshape(new_batch_size, width, height, n_chans)

        out = self.perceiver(sat_data)
        out = out.reshape(new_batch_size, self.PERCEIVER_OUTPUT_SIZE)
        out = F.relu(self.fc1(out))

        ids = pv_system_row_number[0 : m.batch_size, 0]
        ids = ids.type(torch.IntTensor).repeat_interleave(m.total_seq_length)
        out = torch.cat((out, self.pv_system_id_embedding(ids)), dim=1)

        out = F.relu(self.fc2(out))
        out = F.relu(self.fc3(out))
        out = F.relu(self.fc4(out))
        out = F.relu(self.fc5(out))

        out = out.reshape(batch_size, m.total_seq_length, self.FC_OUTPUT_SIZE)

        nwp = nwp_data[0 : m.batch_size].float()
        nwp = nwp.permute(0, 2, 1, 3, 4)
        zeros = torch.zeros(
            (batch_size, seq_len - nwp.shape[1], *nwp.shape[2:])
        )
        nwp = torch.cat([nwp, zeros], dim=1).reshape(batch_size, seq_len, -1)

        rnn_input = torch.cat((out, nwp), dim=2)

        history = pv_yield[0 : m.batch_size][:, : m.history_len_5 + 1, 0]
        history = history.unsqueeze(-1).float()
        encoder_input = torch.cat(
            (rnn_input[:, : m.history_len_5 + 1], history), dim=2
        )
        _, encoder_hidden = self.encoder_rnn(encoder_input)
        decoder_output, _ = self.decoder_rnn(
            rnn_input[:, -m.forecast_len :], encoder_hidden
        )
        decoder_output = F.relu(self.decoder_fc1(decoder_output))
        return self.decoder_fc2(decoder_output).squeeze(dim=-1)


def test_perceiver_model_full_torch_parity(configuration_perceiver):
    """The whole PerceiverModel.apply at 1e-4 against the torch mirror —
    gates the GRU seq2seq (torch gate packing → flax GRUCell), the embedding
    repeat order, and the NWP padding alongside the encoder."""
    from predict_pv_yield_tpu.data.fake import FakeDataset
    from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params

    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.default_forecast_minutes = 60
    dataset_configuration.process.batch_size = 2

    model = PerceiverModel(
        history_minutes=30,
        forecast_minutes=60,
        nwp_channels=params["nwp_channels"],
        batch_size=2,
        embedding_dem=16,
        num_latents=6,
        latent_dim=32,
    )
    torch.manual_seed(4)
    torch_model = TorchPerceiverModel(model).eval()

    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    sat = np.asarray(batch.satellite.data, np.float32)
    nwp = np.asarray(batch.nwp.data, np.float32)
    pv = np.asarray(batch.pv.pv_yield, np.float32)
    rows = np.asarray(batch.pv.pv_system_row_number)

    with torch.no_grad():
        y_torch = torch_model(
            torch.from_numpy(sat), torch.from_numpy(nwp),
            torch.from_numpy(pv), torch.from_numpy(rows),
        ).numpy()

    variables = convert_perceiver_model(torch_model.state_dict(), model)
    y_flax = np.asarray(model.apply(variables, batch))
    assert y_flax.shape == y_torch.shape == (2, model.forecast_len)
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-4, atol=1e-4)

    expected = jax.tree_util.tree_structure(model.init(jax.random.key(0), batch))
    assert jax.tree_util.tree_structure(variables) == expected


def test_export_perceiver_model_roundtrip_and_torch_parity(configuration_perceiver):
    """Native→torch export: a natively initialised PerceiverModel exported
    with export_perceiver_model, loaded into the torch mirror, must match
    the native forward at 1e-4 — so checkpoints trained here flow back to
    reference users (the conv3d family already has this gate)."""
    from predict_pv_yield_tpu.convert import (
        convert_perceiver_model,
        export_perceiver_model,
    )
    from predict_pv_yield_tpu.data.fake import FakeDataset
    from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params

    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.default_forecast_minutes = 60
    dataset_configuration.process.batch_size = 2

    model = PerceiverModel(
        history_minutes=30,
        forecast_minutes=60,
        nwp_channels=params["nwp_channels"],
        batch_size=2,
        embedding_dem=16,
        num_latents=6,
        latent_dim=32,
    )
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = model.init(jax.random.key(7), batch)
    y_native = np.asarray(model.apply(variables, batch))

    state_dict = export_perceiver_model(variables, model, layout="mirror")

    # import(export) reproduces the exact native tree AND native outputs
    reimported = convert_perceiver_model(state_dict, model)
    y_reimported = np.asarray(model.apply(reimported, batch))
    np.testing.assert_allclose(y_reimported, y_native, rtol=1e-6, atol=1e-6)

    # torch mirror loaded with the export matches the native forward
    torch_model = TorchPerceiverModel(model)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()}
    )
    sat = np.asarray(batch.satellite.data, np.float32)
    nwp = np.asarray(batch.nwp.data, np.float32)
    pv = np.asarray(batch.pv.pv_yield, np.float32)
    rows = np.asarray(batch.pv.pv_system_row_number)
    with torch.no_grad():
        y_torch = torch_model.eval()(
            torch.from_numpy(sat), torch.from_numpy(nwp),
            torch.from_numpy(pv), torch.from_numpy(rows),
        ).numpy()
    np.testing.assert_allclose(y_native, y_torch, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# The REAL perceiver_pytorch module structure (round-3 high review: real
# reference checkpoints serialize PreNorm wrappers, fused to_kv, ModuleList
# indices and a to_logits Sequential — NOT the flat mirror above). This
# replica reproduces those exact state_dict keys so import/export are gated
# against what a reference .ckpt actually contains.
# ---------------------------------------------------------------------------

from einops.layers.torch import Reduce  # noqa: E402

from predict_pv_yield_tpu.convert import (  # noqa: E402
    convert_perceiver_pytorch_encoder,
    export_perceiver_model,
)


class RealGEGLU(nn.Module):
    def forward(self, x):
        x, gates = x.chunk(2, dim=-1)
        return x * F.gelu(gates)


class RealFeedForward(nn.Module):
    """perceiver_pytorch.FeedForward: a module HOLDING a Sequential named
    ``net`` (state_dict keys ``...fn.net.0.weight`` / ``...fn.net.2.weight``)."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, dim * mult * 2), RealGEGLU(),
            nn.Linear(dim * mult, dim),
        )

    def forward(self, x):
        return self.net(x)


def real_feed_forward(dim, mult=4):
    return RealFeedForward(dim, mult)


class RealAttention(nn.Module):
    """perceiver_pytorch.Attention: fused to_kv, chunked into K then V."""

    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64):
        super().__init__()
        context_dim = context_dim if context_dim is not None else query_dim
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_kv = nn.Linear(context_dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, query_dim)

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).view(b, n, h, d).transpose(1, 2)
        k, v = self.to_kv(context).chunk(2, dim=-1)
        k = k.view(b, context.shape[1], h, d).transpose(1, 2)
        v = v.view(b, context.shape[1], h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-2, -1) * d**-0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, h * d)
        return self.to_out(out)


class RealPreNorm(nn.Module):
    def __init__(self, dim, fn, context_dim=None):
        super().__init__()
        self.fn = fn
        self.norm = nn.LayerNorm(dim)
        self.norm_context = nn.LayerNorm(context_dim) if context_dim else None

    def forward(self, x, context=None):
        x = self.norm(x)
        if self.norm_context is not None:
            context = self.norm_context(context)
            return self.fn(x, context=context)
        return self.fn(x)


class RealPerceiver(nn.Module):
    """perceiver_pytorch.Perceiver with weight_tie_layers=True: the modern
    nested layout (layers.{i} = [cross PreNorm, cross-FF PreNorm,
    ModuleList([[latent attn, latent ff]])]; to_logits = Sequential(Reduce,
    LayerNorm, Linear)); cache_fn tying reuses the SAME module objects for
    layers 1..depth-1."""

    def __init__(self, input_channels, num_freq_bands, max_freq, depth,
                 num_latents, latent_dim, num_classes,
                 cross_heads=1, latent_heads=8, dim_head=64):
        super().__init__()
        self.num_freq_bands, self.max_freq, self.depth = num_freq_bands, max_freq, depth
        input_dim = input_channels + 2 * (2 * num_freq_bands + 1)
        self.latents = nn.Parameter(torch.randn(num_latents, latent_dim))

        def cross_attn():
            return RealPreNorm(
                latent_dim,
                RealAttention(latent_dim, input_dim, cross_heads, dim_head),
                context_dim=input_dim,
            )

        def cross_ff():
            return RealPreNorm(latent_dim, real_feed_forward(latent_dim))

        def latent_attn():
            return RealPreNorm(
                latent_dim, RealAttention(latent_dim, heads=latent_heads,
                                          dim_head=dim_head)
            )

        def latent_ff():
            return RealPreNorm(latent_dim, real_feed_forward(latent_dim))

        self.layers = nn.ModuleList([])
        shared = None
        for i in range(depth):
            if i > 0 and shared is not None:
                self.layers.append(shared)  # cache_fn: same module objects
                continue
            layer = nn.ModuleList([
                cross_attn(), cross_ff(),
                nn.ModuleList([nn.ModuleList([latent_attn(), latent_ff()])]),
            ])
            self.layers.append(layer)
            if i == 0:
                shared_layer = nn.ModuleList([
                    cross_attn(), cross_ff(),
                    nn.ModuleList([nn.ModuleList([latent_attn(), latent_ff()])]),
                ]) if depth > 1 else None
                shared = shared_layer
        self.to_logits = nn.Sequential(
            Reduce("b n d -> b d", "mean"),
            nn.LayerNorm(latent_dim),
            nn.Linear(latent_dim, num_classes),
        )

    def forward(self, data):  # (B, H, W, C)
        b, h, w, _ = data.shape
        axis_pos = [torch.linspace(-1.0, 1.0, steps=size) for size in (h, w)]
        pos = torch.stack(torch.meshgrid(*axis_pos, indexing="ij"), dim=-1)
        scales = torch.linspace(1.0, self.max_freq / 2.0, self.num_freq_bands)
        scaled = pos.unsqueeze(-1) * scales * math.pi
        enc = torch.cat([scaled.sin(), scaled.cos(), pos.unsqueeze(-1)], dim=-1)
        enc = enc.reshape(h, w, -1).unsqueeze(0).expand(b, -1, -1, -1)
        data = torch.cat([data, enc], dim=-1).reshape(b, h * w, -1)

        x = self.latents.unsqueeze(0).expand(b, -1, -1)
        for cross_attn, cross_ff, self_attns in self.layers:
            x = cross_attn(x, context=data) + x
            x = cross_ff(x) + x
            for self_attn, self_ff in self_attns:
                x = self_attn(x) + x
                x = self_ff(x) + x
        return self.to_logits(x)


def _real_perceiver_for(native):
    return RealPerceiver(
        input_channels=11, num_freq_bands=6, max_freq=10.0,
        depth=native.total_seq_length, num_latents=native.num_latents,
        latent_dim=native.latent_dim, num_classes=512,
    )


def test_real_perceiver_pytorch_state_dict_keys():
    """The replica must serialize the REAL library's key layout."""
    from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params

    native = PerceiverModel(
        history_minutes=30, forecast_minutes=60,
        nwp_channels=params["nwp_channels"], batch_size=2,
        num_latents=4, latent_dim=16,
    )
    keys = set(_real_perceiver_for(native).state_dict().keys())
    assert "latents" in keys
    assert "layers.0.0.norm.weight" in keys
    assert "layers.0.0.norm_context.weight" in keys
    assert "layers.0.0.fn.to_kv.weight" in keys
    assert "layers.0.1.fn.net.0.weight" in keys
    assert "layers.0.2.0.0.fn.to_q.weight" in keys
    assert "layers.1.0.fn.to_q.weight" in keys  # tied copies serialize too
    assert "to_logits.1.weight" in keys and "to_logits.2.weight" in keys


def test_real_perceiver_pytorch_import_parity(configuration_perceiver):
    """A REAL-layout reference checkpoint imports and matches at 1e-4."""
    from predict_pv_yield_tpu.convert import convert_perceiver_model
    from predict_pv_yield_tpu.data.fake import FakeDataset
    from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params

    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.default_forecast_minutes = 60
    dataset_configuration.process.batch_size = 2

    native = PerceiverModel(
        history_minutes=30, forecast_minutes=60,
        nwp_channels=params["nwp_channels"], batch_size=2,
        embedding_dem=16, num_latents=6, latent_dim=32,
    )
    torch.manual_seed(11)
    torch_model = TorchPerceiverModel(
        native, perceiver=_real_perceiver_for(native)
    ).eval()

    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    sat = np.asarray(batch.satellite.data, np.float32)
    nwp = np.asarray(batch.nwp.data, np.float32)
    pv = np.asarray(batch.pv.pv_yield, np.float32)
    rows = np.asarray(batch.pv.pv_system_row_number)
    with torch.no_grad():
        y_torch = torch_model(
            torch.from_numpy(sat), torch.from_numpy(nwp),
            torch.from_numpy(pv), torch.from_numpy(rows),
        ).numpy()

    variables = convert_perceiver_model(torch_model.state_dict(), native)
    y_flax = np.asarray(native.apply(variables, batch))
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-4, atol=1e-4)

    expected = jax.tree_util.tree_structure(native.init(jax.random.key(0), batch))
    assert jax.tree_util.tree_structure(variables) == expected


def test_export_to_real_perceiver_pytorch_layout(configuration_perceiver):
    """Native params export to the REAL layout and load with strict=True —
    the 'checkpoints flow back to reference users' claim, gated against the
    library's actual module tree."""
    from predict_pv_yield_tpu.data.fake import FakeDataset
    from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params

    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.default_forecast_minutes = 60
    dataset_configuration.process.batch_size = 2

    native = PerceiverModel(
        history_minutes=30, forecast_minutes=60,
        nwp_channels=params["nwp_channels"], batch_size=2,
        embedding_dem=16, num_latents=6, latent_dim=32,
    )
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = native.init(jax.random.key(13), batch)
    y_native = np.asarray(native.apply(variables, batch))

    state_dict = export_perceiver_model(variables, native)  # default layout
    torch_model = TorchPerceiverModel(
        native, perceiver=_real_perceiver_for(native)
    )
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state_dict.items()},
        strict=True,
    )
    sat = np.asarray(batch.satellite.data, np.float32)
    nwp = np.asarray(batch.nwp.data, np.float32)
    pv = np.asarray(batch.pv.pv_yield, np.float32)
    rows = np.asarray(batch.pv.pv_system_row_number)
    with torch.no_grad():
        y_torch = torch_model.eval()(
            torch.from_numpy(sat), torch.from_numpy(nwp),
            torch.from_numpy(pv), torch.from_numpy(rows),
        ).numpy()
    np.testing.assert_allclose(y_native, y_torch, rtol=1e-4, atol=1e-4)
