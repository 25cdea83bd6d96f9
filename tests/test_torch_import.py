"""Torch-checkpoint importer round-trip tests.

Builds torch modules with the REFERENCE's exact module/attribute structure
(so ``state_dict()`` emits the reference's key names — v1/model_train_test.py
lines cited per class), saves their state_dicts, imports them through
``flowerdiff.utils.torch_import``, and asserts the flax models reproduce the
torch forward pass — the proof that a reference user's trained .pt
checkpoints carry over without retraining.

Tiny widths keep the CPU round-trip fast; the importer itself is
shape-generic (geometry is inferred from the state_dict).
"""
from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flowerdiff.models.discriminator import Discriminator64  # noqa: E402
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser  # noqa: E402
from flowerdiff.models.vae import FlowerVAE  # noqa: E402
from flowerdiff.utils.torch_import import (  # noqa: E402
    import_autoencoder,
    import_discriminator,
    import_latent_denoiser,
)

nn = torch.nn

# tiny geometry: 32x32 images, 3 downs -> 4x4 deep map
CH = (4, 8, 16, 32)
HEAD = 16
LATENT = 8
NUM_CLASSES = 7
IMG = 32
BASE = IMG // 8

TOL = dict(rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# torch reference-structured modules (authentic state_dict key names)
# ---------------------------------------------------------------------------
class Swish(nn.Module):  # v1:48-50
    def forward(self, x):
        return x * torch.sigmoid(x)


class LayerNorm2d(nn.Module):  # v1:144-156
    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        mean = x.mean(dim=(2, 3), keepdim=True)
        var = x.var(dim=(2, 3), keepdim=True, unbiased=False)
        x = (x - mean) / torch.sqrt(var + self.eps)
        return x * self.weight.view(1, -1, 1, 1) + self.bias.view(1, -1, 1, 1)


class CALayer(nn.Module):  # v1:53-67 (reduction=8 matches core.layers.CALayer)
    def __init__(self, c, reduction=8):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.conv_du = nn.Sequential(
            nn.Conv2d(c, c // reduction, 1, padding=0, bias=False),
            Swish(),
            nn.Conv2d(c // reduction, c, 1, padding=0, bias=False),
            nn.Sigmoid(),
        )

    def forward(self, x):
        return x * self.conv_du(self.avg_pool(x))


class SpatialAttention(nn.Module):  # v1:69-81
    def __init__(self, kernel_size=7):
        super().__init__()
        self.conv = nn.Conv2d(2, 1, kernel_size, padding=kernel_size // 2, bias=False)

    def forward(self, x):
        avg_out = torch.mean(x, dim=1, keepdim=True)
        max_out, _ = torch.max(x, dim=1, keepdim=True)
        att = torch.sigmoid(self.conv(torch.cat([avg_out, max_out], dim=1)))
        return x * att


class ResidualBlock(nn.Module):  # v1:159-178
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1)
        self.ln1 = LayerNorm2d(c)
        self.swish = Swish()
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)
        self.ln2 = LayerNorm2d(c)
        self.ca = CALayer(c)
        self.sa = SpatialAttention()

    def forward(self, x):
        out = self.swish(self.ln1(self.conv1(x)))
        out = self.ln2(self.conv2(out))
        out = self.sa(self.ca(out))
        return self.swish(out + x)


class Encoder(nn.Module):  # v1:181-239
    def __init__(self, in_channels=3, latent_dim=LATENT):
        super().__init__()
        c = CH
        flat = c[3] * BASE * BASE
        self.initial_conv = nn.Sequential(
            nn.Conv2d(in_channels, c[0], 3, padding=1), LayerNorm2d(c[0]), Swish())
        self.down1 = nn.Sequential(
            nn.Conv2d(c[0], c[1], 4, stride=2, padding=1), LayerNorm2d(c[1]), Swish())
        self.res1 = ResidualBlock(c[1])
        self.down2 = nn.Sequential(
            nn.Conv2d(c[1], c[2], 4, stride=2, padding=1), LayerNorm2d(c[2]), Swish())
        self.res2 = ResidualBlock(c[2])
        self.down3 = nn.Sequential(
            nn.Conv2d(c[2], c[3], 4, stride=2, padding=1), LayerNorm2d(c[3]), Swish())
        self.res3 = ResidualBlock(c[3])
        self.fc_mu = nn.Sequential(
            nn.Linear(flat, HEAD), nn.LayerNorm(HEAD), Swish(),
            nn.Linear(HEAD, latent_dim))
        self.fc_logvar = nn.Sequential(
            nn.Linear(flat, HEAD), nn.LayerNorm(HEAD), Swish(),
            nn.Linear(HEAD, latent_dim))

    def forward(self, x):
        x = self.initial_conv(x)
        x = self.res1(self.down1(x))
        x = self.res2(self.down2(x))
        x = self.res3(self.down3(x))
        flat = x.reshape(x.size(0), -1)  # .view in the ref; same layout
        return self.fc_mu(flat), self.fc_logvar(flat)


class Decoder(nn.Module):  # v1:242-290
    def __init__(self, latent_dim=LATENT, out_channels=3):
        super().__init__()
        c = CH
        flat = c[3] * BASE * BASE
        self.fc = nn.Sequential(
            nn.Linear(latent_dim, HEAD), nn.LayerNorm(HEAD), Swish(),
            nn.Linear(HEAD, flat), nn.LayerNorm(flat), Swish())
        self.res3 = ResidualBlock(c[3])
        # GroupNorm group counts follow the reference's ch/8 rule, floored at
        # 1 for the tiny widths (models/vae.py applies the same rule)
        self.up3 = nn.Sequential(
            nn.ConvTranspose2d(c[3], c[2], 4, stride=2, padding=1),
            nn.GroupNorm(max(1, c[2] // 8), c[2]), Swish())
        self.res2 = ResidualBlock(c[2])
        self.up2 = nn.Sequential(
            nn.ConvTranspose2d(c[2], c[1], 4, stride=2, padding=1),
            nn.GroupNorm(max(1, c[1] // 8), c[1]), Swish())
        self.res1 = ResidualBlock(c[1])
        self.up1 = nn.Sequential(
            nn.ConvTranspose2d(c[1], c[0], 4, stride=2, padding=1),
            nn.GroupNorm(max(1, c[0] // 8), c[0]), Swish())
        mid = max(4, c[0] // 2)
        self.final_conv = nn.Sequential(
            nn.Conv2d(c[0], mid, 3, padding=1),
            nn.GroupNorm(max(1, mid // 4), mid), Swish(),
            nn.Conv2d(mid, out_channels, 3, padding=1), nn.Sigmoid())

    def forward(self, z):
        x = self.fc(z)
        x = x.view(-1, CH[3], BASE, BASE)
        x = self.up3(self.res3(x))
        x = self.up2(self.res2(x))
        x = self.up1(self.res1(x))
        return self.final_conv(x)


class SimpleAutoencoder(nn.Module):  # v1:305-393
    def __init__(self):
        super().__init__()
        self.encoder = Encoder()
        self.decoder = Decoder()
        self.classifier = nn.Sequential(
            nn.Linear(LATENT, 512), nn.LayerNorm(512), Swish(), nn.Dropout(0.3),
            nn.Linear(512, 256), nn.LayerNorm(256), Swish(), nn.Dropout(0.2),
            nn.Linear(256, NUM_CLASSES))
        self.register_buffer("class_centers", torch.zeros(NUM_CLASSES, LATENT))
        self.register_buffer("center_counts", torch.zeros(NUM_CLASSES))


class TorchDiscriminator64(nn.Module):  # v1:983-1007
    def __init__(self, in_channels=3):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(in_channels, 64, 4, stride=2, padding=1),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(64, 128, 4, stride=2, padding=1),
            nn.BatchNorm2d(128), nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(128, 256, 4, stride=2, padding=1),
            nn.BatchNorm2d(256), nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(256, 512, 4, stride=2, padding=1),
            nn.BatchNorm2d(512), nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(512, 1, 4), nn.Sigmoid())


class TimeEmbedding(nn.Module):  # v1:401-418
    def __init__(self, n_channels):
        super().__init__()
        self.n_channels = n_channels
        self.lin1 = nn.Linear(n_channels, n_channels * 2)
        self.act = Swish()
        self.lin2 = nn.Linear(n_channels * 2, n_channels)

    def forward(self, t):
        import math
        half = self.n_channels // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = t[:, None] * emb[None, :]
        emb = torch.cat((emb.sin(), emb.cos()), dim=1)
        return self.lin2(self.act(self.lin1(emb)))


class ClassEmbedding(nn.Module):  # v1:421-431
    def __init__(self, num_classes, n_channels):
        super().__init__()
        self.embedding = nn.Embedding(num_classes, n_channels)
        self.lin1 = nn.Linear(n_channels, n_channels)
        self.act = Swish()
        self.lin2 = nn.Linear(n_channels, n_channels)

    def forward(self, c):
        return self.lin2(self.act(self.lin1(self.embedding(c))))


class MultiConditionEmbedding(nn.Module):  # v3:739-749
    def __init__(self, num_flowers, num_colors, n_channels):
        super().__init__()
        self.flower_emb = nn.Embedding(num_flowers, n_channels)
        self.color_emb = nn.Embedding(num_colors, n_channels)
        self.fc = nn.Linear(n_channels * 2, n_channels)

    def forward(self, f, c):
        return self.fc(torch.cat((self.flower_emb(f), self.color_emb(c)), dim=-1))


class ConditionalUNet(nn.Module):  # v1:501-561 / v3:769-853
    def __init__(self, latent_dim, hidden_dims, time_emb_dim, num_classes,
                 num_colors=None, dropout_rate=0.0):
        super().__init__()
        self.dual = num_colors is not None
        self.time_emb = TimeEmbedding(time_emb_dim)
        if self.dual:
            self.multi_cond_emb = MultiConditionEmbedding(
                num_classes, num_colors, time_emb_dim)
        else:
            self.class_emb = ClassEmbedding(num_classes, time_emb_dim)
        self.latent_proj = nn.Linear(latent_dim, hidden_dims[0])
        self.time_projections = nn.ModuleList(
            [nn.Linear(time_emb_dim, d) for d in hidden_dims])
        if self.dual:
            self.cond_projections = nn.ModuleList(
                [nn.Linear(time_emb_dim, d) for d in hidden_dims])
        self.attention_layers = nn.ModuleList(
            [nn.MultiheadAttention(d, 8, dropout=dropout_rate) for d in hidden_dims])
        self.layers = nn.ModuleList()
        for i in range(len(hidden_dims) - 1):
            block = nn.Sequential(
                nn.Linear(hidden_dims[i], hidden_dims[i]),
                nn.LayerNorm(hidden_dims[i]), nn.Dropout(dropout_rate), Swish())
            self.layers.append(nn.ModuleList(
                [block, nn.LayerNorm(hidden_dims[i]),
                 nn.Linear(hidden_dims[i], hidden_dims[i + 1])]))
        self.final_time_proj = nn.Linear(time_emb_dim, hidden_dims[-1])
        self.final_class_proj = nn.Linear(time_emb_dim, hidden_dims[-1])
        self.final_norm = nn.LayerNorm(hidden_dims[-1])
        self.final = nn.Linear(hidden_dims[-1], latent_dim)
        self.residual_weight = nn.Parameter(torch.tensor(0.1))

    def forward(self, x, t, c, color=None):
        t_base = self.time_emb(t)
        c_base = (self.multi_cond_emb(c, color) if self.dual
                  else self.class_emb(c))
        h = self.latent_proj(x)
        for i, (block, layer_norm, down) in enumerate(self.layers):
            h = h + self.time_projections[i](t_base)
            if self.dual:
                h = h + self.cond_projections[i](c_base)
            else:
                h = h + self.time_projections[i](c_base)  # v1:544 shared quirk
            h = h + block(h)
            h_norm = layer_norm(h).unsqueeze(0)  # (1, B, E) seq-first
            h_attn, _ = self.attention_layers[i](h_norm, h_norm, h_norm)
            h = h + h_attn.squeeze(0)
            h = down(h)
        h = h + self.final_time_proj(t_base) + self.final_class_proj(c_base)
        return self.final(self.final_norm(h))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), tree)


def assert_tree_matches_init(imported, init_params):
    """Imported tree must be a drop-in replacement for a fresh init tree."""
    got, want = tree_shapes(imported), tree_shapes(jax.device_get(init_params))
    assert got == want, f"param tree mismatch:\n got {got}\nwant {want}"


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------
def test_autoencoder_import_forward_parity():
    torch.manual_seed(0)
    tm = SimpleAutoencoder().eval()
    with torch.no_grad():
        tm.class_centers.copy_(torch.randn(NUM_CLASSES, LATENT))
        tm.center_counts.copy_(torch.arange(NUM_CLASSES, dtype=torch.float32))
    res = import_autoencoder(tm.state_dict())
    assert res.aux["latent_dim"] == LATENT
    assert res.aux["num_classes"] == NUM_CLASSES
    assert res.unused_keys(tm.state_dict()) == []
    np.testing.assert_array_equal(
        res.aux["class_centers"], tm.class_centers.numpy())

    model = FlowerVAE(latent_dim=LATENT, num_classes=NUM_CLASSES, channels=CH,
                      head_width=HEAD, base_size=BASE)
    # structural drop-in check against a fresh init
    rng = jax.random.PRNGKey(0)
    init = model.init({"params": rng}, jnp.zeros((1, IMG, IMG, 3)), rng,
                      method=model.init_all)["params"]
    assert_tree_matches_init(res.params, init)

    x = np.random.RandomState(1).rand(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar = tm.encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
        trecon = tm.decoder(tmu)
        tlogits = tm.classifier(tmu)
    mu, logvar = model.apply({"params": res.params}, jnp.asarray(x),
                             method=model.encode_with_params)
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(logvar),
        np.clip(tlogvar.numpy(), -2.0, 10.0), **TOL)
    recon = model.apply({"params": res.params}, mu, method=model.decode)
    np.testing.assert_allclose(
        np.asarray(recon), trecon.numpy().transpose(0, 2, 3, 1), **TOL)
    logits = model.apply({"params": res.params}, mu, method=model.classify)
    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(), **TOL)


def test_discriminator_import_structure():
    torch.manual_seed(0)
    tm = TorchDiscriminator64()
    res = import_discriminator(tm.state_dict())
    model = Discriminator64()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert_tree_matches_init(res.params, init)
    # BN -> GN is an approximation and must be audited as such
    assert any("model.3" in k for k in res.approximated)
    assert any("running_mean" in k for k in res.skipped)
    assert res.unused_keys(tm.state_dict()) == []


@pytest.mark.parametrize("dual", [False, True], ids=["v1_shared", "v3_dual"])
def test_latent_denoiser_import_forward_parity(dual):
    torch.manual_seed(0)
    hidden = (8, 16, 32, 16, 8)
    t_emb = 16
    num_colors = 5 if dual else None
    tm = ConditionalUNet(LATENT, list(hidden), t_emb, NUM_CLASSES,
                         num_colors=num_colors).eval()
    res = import_latent_denoiser(tm.state_dict())
    assert res.aux["hidden_dims"] == hidden
    assert res.aux["shared_cond_proj"] is (not dual)
    assert res.aux["num_colors"] == num_colors
    assert res.unused_keys(tm.state_dict()) == []
    # the dead ModuleList tails must be skipped, not silently dropped
    assert any(k.startswith("time_projections.4.") for k in res.skipped)
    assert any(k.startswith("attention_layers.4.") for k in res.skipped)

    model = ConditionalLatentDenoiser(
        latent_dim=LATENT, hidden_dims=hidden, time_emb_dim=t_emb,
        num_classes=NUM_CLASSES, num_colors=num_colors, dropout_rate=0.0,
        shared_cond_proj=not dual)
    rs = np.random.RandomState(2)
    x = rs.randn(3, LATENT).astype(np.float32)
    t = np.array([0, 250, 999], dtype=np.int64)
    c = np.array([0, 3, NUM_CLASSES - 1], dtype=np.int64)
    color = np.array([0, 2, 4], dtype=np.int64) if dual else None

    args = (torch.tensor(x), torch.tensor(t.astype(np.float32)),
            torch.tensor(c))
    if dual:
        args += (torch.tensor(color),)
    with torch.no_grad():
        t_out = tm(*args)

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(c),
                      jnp.asarray(color) if dual else None)["params"]
    assert_tree_matches_init(res.params, init)
    out = model.apply({"params": res.params}, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(c), jnp.asarray(color) if dual else None)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), **TOL)


def test_import_tool_end_to_end(tmp_path):
    """tools/import_torch_checkpoint.py writes a runner-resumable checkpoint
    from a reference-width ConditionalUNet .pt file (v1:1282-1283)."""
    import subprocess
    import sys

    torch.manual_seed(3)
    tm = ConditionalUNet(256, [256, 512, 1024, 512, 256], 256, 102).eval()
    pt = tmp_path / "conditional_diffusion_epoch_123.pt"
    torch.save(tm.state_dict(), str(pt))

    out = tmp_path / "results"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               FLOWERDIFF_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "import_torch_checkpoint.py"),
         "--preset", "v1", "--out", str(out), "--diffusion", str(pt)],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "epoch 123" in proc.stdout

    from flowerdiff.configs import get_preset
    from flowerdiff.train.checkpoints import CheckpointManager, state_to_tree
    from flowerdiff.train.latent_ddpm import create_latent_diffusion_state

    st, _, _ = create_latent_diffusion_state(
        jax.random.PRNGKey(0), get_preset("v1").latent)
    mgr = CheckpointManager(str(out / "ckpt_diffusion"))
    assert mgr.latest_step() == 123
    tree = mgr.restore(123, like=state_to_tree(st))
    kern = np.asarray(tree["params"]["latent_proj"]["kernel"])
    np.testing.assert_allclose(
        kern, tm.latent_proj.weight.detach().numpy().T, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# export (flowerdiff -> reference .pt) round-trips
# ---------------------------------------------------------------------------
def _assert_trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
        for k in a:
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=path)


def test_autoencoder_export_roundtrip():
    """export_autoencoder emits a strict-loadable SimpleAutoencoder
    state_dict with exact forward parity, and import(export(p)) == p."""
    from flowerdiff.utils.torch_import import (
        export_autoencoder,
        import_autoencoder,
    )

    model = FlowerVAE(latent_dim=LATENT, num_classes=NUM_CLASSES, channels=CH,
                      head_width=HEAD, base_size=BASE)
    rng = jax.random.PRNGKey(5)
    params = jax.device_get(model.init(
        {"params": rng}, jnp.zeros((1, IMG, IMG, 3)), rng,
        method=model.init_all)["params"])
    centers = np.random.RandomState(0).randn(
        NUM_CLASSES, LATENT).astype(np.float32)
    counts = np.arange(NUM_CLASSES, dtype=np.float32)

    res = export_autoencoder(params, centers, counts)
    tm = SimpleAutoencoder().eval()
    tm.load_state_dict(
        {k: torch.tensor(v) for k, v in res.params.items()}, strict=True)
    np.testing.assert_array_equal(tm.class_centers.numpy(), centers)

    x = np.random.RandomState(1).rand(2, IMG, IMG, 3).astype(np.float32)
    mu, logvar = model.apply({"params": params}, jnp.asarray(x),
                             method=model.encode_with_params)
    recon = model.apply({"params": params}, mu, method=model.decode)
    logits = model.apply({"params": params}, mu, method=model.classify)
    with torch.no_grad():
        tmu, tlogvar = tm.encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
        trecon = tm.decoder(torch.tensor(np.asarray(mu)))
        tlogits = tm.classifier(torch.tensor(np.asarray(mu)))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(logvar), np.clip(tlogvar.numpy(), -2.0, 10.0), **TOL)
    np.testing.assert_allclose(
        np.asarray(recon), trecon.numpy().transpose(0, 2, 3, 1), **TOL)
    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(), **TOL)

    # exact bijection (float32 transposes/permutes only, no arithmetic)
    back = import_autoencoder(res.params)
    _assert_trees_equal(back.params, params)
    np.testing.assert_array_equal(back.aux["class_centers"], centers)


@pytest.mark.parametrize("dual", [False, True], ids=["v1_shared", "v3_dual"])
def test_latent_denoiser_export_roundtrip(dual):
    """export_latent_denoiser strict-loads into the reference ConditionalUNet
    (dead ModuleList tails synthesized) with forward parity."""
    from flowerdiff.utils.torch_import import (
        export_latent_denoiser,
        import_latent_denoiser,
    )

    hidden = (8, 16, 32, 16, 8)
    t_emb = 16
    num_colors = 5 if dual else None
    model = ConditionalLatentDenoiser(
        latent_dim=LATENT, hidden_dims=hidden, time_emb_dim=t_emb,
        num_classes=NUM_CLASSES, num_colors=num_colors, dropout_rate=0.0,
        shared_cond_proj=not dual)
    rs = np.random.RandomState(4)
    x = rs.randn(3, LATENT).astype(np.float32)
    t = np.array([0, 250, 999], dtype=np.int64)
    c = np.array([0, 3, NUM_CLASSES - 1], dtype=np.int64)
    color = np.array([0, 2, 4], dtype=np.int64) if dual else None
    params = jax.device_get(model.init(
        jax.random.PRNGKey(6), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(c), jnp.asarray(color) if dual else None)["params"])

    res = export_latent_denoiser(params)
    tm = ConditionalUNet(LATENT, list(hidden), t_emb, NUM_CLASSES,
                         num_colors=num_colors).eval()
    tm.load_state_dict(
        {k: torch.tensor(v) for k, v in res.params.items()}, strict=True)
    # dead tails synthesized, audited
    assert any(k.startswith(f"time_projections.{len(hidden) - 1}")
               for k in res.approximated)

    args = (torch.tensor(x), torch.tensor(t.astype(np.float32)),
            torch.tensor(c))
    if dual:
        args += (torch.tensor(color),)
    with torch.no_grad():
        t_out = tm(*args)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(c), jnp.asarray(color) if dual else None)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), **TOL)

    back = import_latent_denoiser(
        {k: v for k, v in res.params.items()})
    _assert_trees_equal(back.params, params)


def test_discriminator_export_structure():
    from flowerdiff.utils.torch_import import (
        export_discriminator,
        import_discriminator,
    )

    model = Discriminator64()
    params = jax.device_get(
        model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))["params"])
    res = export_discriminator(params)
    tm = TorchDiscriminator64()
    tm.load_state_dict(
        {k: torch.tensor(v) for k, v in res.params.items()}, strict=True)
    # GN->BN affine + fresh BN stats are approximations, audited
    assert any("running_var" in k for k in res.approximated)
    back = import_discriminator(res.params)
    _assert_trees_equal(back.params, params)


def test_export_tool_end_to_end(tmp_path):
    """import tool -> export tool round-trips a reference-width denoiser .pt
    bit-exactly (modulo the zero-filled dead tails)."""
    import subprocess
    import sys

    torch.manual_seed(9)
    tm = ConditionalUNet(256, [256, 512, 1024, 512, 256], 256, 102).eval()
    pt = tmp_path / "conditional_diffusion_epoch_77.pt"
    torch.save(tm.state_dict(), str(pt))

    out = tmp_path / "results"
    exp = tmp_path / "exported"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               FLOWERDIFF_PLATFORM="cpu")
    for cmd in (
        [sys.executable, os.path.join(repo, "tools", "import_torch_checkpoint.py"),
         "--preset", "v1", "--out", str(out), "--diffusion", str(pt)],
        [sys.executable, os.path.join(repo, "tools", "export_torch_checkpoint.py"),
         "--preset", "v1", "--results_dir", str(out), "--out", str(exp)],
    ):
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=600)
        assert proc.returncode == 0, proc.stdout + proc.stderr

    back = torch.load(str(exp / "conditional_diffusion_epoch_77.pt"),
                      map_location="cpu", weights_only=True)
    orig = tm.state_dict()
    assert set(back) == set(orig)
    dead = ("time_projections.4.", "attention_layers.4.")
    for k, v in orig.items():
        if any(k.startswith(d) for d in dead):
            assert back[k].abs().sum() == 0  # synthesized zeros
        else:
            np.testing.assert_array_equal(back[k].numpy(), v.numpy(),
                                          err_msg=k)


# ---------------------------------------------------------------------------
# pixel family (v4/v5 SimpleUNet, saved as diffusion_unet_pixels.pth)
# ---------------------------------------------------------------------------
class TorchSimpleUNet(nn.Module):  # v4:37-134 / v5:38-145
    def __init__(self, in_channels=3, base_channels=8, time_emb_dim=16,
                 learnable_residual=False):
        super().__init__()
        c = base_channels
        self.time_embed = nn.Sequential(
            nn.Linear(1, time_emb_dim), nn.ReLU(),
            nn.Linear(time_emb_dim, time_emb_dim))
        self.time_fc1 = nn.Linear(time_emb_dim, c)
        self.time_fc2 = nn.Linear(time_emb_dim, c * 2)
        self.time_fc3 = nn.Linear(time_emb_dim, c * 4)
        if learnable_residual:  # v5:54
            self.res_ratio = nn.Parameter(torch.tensor(0.1))

        def dconv(ci, co):
            return nn.Sequential(
                nn.Conv2d(ci, co, 3, padding=1), nn.ReLU(),
                nn.Conv2d(co, co, 3, padding=1), nn.ReLU())

        self.conv1 = dconv(in_channels, c)
        self.down1 = nn.Conv2d(c, c * 2, 4, stride=2, padding=1)
        self.conv2 = dconv(c * 2, c * 2)
        self.down2 = nn.Conv2d(c * 2, c * 4, 4, stride=2, padding=1)
        self.conv3 = dconv(c * 4, c * 4)
        self.bottleneck = nn.Sequential(
            nn.Conv2d(c * 4, c * 8, 3, padding=1), nn.ReLU(),
            nn.Conv2d(c * 8, c * 4, 3, padding=1), nn.ReLU())
        self.up1 = nn.ConvTranspose2d(c * 4, c * 2, 4, stride=2, padding=1)
        self.conv4 = dconv(c * 4, c * 2)
        self.up2 = nn.ConvTranspose2d(c * 2, c, 4, stride=2, padding=1)
        self.conv5 = dconv(c * 2, c)
        self.out_conv = nn.Conv2d(c, in_channels, 3, padding=1)

    def forward(self, x, t):  # v4:104-134
        B = x.size(0)
        x_input = x
        t_emb = self.time_embed(t.view(B, 1).float())
        x1 = self.conv1(x) + self.time_fc1(t_emb).view(B, -1, 1, 1)
        x2 = self.conv2(self.down1(x1)) + self.time_fc2(t_emb).view(B, -1, 1, 1)
        x3 = self.conv3(self.down2(x2)) + self.time_fc3(t_emb).view(B, -1, 1, 1)
        x4 = self.bottleneck(x3)
        x5 = self.conv4(torch.cat([self.up1(x4), x2], dim=1))
        x6 = self.conv5(torch.cat([self.up2(x5), x1], dim=1))
        out = self.out_conv(x6)
        if hasattr(self, "res_ratio"):  # v5:144
            out = out + self.res_ratio * x_input
        return out


@pytest.mark.parametrize("residual", [False, True], ids=["v4", "v5_res"])
def test_pixel_unet_import_forward_parity(residual):
    from flowerdiff.models.pixel_unet import PixelUNet
    from flowerdiff.utils.torch_import import import_pixel_unet

    torch.manual_seed(11)
    tm = TorchSimpleUNet(learnable_residual=residual).eval()
    res = import_pixel_unet(tm.state_dict())
    assert res.aux == dict(in_channels=3, base_channels=8, time_emb_dim=16,
                           learnable_residual=residual)
    assert res.unused_keys(tm.state_dict()) == []
    assert res.skipped == [] and res.approximated == []  # fully bijective

    model = PixelUNet(base_channels=8, time_emb_dim=16,
                      learnable_residual=residual)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                      jnp.zeros((1,), jnp.int32))["params"]
    assert_tree_matches_init(res.params, init)

    x = np.random.RandomState(12).rand(2, 16, 16, 3).astype(np.float32)
    t = np.array([0, 999], dtype=np.int64)
    with torch.no_grad():
        t_out = tm(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t))
    out = model.apply({"params": res.params}, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 3, 1), **TOL)


@pytest.mark.parametrize("residual", [False, True], ids=["v4", "v5_res"])
def test_pixel_unet_export_roundtrip(residual):
    """export_pixel_unet strict-loads into the reference SimpleUNet with
    forward parity, and import(export(p)) == p bit-exactly."""
    from flowerdiff.models.pixel_unet import PixelUNet
    from flowerdiff.utils.torch_import import (
        export_pixel_unet,
        import_pixel_unet,
    )

    model = PixelUNet(base_channels=8, time_emb_dim=16,
                      learnable_residual=residual)
    params = jax.device_get(model.init(
        jax.random.PRNGKey(13), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1,), jnp.int32))["params"])

    res = export_pixel_unet(params)
    assert res.approximated == []  # nothing synthesized: every key is live
    tm = TorchSimpleUNet(learnable_residual=residual).eval()
    tm.load_state_dict(
        {k: torch.tensor(v) for k, v in res.params.items()}, strict=True)

    x = np.random.RandomState(14).rand(2, 16, 16, 3).astype(np.float32)
    t = np.array([5, 500], dtype=np.int64)
    with torch.no_grad():
        t_out = tm(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t))
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 3, 1), **TOL)

    back = import_pixel_unet(res.params)
    _assert_trees_equal(back.params, params)


def test_pixel_tool_end_to_end(tmp_path):
    """import tool -> export tool round-trips a reference-width v5
    diffusion_unet_pixels.pth (v5:275) bit-exactly through ckpt_pixel/."""
    import subprocess
    import sys

    torch.manual_seed(21)
    tm = TorchSimpleUNet(base_channels=64, time_emb_dim=128,
                         learnable_residual=True).eval()
    pt = tmp_path / "diffusion_unet_pixels.pth"
    torch.save(tm.state_dict(), str(pt))

    out = tmp_path / "results"
    exp = tmp_path / "exported"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", FLOWERDIFF_PLATFORM="cpu")
    for cmd in (
        [sys.executable, os.path.join(repo, "tools", "import_torch_checkpoint.py"),
         "--preset", "v5", "--out", str(out), "--pixel", str(pt)],
        [sys.executable, os.path.join(repo, "tools", "export_torch_checkpoint.py"),
         "--preset", "v5", "--results_dir", str(out), "--out", str(exp)],
    ):
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              timeout=600)
        assert proc.returncode == 0, proc.stdout + proc.stderr

    assert (out / "ckpt_pixel").is_dir()
    back = torch.load(str(exp / "diffusion_unet_pixels.pth"),
                      map_location="cpu", weights_only=True)
    orig = tm.state_dict()
    assert set(back) == set(orig)
    for k, v in orig.items():
        np.testing.assert_array_equal(back[k].numpy(), v.numpy(), err_msg=k)
