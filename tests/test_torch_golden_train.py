"""End-to-end TRAIN-STEP goldens vs a torch replica (VERDICT r2 item 1).

Layer-level goldens (tests/test_torch_golden.py) pin individual layer
semantics; these tests pin the full TRAINING semantics: a tiny-width torch
replica of the reference's inner loops (train_autoencoder
v1/model_train_test.py:1026-1134; train_conditional_diffusion v1:1241-1264)
is fed IDENTICAL initial weights (transplanted from our flax init) and
IDENTICAL batches/noise, then stepped with torch's own optimizers and
schedulers. Over 20 VAE-GAN steps / 12 latent-DDPM steps the per-step loss
components and the post-training parameters must match — covering
AdamW(+decoupled wd), Adam(0.5, 0.999), OneCycleLR position,
CosineAnnealingWarmRestarts position, BCE real/fake ordering (D step on
detached recon, then G against the UPDATED discriminator), the
host-adaptive loss scales (v1:1107-1115), gradient clipping at 1.0, the
epoch-staged gates, and the EMA center update (v1:1132-1134).

Controlled-experiment choices (all documented, none hide semantics):
  - Dropout is disabled on both sides (flax nn.Dropout patched to identity,
    torch modules built without dropout): the two frameworks' dropout mask
    streams cannot be aligned, and dropout semantics are standard layer
    behavior, not the optimizer/loss semantics under test.
  - Reparameterization/epsilon/timestep noise is REPLAYED: the exact
    jax.random draws the step functions make are recomputed on the host
    from the same keys and injected into the torch replica.
  - The VAE-GAN generator LR follows torch's OneCycleLR sequence on BOTH
    sides (the torch-emitted lr table drives an optax schedule), because
    optax's cosine-onecycle interpolates the cycle slightly differently
    (pinned separately in tests/test_train.py::test_onecycle_matches_torch).
    The latent-DDPM arm uses our production SGDR schedule against torch's
    CosineAnnealingWarmRestarts directly — per-epoch positions agree.
  - Perceptual term off (no VGG in the replica); its adaptive-scale code
    path still executes on both sides with a zero term.

These tests do NOT copy reference code: the torch modules replicate OUR
flax modules (NCHW, flax-order flatten via permute) using torch's layer
library, and the loop is written from the reference's documented semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from flowerdiff.train.schedules import vae_gan_loss_gates  # noqa: E402
from flowerdiff.train.vae_gan import (  # noqa: E402
    VAEGANConfig,
    VAEGANState,
    create_vae_gan_state,
    gates_array,
    make_vae_gan_step,
)
from flowerdiff.train.latent_ddpm import (  # noqa: E402
    LatentDiffusionConfig,
    create_latent_diffusion_state,
    make_latent_diffusion_step,
)

B = 4  # batch
NUM_CLASSES = 5
LATENT = 8
CHANNELS = (8, 16, 24, 32)
HEAD = 32
IMG = 64  # Discriminator64's fixed conv ladder needs 64x64 inputs


# --------------------------------------------------------------------------
# flax-dropout kill switch (see module docstring)
# --------------------------------------------------------------------------
@pytest.fixture()
def no_dropout(monkeypatch):
    from flax import linen as fnn

    def identity(self, x, deterministic=True, rng=None):  # noqa: ARG001
        return x

    monkeypatch.setattr(fnn.Dropout, "__call__", identity)
    yield


# --------------------------------------------------------------------------
# weight transplant helpers (flax pytree -> torch modules)
# --------------------------------------------------------------------------
def _t(a):
    return torch.tensor(np.asarray(a).copy())


def load_conv(tm, p):
    """flax Conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)."""
    with torch.no_grad():
        tm.weight.copy_(_t(np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
        if "bias" in p and tm.bias is not None:
            tm.bias.copy_(_t(p["bias"]))


def load_convT(tm, p):
    """flax ConvTranspose (kh, kw, in, out) -> torch (in, out, kh, kw) with
    spatial flip (pinned by tests/test_torch_golden.py)."""
    with torch.no_grad():
        k = np.asarray(p["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
        tm.weight.copy_(_t(k))
        tm.bias.copy_(_t(p["bias"]))


def load_linear(tm, p):
    with torch.no_grad():
        tm.weight.copy_(_t(np.asarray(p["kernel"]).T))
        if "bias" in p and tm.bias is not None:
            tm.bias.copy_(_t(p["bias"]))


def load_affine(tm, p, names=("scale", "bias")):
    """flax LayerNorm/GroupNorm affine -> torch weight/bias."""
    with torch.no_grad():
        tm.weight.copy_(_t(p[names[0]]))
        tm.bias.copy_(_t(p[names[1]]))


# --------------------------------------------------------------------------
# torch replicas of our flax modules (NCHW; flax-order flatten via permute)
# --------------------------------------------------------------------------
class TLN2d(torch.nn.Module):
    """LayerNorm2d (v1:144-156): per-(sample, channel) stats over (H, W),
    biased var, eps 1e-5, per-channel affine."""

    def __init__(self, c):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.ones(c))
        self.bias = torch.nn.Parameter(torch.zeros(c))

    def forward(self, x):
        mean = x.mean(dim=(2, 3), keepdim=True)
        var = x.var(dim=(2, 3), keepdim=True, unbiased=False)
        y = (x - mean) / torch.sqrt(var + 1e-5)
        return y * self.weight.view(1, -1, 1, 1) + self.bias.view(1, -1, 1, 1)

    def load(self, p):
        load_affine(self, p, names=("weight", "bias"))


class TLN(torch.nn.Module):
    """flax nn.LayerNorm (eps 1e-6, biased var)."""

    def __init__(self, d):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.ones(d))
        self.bias = torch.nn.Parameter(torch.zeros(d))

    def forward(self, x):
        return F.layer_norm(x, (x.shape[-1],), self.weight, self.bias, eps=1e-6)

    def load(self, p):
        load_affine(self, p)


class TGN(torch.nn.Module):
    """flax nn.GroupNorm (eps 1e-6)."""

    def __init__(self, groups, c):
        super().__init__()
        self.groups = groups
        self.weight = torch.nn.Parameter(torch.ones(c))
        self.bias = torch.nn.Parameter(torch.zeros(c))

    def forward(self, x):
        return F.group_norm(x, self.groups, self.weight, self.bias, eps=1e-6)

    def load(self, p):
        load_affine(self, p)


class TRes(torch.nn.Module):
    """ResidualBlock (v1:159-178): conv-LN-swish-conv-LN-CA-SA-+res-swish."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
        self.ln1 = TLN2d(c)
        self.conv2 = torch.nn.Conv2d(c, c, 3, padding=1)
        self.ln2 = TLN2d(c)
        self.ca_squeeze = torch.nn.Linear(c, max(1, c // 8), bias=False)
        self.ca_excite = torch.nn.Linear(max(1, c // 8), c, bias=False)
        self.sa_conv = torch.nn.Conv2d(2, 1, 7, padding=3, bias=False)

    def forward(self, x):
        h = F.silu(self.ln1(self.conv1(x)))
        h = self.ln2(self.conv2(h))
        gate = torch.sigmoid(self.ca_excite(F.silu(self.ca_squeeze(h.mean(dim=(2, 3))))))
        h = h * gate[:, :, None, None]
        sa_in = torch.cat([h.mean(dim=1, keepdim=True), h.max(dim=1, keepdim=True).values], dim=1)
        h = h * torch.sigmoid(self.sa_conv(sa_in))
        return F.silu(h + x)

    def load(self, p):
        load_conv(self.conv1, p["conv1"])
        self.ln1.load(p["ln1"])
        load_conv(self.conv2, p["conv2"])
        self.ln2.load(p["ln2"])
        load_linear(self.ca_squeeze, p["ca"]["squeeze"])
        load_linear(self.ca_excite, p["ca"]["excite"])
        load_conv(self.sa_conv, p["sa"]["conv"])


class TEncoder(torch.nn.Module):
    def __init__(self, channels=CHANNELS, latent=LATENT, head=HEAD):
        super().__init__()
        self.stem_conv = torch.nn.Conv2d(3, channels[0], 3, padding=1)
        self.stem_ln = TLN2d(channels[0])
        downs = []
        for i in range(1, len(channels)):
            downs.append(torch.nn.ModuleDict({
                "conv": torch.nn.Conv2d(channels[i - 1], channels[i], 4, stride=2, padding=1),
                "ln": TLN2d(channels[i]),
                "res": TRes(channels[i]),
            }))
        self.downs = torch.nn.ModuleList(downs)
        feat = channels[-1] * (IMG // 2 ** (len(channels) - 1)) ** 2
        for name in ("mu", "logvar"):
            setattr(self, f"{name}_fc1", torch.nn.Linear(feat, head))
            setattr(self, f"{name}_ln", TLN(head))
            setattr(self, f"{name}_fc2", torch.nn.Linear(head, latent))

    def forward(self, x):
        h = F.silu(self.stem_ln(self.stem_conv(x)))
        for d in self.downs:
            h = d["res"](F.silu(d["ln"](d["conv"](h))))
        flat = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)  # flax NHWC order

        def head(name):
            y = getattr(self, f"{name}_fc1")(flat)
            y = F.silu(getattr(self, f"{name}_ln")(y))
            return getattr(self, f"{name}_fc2")(y)

        return head("mu"), head("logvar")

    def load(self, p):
        load_conv(self.stem_conv, p["stem_conv"])
        self.stem_ln.load(p["stem_ln"])
        for i, d in enumerate(self.downs, start=1):
            load_conv(d["conv"], p[f"down{i}_conv"])
            d["ln"].load(p[f"down{i}_ln"])
            d["res"].load(p[f"res{i}"])
        for name in ("mu", "logvar"):
            load_linear(getattr(self, f"{name}_fc1"), p[f"{name}_fc1"])
            getattr(self, f"{name}_ln").load(p[f"{name}_ln"])
            load_linear(getattr(self, f"{name}_fc2"), p[f"{name}_fc2"])


class TDecoder(torch.nn.Module):
    def __init__(self, channels=CHANNELS, latent=LATENT, head=HEAD, base=8):
        super().__init__()
        self.base = base
        deep = channels[-1]
        self.fc1 = torch.nn.Linear(latent, head)
        self.fc1_ln = TLN(head)
        self.fc2 = torch.nn.Linear(head, deep * base * base)
        self.fc2_ln = TLN(deep * base * base)
        self.n_ups = len(channels) - 1
        self.res_deep = TRes(deep)
        ups, gns, ress = [], [], []
        for i in range(self.n_ups, 0, -1):
            ch = channels[i - 1]
            ups.append(torch.nn.ConvTranspose2d(channels[i], ch, 4, stride=2, padding=1))
            gns.append(TGN(max(1, ch // 8), ch))
            if i > 1:
                ress.append(TRes(ch))
        self.ups = torch.nn.ModuleList(ups)
        self.gns = torch.nn.ModuleList(gns)
        self.ress = torch.nn.ModuleList(ress)
        mid = max(4, channels[0] // 2)
        self.final_conv1 = torch.nn.Conv2d(channels[0], mid, 3, padding=1)
        self.final_gn = TGN(max(1, mid // 4), mid)
        self.final_conv2 = torch.nn.Conv2d(mid, 3, 3, padding=1)

    def forward(self, z):
        h = F.silu(self.fc1_ln(self.fc1(z)))
        h = F.silu(self.fc2_ln(self.fc2(h)))
        # flax reshapes (B, base, base, C) NHWC; permute to NCHW
        h = h.view(-1, self.base, self.base, h.shape[-1] // self.base ** 2)
        h = h.permute(0, 3, 1, 2)
        h = self.res_deep(h)
        for j in range(self.n_ups):
            h = F.silu(self.gns[j](self.ups[j](h)))
            if j < len(self.ress):
                h = self.ress[j](h)
        h = F.silu(self.final_gn(self.final_conv1(h)))
        return torch.sigmoid(self.final_conv2(h))

    def load(self, p):
        load_linear(self.fc1, p["fc1"])
        self.fc1_ln.load(p["fc1_ln"])
        load_linear(self.fc2, p["fc2"])
        self.fc2_ln.load(p["fc2_ln"])
        self.res_deep.load(p[f"res{self.n_ups}"])
        for j, i in enumerate(range(self.n_ups, 0, -1)):
            load_convT(self.ups[j], p[f"up{i}_conv"])
            self.gns[j].load(p[f"up{i}_gn"])
            if i > 1:
                self.ress[j].load(p[f"res{i - 1}"])
        load_conv(self.final_conv1, p["final_conv1"])
        self.final_gn.load(p["final_gn"])
        load_conv(self.final_conv2, p["final_conv2"])


class TClassifier(torch.nn.Module):
    """LatentClassifier without the dropouts (disabled on both sides)."""

    def __init__(self, latent=LATENT, num_classes=NUM_CLASSES):
        super().__init__()
        self.fc1 = torch.nn.Linear(latent, 512)
        self.ln1 = TLN(512)
        self.fc2 = torch.nn.Linear(512, 256)
        self.ln2 = TLN(256)
        self.out = torch.nn.Linear(256, num_classes)

    def forward(self, z):
        h = F.silu(self.ln1(self.fc1(z)))
        h = F.silu(self.ln2(self.fc2(h)))
        return self.out(h)

    def load(self, p):
        load_linear(self.fc1, p["fc1"])
        self.ln1.load(p["ln1"])
        load_linear(self.fc2, p["fc2"])
        self.ln2.load(p["ln2"])
        load_linear(self.out, p["out"])


class TDisc(torch.nn.Module):
    """Discriminator64 replica: fixed (64,128,256,512) ladder, GroupNorm(32),
    LeakyReLU(0.2), 4x4 valid head -> logits."""

    def __init__(self):
        super().__init__()
        chans = (64, 128, 256, 512)
        convs, norms = [], []
        prev = 3
        for i, ch in enumerate(chans):
            convs.append(torch.nn.Conv2d(prev, ch, 4, stride=2, padding=1))
            norms.append(TGN(32, ch) if i > 0 else torch.nn.Identity())
            prev = ch
        self.convs = torch.nn.ModuleList(convs)
        self.norms = torch.nn.ModuleList(norms)
        self.head = torch.nn.Conv2d(512, 1, 4)

    def forward(self, x):
        h = x
        for conv, norm in zip(self.convs, self.norms):
            h = F.leaky_relu(norm(conv(h)), 0.2)
        return self.head(h).view(x.shape[0])

    def load(self, p):
        for i, conv in enumerate(self.convs):
            load_conv(conv, p[f"conv{i}"])
            if i > 0:
                self.norms[i].load(p[f"norm{i}"])
        load_conv(self.head, p["head"])


def euclid(x, y):
    d = (x - y).reshape(x.shape[0], -1)
    return torch.sqrt((d * d).sum(dim=1) + 1e-8).mean()


def kl_torch(mu, logvar):
    mu = torch.clamp(mu, -10.0, 10.0)
    logvar = torch.clamp(logvar, -2.0, 10.0)
    kl = -0.5 * (1.0 + logvar - mu ** 2 - torch.exp(logvar)).sum(dim=1)
    return torch.clamp(kl, 0.0, 100.0).mean() + 1e-4 * (mu ** 2).sum()


# --------------------------------------------------------------------------
# the VAE-GAN 20-step golden
# --------------------------------------------------------------------------
@pytest.mark.slow
def test_vae_gan_train_trajectory_matches_torch(no_dropout):
    steps = 20
    cfg = VAEGANConfig(
        latent_dim=LATENT, channels=CHANNELS, head_width=HEAD,
        num_classes=NUM_CLASSES, use_perceptual=False, total_steps=steps,
    )
    state, vae, disc = create_vae_gan_state(jax.random.key(0), cfg, img_size=IMG)

    # torch OneCycleLR's exact lr sequence drives BOTH sides (see docstring).
    dummy = torch.nn.Linear(1, 1)
    d_opt_probe = torch.optim.AdamW(dummy.parameters(), lr=cfg.lr)
    probe_sched = torch.optim.lr_scheduler.OneCycleLR(
        d_opt_probe, max_lr=cfg.lr, total_steps=steps, pct_start=0.3,
        div_factor=25, final_div_factor=1000,
    )
    lr_table = []
    for _ in range(steps):
        lr_table.append(d_opt_probe.param_groups[0]["lr"])
        d_opt_probe.step()
        probe_sched.step()
    lr_arr = jnp.asarray(lr_table, jnp.float32)

    g_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            lambda count: lr_arr[jnp.clip(count, 0, steps - 1)],
            weight_decay=cfg.weight_decay,
        ),
    )
    state = VAEGANState(
        gen=TrainState.create(apply_fn=vae.apply, params=state.gen.params, tx=g_tx),
        disc=state.disc,
        centers=state.centers,
    )
    step_fn = make_vae_gan_step(vae, disc, cfg)

    # ---- identical data; epoch schedule sweeps every gate stage ----
    rng_np = np.random.default_rng(7)
    batches = [
        (rng_np.uniform(size=(B, IMG, IMG, 3)).astype(np.float32),
         rng_np.integers(0, NUM_CLASSES, (B,)))
        for _ in range(steps)
    ]
    epoch_for_step = [i * 12 for i in range(steps)]  # 0..228: all stages
    base_rng = jax.random.key(42)
    # replay the per-step reparameterization noise (train/vae_gan.py:169)
    eps_list = []
    for i in range(steps):
        rng_i = jax.random.fold_in(base_rng, i)
        reparam_rng, _ = jax.random.split(jax.random.fold_in(rng_i, i))
        eps_list.append(np.asarray(jax.random.normal(reparam_rng, (B, LATENT))))

    gp0 = jax.device_get(state.gen.params)
    dp0 = jax.device_get(state.disc.params)

    def run_torch_replica(dtype, grad_noise=0.0):
        """The reference loop (v1:1026-1134) on transplanted weights, in the
        given float dtype. grad_noise injects relative gradient noise each
        step -- the faithful model of HOW jax differs from torch (different
        conv-backward reduction orders perturb every gradient, flipping
        near-zero Adam directions), calibrating how that perturbation class
        propagates through the TRUE loop semantics. Returns (metrics list,
        modules, centers)."""
        gen = torch.Generator().manual_seed(123)

        def perturb(params):
            if grad_noise == 0.0:
                return
            with torch.no_grad():
                for p_ in params:
                    if p_.grad is not None:
                        g = p_.grad
                        noise = torch.randn(g.shape, generator=gen,
                                            dtype=g.dtype)
                        rms = g.pow(2).mean().sqrt()
                        g.add_(noise * (grad_noise * (g.abs() + rms)))
        enc_t, dec_t, cls_t, disc_t = (TEncoder(), TDecoder(), TClassifier(),
                                       TDisc())
        enc_t.load(gp0["encoder"])
        dec_t.load(gp0["decoder"])
        cls_t.load(gp0["classifier"])
        disc_t.load(dp0)
        for m_ in (enc_t, dec_t, cls_t, disc_t):
            m_.to(dtype)
        g_params = (list(enc_t.parameters()) + list(dec_t.parameters())
                    + list(cls_t.parameters()))
        g_opt = torch.optim.AdamW(g_params, lr=cfg.lr,
                                  weight_decay=cfg.weight_decay)
        g_sched = torch.optim.lr_scheduler.OneCycleLR(
            g_opt, max_lr=cfg.lr, total_steps=steps, pct_start=0.3,
            div_factor=25, final_div_factor=1000,
        )
        d_opt = torch.optim.Adam(disc_t.parameters(), lr=cfg.d_lr,
                                 betas=cfg.d_betas)
        centers_t = torch.zeros(NUM_CLASSES, LATENT, dtype=dtype)

        metrics = []
        for i in range(steps):
            imgs_np, labels_np = batches[i]
            gates = vae_gan_loss_gates(epoch_for_step[i], 240)
            x = torch.tensor(imgs_np.transpose(0, 3, 1, 2)).to(dtype)
            labels = torch.tensor(labels_np)
            eps = torch.tensor(eps_list[i]).to(dtype)

            mu, logvar = enc_t(x)
            z = mu + eps * torch.exp(0.5 * torch.clamp(logvar, -2.0, 10.0))
            recon = dec_t(z)

            d_opt.zero_grad()
            real_logits = disc_t(x)
            fake_logits = disc_t(recon.detach())
            d_loss = 0.5 * (
                F.binary_cross_entropy_with_logits(
                    real_logits, torch.ones_like(real_logits))
                + F.binary_cross_entropy_with_logits(
                    fake_logits, torch.zeros_like(fake_logits))
            )
            d_loss.backward()
            perturb(disc_t.parameters())
            d_opt.step()

            recon_loss = euclid(recon, x)
            kl = kl_torch(mu, logvar)
            ce = F.cross_entropy(cls_t(z), labels)
            center = torch.sqrt(
                ((z - centers_t[labels]) ** 2).sum(dim=1) + 1e-8).mean()
            adv = F.binary_cross_entropy_with_logits(
                disc_t(recon), torch.ones_like(real_logits))
            r, p_, k_, a_ = recon_loss.item(), 0.0, kl.item(), adv.item()
            big = r > 1e-8
            perceptual_scale = min(1.0, r / (p_ + 1e-8)) if big else 1.0
            kl_scale = min(1.0, r / (k_ + 1e-8)) if (big and k_ > 0) else 1.0
            gan_scale = min(1.0, r / (a_ + 1e-8)) if big else 1.0
            total = (
                cfg.lambda_recon * recon_loss
                + cfg.lambda_vgg * perceptual_scale * 0.0
                + gates.kl_weight * kl_scale * gates.kl_factor * kl
                + cfg.lambda_cls * gates.cls_factor * ce
                + cfg.lambda_center * gates.center_factor * center
                + cfg.lambda_gan * gan_scale * adv
            )
            g_opt.zero_grad()
            total.backward()
            perturb(g_params)
            torch.nn.utils.clip_grad_norm_(g_params, cfg.grad_clip)
            g_opt.step()
            g_sched.step()

            if gates.update_centers > 0:  # EMA update (v1:1132-1134)
                with torch.no_grad():
                    zd = z.detach()
                    for c in labels.unique():
                        centers_t[c] = (0.9 * centers_t[c]
                                        + 0.1 * zd[labels == c].mean(dim=0))

            metrics.append({
                "recon": recon_loss.item(), "kl": kl.item(),
                "class": ce.item(), "center": center.item(),
                "gan": adv.item(), "d_loss": d_loss.item(),
                "total": total.item(),
            })
        return metrics, (enc_t, dec_t, cls_t, disc_t), centers_t

    # ---- jax trajectory (the production step function) ----
    jax_metrics = []
    for i in range(steps):
        imgs_np, labels_np = batches[i]
        gates = vae_gan_loss_gates(epoch_for_step[i], 240)
        state, m = step_fn(
            state, jnp.asarray(imgs_np), jnp.asarray(labels_np),
            gates_array(gates), jax.random.fold_in(base_rng, i), None,
        )
        jax_metrics.append({k: float(v) for k, v in m.items()})

    # ---- self-calibrating noise envelope ----
    # The GAN pair amplifies perturbations (~2-10x/step through the
    # adversarial Adam coupling), so fixed tolerances cannot separate noise
    # from semantics over 20 steps. The replica therefore runs THREE times:
    # f32, f64, and f32 with 3e-5 relative gradient noise each step -- the
    # scale and entry point of jax<->torch cross-library conv-backward
    # differences (plain f32-vs-f64 rounding, ~1e-7, under-estimates it).
    # |t32p - t64| measures exactly how far a perturbation of jax's size
    # and kind drifts under the TRUE loop semantics; the jax trajectory must stay within a small
    # multiple of that envelope around t64. A semantic bug (wrong lr
    # position, gate, clip, wd, update order) displaces the TRUE
    # trajectory and leaves the envelope; step 0-1 are additionally pinned
    # strictly (they are amplification-free).
    t32, t32_mods, _ = run_torch_replica(torch.float32)
    t32p, t32p_mods, _ = run_torch_replica(torch.float32, grad_noise=3e-5)
    t64, mods64, centers64 = run_torch_replica(torch.float64)
    for key in ("recon", "kl", "class", "center", "gan", "d_loss", "total"):
        ours = np.array([m[key] for m in jax_metrics])
        a32 = np.array([m[key] for m in t32])
        a32p = np.array([m[key] for m in t32p])
        a64 = np.array([m[key] for m in t64])
        np.testing.assert_allclose(   # amplification-free head, strict
            ours[:2], a64[:2], rtol=1e-4, atol=1e-5,
            err_msg=f"loss component {key!r} mismatch at step 0/1",
        )
        envelope = np.maximum(np.abs(a32p - a64), np.abs(a32 - a64))
        # KL's exponential/clamp structure (exp(logvar), per-sample [0,100]
        # clip, mu/logvar clamps) makes it hypersensitive at spike steps;
        # its SEMANTICS (clamps, mu-reg, weighting) are pinned exactly by
        # the strict step-0/1 check above, so it gets a wider noise floor.
        floor = 4e-2 if key == "kl" else 1e-2
        bound = 30.0 * envelope + floor * np.abs(a64).max() + 1e-4
        bad = np.abs(ours - a64) > bound
        assert not bad.any(), (
            f"loss component {key!r} left the float-noise envelope at steps "
            f"{np.nonzero(bad)[0].tolist()}: |jax-t64|="
            f"{np.abs(ours - a64)[bad]} vs bound {bound[bad]} "
            f"(envelope {envelope[bad]})"
        )

    # ---- final-parameter parity: transplant the final flax params into
    # fresh torch modules and diff against the f64-trained replica, bounded
    # by the f32 replica's own drift (same envelope logic). ----
    enc_f, dec_f, cls_f, disc_f = TEncoder(), TDecoder(), TClassifier(), TDisc()
    gp_final = jax.device_get(state.gen.params)
    enc_f.load(gp_final["encoder"])
    dec_f.load(gp_final["decoder"])
    cls_f.load(gp_final["classifier"])
    disc_f.load(jax.device_get(state.disc.params))
    for ported, ref64, ref32, ref32p, what in (
        (enc_f, mods64[0], t32_mods[0], t32p_mods[0], "encoder"),
        (dec_f, mods64[1], t32_mods[1], t32p_mods[1], "decoder"),
        (cls_f, mods64[2], t32_mods[2], t32p_mods[2], "classifier"),
        (disc_f, mods64[3], t32_mods[3], t32p_mods[3], "discriminator"),
    ):
        for (name, a), (_, b64), (_, b32), (_, b32p) in zip(
            ported.state_dict().items(), ref64.state_dict().items(),
            ref32.state_dict().items(), ref32p.state_dict().items(),
        ):
            a = a.detach().numpy().astype(np.float64)
            b64 = b64.detach().numpy()
            drift = max(np.abs(b32.detach().numpy() - b64).max(),
                        np.abs(b32p.detach().numpy() - b64).max())
            bound = 30.0 * drift + 20 * cfg.lr
            assert np.max(np.abs(a - b64)) < bound, (
                f"{what}.{name}: |jax-t64|={np.max(np.abs(a - b64)):.2e} "
                f"vs bound {bound:.2e} (calibration drift {drift:.2e})"
            )

    # Centers are 0.1-weighted EMA sums of z values that have accumulated
    # percent-level chaotic drift by the update steps (14+), so many small
    # entries fail an elementwise rtol; the EMA semantics are pinned by the
    # 'center' loss trajectory above (it reads the carried centers each
    # step). Here: scale-level agreement.
    c_jax = np.asarray(jax.device_get(state.centers), np.float64)
    c_t = centers64.numpy()
    scale = np.abs(c_t).max()
    assert np.abs(c_jax - c_t).max() < 0.05 * scale + 1e-4, (
        f"centers diverged: max|delta|={np.abs(c_jax - c_t).max():.3e} "
        f"vs scale {scale:.3e}"
    )


# --------------------------------------------------------------------------
# the latent-DDPM golden (AdamW + SGDR + euclidean eps-loss, v1:1241-1264)
# --------------------------------------------------------------------------
class TTimeEmbedding(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.lin1 = torch.nn.Linear(dim, dim * 2)
        self.lin2 = torch.nn.Linear(dim * 2, dim)

    def forward(self, t):
        half = self.dim // 2
        k = torch.arange(half, dtype=torch.float32)
        freqs = torch.exp(k * (-np.log(10000.0) / (half - 1)))
        args = t.float()[:, None] * freqs[None, :]
        emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
        if emb.shape[-1] < self.dim:
            emb = F.pad(emb, (0, self.dim - emb.shape[-1]))
        return self.lin2(F.silu(self.lin1(emb)))

    def load(self, p):
        load_linear(self.lin1, p["lin1"])
        load_linear(self.lin2, p["lin2"])


class TClassEmbedding(torch.nn.Module):
    def __init__(self, num_classes, dim):
        super().__init__()
        self.table = torch.nn.Parameter(torch.zeros(num_classes, dim))
        self.lin1 = torch.nn.Linear(dim, dim)
        self.lin2 = torch.nn.Linear(dim, dim)

    def forward(self, c):
        return self.lin2(F.silu(self.lin1(self.table[c])))

    def load(self, p):
        with torch.no_grad():
            self.table.copy_(_t(p["embedding"]["embedding"]))
        load_linear(self.lin1, p["lin1"])
        load_linear(self.lin2, p["lin2"])


class TDenoiser(torch.nn.Module):
    """ConditionalLatentDenoiser replica (v1/v2 semantics, no dropout).
    Length-1 attention: softmax over one key is 1, but we compute the full
    packed-qkv formula anyway to mirror the flax module."""

    def __init__(self, latent, hidden, time_dim, num_classes,
                 shared_cond_proj=True, global_skip=False):
        super().__init__()
        self.hidden = tuple(hidden)
        self.shared = shared_cond_proj
        self.global_skip = global_skip
        self.time_emb = TTimeEmbedding(time_dim)
        self.cond_emb = TClassEmbedding(num_classes, time_dim)
        self.latent_proj = torch.nn.Linear(latent, hidden[0])
        n = len(hidden) - 1
        self.time_projs = torch.nn.ModuleList(
            [torch.nn.Linear(time_dim, hidden[i]) for i in range(n)])
        if not shared_cond_proj:
            self.cond_projs = torch.nn.ModuleList(
                [torch.nn.Linear(time_dim, hidden[i]) for i in range(n)])
        self.block_fcs = torch.nn.ModuleList(
            [torch.nn.Linear(hidden[i], hidden[i]) for i in range(n)])
        self.block_lns = torch.nn.ModuleList([TLN(hidden[i]) for i in range(n)])
        self.stage_lns = torch.nn.ModuleList([TLN(hidden[i]) for i in range(n)])
        self.attn_qkvs = torch.nn.ModuleList(
            [torch.nn.Linear(hidden[i], 3 * hidden[i]) for i in range(n)])
        self.attn_outs = torch.nn.ModuleList(
            [torch.nn.Linear(hidden[i], hidden[i]) for i in range(n)])
        self.downsamples = torch.nn.ModuleList(
            [torch.nn.Linear(hidden[i], hidden[i + 1]) for i in range(n)])
        self.final_time_proj = torch.nn.Linear(time_dim, hidden[-1])
        self.final_cond_proj = torch.nn.Linear(time_dim, hidden[-1])
        self.final_norm = TLN(hidden[-1])
        self.final = torch.nn.Linear(hidden[-1], latent)
        self.residual_weight = torch.nn.Parameter(torch.tensor(0.1))

    def forward(self, x, t, c):
        t_base = self.time_emb(t)
        c_base = self.cond_emb(c)
        h = self.latent_proj(x)
        for i in range(len(self.hidden) - 1):
            h = h + self.time_projs[i](t_base)
            if self.shared:
                h = h + self.time_projs[i](c_base)
            else:
                h = h + self.cond_projs[i](c_base)
            h = h + F.silu(self.block_lns[i](self.block_fcs[i](h)))
            hn = self.stage_lns[i](h)
            qkv = self.attn_qkvs[i](hn)
            _, _, v = qkv.chunk(3, dim=-1)
            h = h + self.attn_outs[i](v)  # softmax over one key == 1
            h = self.downsamples[i](h)
        h = h + self.final_time_proj(t_base) + self.final_cond_proj(c_base)
        out = self.final(self.final_norm(h))
        if self.global_skip:
            out = out + torch.sigmoid(self.residual_weight) * self.final(x)
        else:
            out = out + 0.0 * self.residual_weight  # register wd-only param
        return out

    def load(self, p):
        self.time_emb.load(p["time_emb"])
        self.cond_emb.load(p["cond_emb"])
        load_linear(self.latent_proj, p["latent_proj"])
        for i in range(len(self.hidden) - 1):
            load_linear(self.time_projs[i], p[f"time_proj_{i}"])
            if not self.shared:
                load_linear(self.cond_projs[i], p[f"cond_proj_{i}"])
            load_linear(self.block_fcs[i], p[f"block_fc_{i}"])
            self.block_lns[i].load(p[f"block_ln_{i}"])
            self.stage_lns[i].load(p[f"stage_ln_{i}"])
            load_linear(self.attn_qkvs[i], p[f"attn_{i}"]["qkv"])
            load_linear(self.attn_outs[i], p[f"attn_{i}"]["out"])
            load_linear(self.downsamples[i], p[f"downsample_{i}"])
        load_linear(self.final_time_proj, p["final_time_proj"])
        load_linear(self.final_cond_proj, p["final_cond_proj"])
        self.final_norm.load(p["final_norm"])
        load_linear(self.final, p["final"])
        with torch.no_grad():
            self.residual_weight.copy_(_t(p["residual_weight"]))


@pytest.mark.slow
@pytest.mark.parametrize("global_skip", [False, True])
def test_latent_ddpm_train_trajectory_matches_torch(no_dropout, global_skip):
    steps = 12
    cfg = LatentDiffusionConfig(
        # hidden[-1] == latent_dim: the v2 global skip reuses `final` on the
        # raw input (v2:561), as in the reference's 256==256
        latent_dim=LATENT, hidden_dims=(8, 16, 8), time_emb_dim=8,
        num_classes=NUM_CLASSES, n_steps=50, steps_per_epoch=1,
        t0=3, t_mult=2, global_skip=global_skip,
    )
    state, model, sched = create_latent_diffusion_state(jax.random.key(1), cfg)

    # frozen tiny VAE for the in-step encode (v1:1257-1259)
    vae_cfg = VAEGANConfig(
        latent_dim=LATENT, channels=CHANNELS, head_width=HEAD,
        num_classes=NUM_CLASSES, use_perceptual=False, total_steps=steps,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(2), vae_cfg, img_size=IMG)
    vae_params = vstate.gen.params
    step_fn = make_latent_diffusion_step(model, vae, sched, cfg)

    enc_t = TEncoder()
    enc_t.load(jax.device_get(vae_params)["encoder"])
    den_t = TDenoiser(LATENT, cfg.hidden_dims, cfg.time_emb_dim, NUM_CLASSES,
                      shared_cond_proj=cfg.shared_cond_proj,
                      global_skip=global_skip)
    den_t.load(jax.device_get(state.params))
    opt = torch.optim.AdamW(den_t.parameters(), lr=cfg.lr,
                            weight_decay=cfg.weight_decay)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=cfg.t0, T_mult=cfg.t_mult,
    )

    betas = np.asarray(jax.device_get(sched.beta), np.float64)
    alphas = 1.0 - betas
    abar = np.cumprod(alphas)

    rng_np = np.random.default_rng(3)
    batches = [
        (rng_np.uniform(size=(B, IMG, IMG, 3)).astype(np.float32),
         rng_np.integers(0, NUM_CLASSES, (B,)))
        for _ in range(steps)
    ]
    base_rng = jax.random.key(11)

    jax_losses, torch_losses = [], []
    for i in range(steps):
        imgs_np, labels_np = batches[i]
        rng_i = jax.random.fold_in(base_rng, i)
        # replay the step's RNG derivations (train/latent_ddpm.py:127-128,
        # diffusion/ddpm.py ddpm_eps_loss)
        k = jax.random.fold_in(rng_i, i)
        enc_key, loss_key, _, _ = jax.random.split(k, 4)
        eps_enc = np.asarray(jax.random.normal(enc_key, (B, LATENT)))
        t_key, eps_key = jax.random.split(loss_key)
        t_np = np.asarray(jax.random.randint(t_key, (B,), 0, cfg.n_steps))
        eps_np = np.asarray(jax.random.normal(eps_key, (B, LATENT)))

        state, loss = step_fn(
            state, vae_params, sched, jnp.asarray(imgs_np),
            jnp.asarray(labels_np), None, rng_i, None,
        )
        jax_losses.append(float(loss))

        # ---- torch replica (reference loop semantics, v1:1254-1264) ----
        x = torch.tensor(imgs_np.transpose(0, 3, 1, 2))
        with torch.no_grad():
            mu, logvar = enc_t(x)
            logvar = torch.clamp(logvar, -2.0, 10.0)
            z = mu + torch.tensor(eps_enc) * torch.exp(0.5 * logvar)
        t = torch.tensor(t_np, dtype=torch.long)
        eps = torch.tensor(eps_np)
        ab = torch.tensor(abar[t_np], dtype=torch.float32)[:, None]
        xt = torch.sqrt(ab) * z + torch.sqrt(1.0 - ab) * eps
        eps_theta = den_t(xt, t, torch.tensor(labels_np))
        loss_t = euclid(eps, eps_theta)
        opt.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(den_t.parameters(), cfg.grad_clip)
        opt.step()
        tsched.step()  # per-epoch step; steps_per_epoch=1 (v1:1269)
        torch_losses.append(loss_t.item())

    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(torch_losses), rtol=2e-3, atol=1e-5,
        err_msg="latent-DDPM loss trajectory diverged from the torch replica",
    )

    # final params: transplant flax-final into a fresh replica and diff
    den_f = TDenoiser(LATENT, cfg.hidden_dims, cfg.time_emb_dim, NUM_CLASSES,
                      shared_cond_proj=cfg.shared_cond_proj,
                      global_skip=global_skip)
    den_f.load(jax.device_get(state.params))
    for (name, a), (_, b) in zip(
        den_t.state_dict().items(), den_f.state_dict().items()
    ):
        a, b = a.detach().numpy(), b.detach().numpy()
        assert np.max(np.abs(a - b)) < 5e-4, (
            f"denoiser.{name}: max|delta|={np.max(np.abs(a - b)):.2e}"
        )


# --------------------------------------------------------------------------
# Pixel-family (v4/v5) train golden: Adam(1e-4) + MSE eps-loss
# (train_diffusion, v4/model_train_test.py:239-253; v5 adds the learnable
# output residual res_ratio, v5:54,144)
# --------------------------------------------------------------------------
class TPixelUNet(torch.nn.Module):
    """NCHW torch replica of models/pixel_unet.py::PixelUNet."""

    def __init__(self, base=8, temb=16, learnable_residual=False):
        super().__init__()
        C = torch.nn.Conv2d
        CT = torch.nn.ConvTranspose2d
        L = torch.nn.Linear
        self.time_fc_a = L(1, temb)
        self.time_fc_b = L(temb, temb)
        self.time_to_s1 = L(temb, base)
        self.time_to_s2 = L(temb, base * 2)
        self.time_to_s3 = L(temb, base * 4)
        for name, cin, cout in (
            ("conv1_a", 3, base), ("conv1_b", base, base),
            ("conv2_a", base * 2, base * 2), ("conv2_b", base * 2, base * 2),
            ("conv3_a", base * 4, base * 4), ("conv3_b", base * 4, base * 4),
            ("bottleneck_a", base * 4, base * 8),
            ("bottleneck_b", base * 8, base * 4),
            ("conv4_a", base * 4, base * 2), ("conv4_b", base * 2, base * 2),
            ("conv5_a", base * 2, base), ("conv5_b", base, base),
            ("out_conv", base, 3),
        ):
            setattr(self, name, C(cin, cout, 3, padding=1))
        self.down1 = C(base, base * 2, 4, stride=2, padding=1)
        self.down2 = C(base * 2, base * 4, 4, stride=2, padding=1)
        self.up1 = CT(base * 4, base * 2, 4, stride=2, padding=1)
        self.up2 = CT(base * 2, base, 4, stride=2, padding=1)
        self.learnable_residual = learnable_residual
        if learnable_residual:
            self.res_ratio = torch.nn.Parameter(torch.tensor(0.1))

    def forward(self, x, t):
        r = F.relu
        temb = r(self.time_fc_a(t.float().view(-1, 1)))
        temb = self.time_fc_b(temb)
        x1 = r(self.conv1_b(r(self.conv1_a(x))))
        x1 = x1 + self.time_to_s1(temb)[:, :, None, None]
        x2 = r(self.conv2_b(r(self.conv2_a(self.down1(x1)))))
        x2 = x2 + self.time_to_s2(temb)[:, :, None, None]
        x3 = r(self.conv3_b(r(self.conv3_a(self.down2(x2)))))
        x3 = x3 + self.time_to_s3(temb)[:, :, None, None]
        h = r(self.bottleneck_b(r(self.bottleneck_a(x3))))
        h = torch.cat([self.up1(h), x2], dim=1)
        h = r(self.conv4_b(r(self.conv4_a(h))))
        h = torch.cat([self.up2(h), x1], dim=1)
        h = r(self.conv5_b(r(self.conv5_a(h))))
        out = self.out_conv(h)
        if self.learnable_residual:
            out = out + self.res_ratio * x
        return out

    def load(self, p):
        for name in ("time_fc_a", "time_fc_b", "time_to_s1", "time_to_s2",
                     "time_to_s3"):
            load_linear(getattr(self, name), p[name])
        for name in ("conv1_a", "conv1_b", "conv2_a", "conv2_b", "conv3_a",
                     "conv3_b", "bottleneck_a", "bottleneck_b", "conv4_a",
                     "conv4_b", "conv5_a", "conv5_b", "out_conv", "down1",
                     "down2"):
            load_conv(getattr(self, name), p[name])
        load_convT(self.up1, p["up1"])
        load_convT(self.up2, p["up2"])
        if self.learnable_residual:
            with torch.no_grad():
                self.res_ratio.copy_(_t(p["res_ratio"]))


@pytest.mark.slow
@pytest.mark.parametrize("learnable_residual", [False, True])
def test_pixel_ddpm_train_trajectory_matches_torch(learnable_residual):
    """Pixel DDPM (v4/v5) train semantics vs torch: Adam(1e-4, 0.9, 0.999)
    + MSE epsilon loss + uniform t (v4:239-253, v4:177-183); v5 arm covers
    the learnable res_ratio gradient path (v5:54,144)."""
    from flowerdiff.train.pixel_ddpm import (
        PixelDiffusionConfig,
        create_pixel_diffusion_state,
        make_pixel_diffusion_step,
    )

    steps = 12
    img = 16
    cfg = PixelDiffusionConfig(
        img_size=img, base_channels=8, time_emb_dim=16, n_steps=50,
        learnable_residual=learnable_residual,
    )
    state, model, sched = create_pixel_diffusion_state(jax.random.key(4), cfg)
    step_fn = make_pixel_diffusion_step(model, sched)

    tm = TPixelUNet(base=8, temb=16, learnable_residual=learnable_residual)
    tm.load(jax.device_get(state.params))
    opt = torch.optim.Adam(tm.parameters(), lr=cfg.lr)

    abar = np.cumprod(1.0 - np.asarray(jax.device_get(sched.beta), np.float64))

    rng_np = np.random.default_rng(7)
    batches = [rng_np.uniform(size=(B, img, img, 3)).astype(np.float32)
               for _ in range(steps)]
    base_rng = jax.random.key(13)

    jax_losses, torch_losses = [], []
    for i in range(steps):
        rng_i = jax.random.fold_in(base_rng, i)
        # replay the step's draws (train/pixel_ddpm.py: fold_in(rng, step);
        # diffusion/ddpm.py::ddpm_eps_loss t/eps split)
        k = jax.random.fold_in(rng_i, i)
        t_key, eps_key = jax.random.split(k)
        t_np = np.asarray(jax.random.randint(t_key, (B,), 0, cfg.n_steps))
        eps_np = np.asarray(
            jax.random.normal(eps_key, (B, img, img, 3), jnp.float32))

        state, loss = step_fn(state, sched, jnp.asarray(batches[i]), rng_i)
        jax_losses.append(float(loss))

        # ---- torch replica (v4:244-249 loop body) ----
        x0 = torch.tensor(batches[i].transpose(0, 3, 1, 2))
        eps = torch.tensor(eps_np.transpose(0, 3, 1, 2))
        ab = torch.tensor(abar[t_np], dtype=torch.float32)[:, None, None, None]
        xt = torch.sqrt(ab) * x0 + torch.sqrt(1.0 - ab) * eps
        eps_theta = tm(xt, torch.tensor(t_np, dtype=torch.long))
        loss_t = F.mse_loss(eps_theta, eps)
        opt.zero_grad()
        loss_t.backward()
        opt.step()
        torch_losses.append(loss_t.item())

    np.testing.assert_allclose(
        np.asarray(jax_losses), np.asarray(torch_losses), rtol=2e-3, atol=1e-5,
        err_msg="pixel-DDPM loss trajectory diverged from the torch replica",
    )

    tm_final = TPixelUNet(base=8, temb=16,
                          learnable_residual=learnable_residual)
    tm_final.load(jax.device_get(state.params))
    for (name, a), (_, b) in zip(
        tm.state_dict().items(), tm_final.state_dict().items()
    ):
        a, b = a.detach().numpy(), b.detach().numpy()
        assert np.max(np.abs(a - b)) < 5e-4, (
            f"pixel_unet.{name}: max|delta|={np.max(np.abs(a - b)):.2e}"
        )
