"""Timing-only PyTorch harness reproducing the REFERENCE's sampling cost
model, used to establish BASELINE.md numbers (the reference publishes none,
SURVEY.md §6).

This re-implements, from the architecture spec, the pieces on the reference's
sampling hot path (SURVEY.md §3.3):
  - the latent ConditionalUNet MLP hourglass (v1/model_train_test.py:501-561)
  - the VAE decoder (v1:242-290)
  - the 1000-step python p_sample loop (v1:580-598)
so the per-step work (matmul sizes, MHA call, python-loop dispatch overhead)
matches the reference exactly. Weights are random — irrelevant for
throughput. torchvision is absent here, so this standalone harness (not an
import of the reference) is the only way to measure it.

Run on CPU (the only torch device in this environment); the measured
images/sec is recorded with its device tag in BASELINE_MEASURED.json.
"""
from __future__ import annotations

import math
import time

import torch
import torch.nn as nn


class _TimeEmb(nn.Module):
    def __init__(self, d=256):
        super().__init__()
        self.d = d
        self.net = nn.Sequential(nn.Linear(d, 2 * d), nn.SiLU(), nn.Linear(2 * d, d))

    def forward(self, t):
        half = self.d // 2
        freqs = torch.exp(
            torch.arange(half, device=t.device) * (-math.log(10000.0) / (half - 1))
        )
        args = t[:, None].float() * freqs[None, :]
        emb = torch.cat([args.sin(), args.cos()], dim=1)
        return self.net(emb)


class _LatentDenoiser(nn.Module):
    """Same stage structure/sizes as the reference latent UNet (v1:501-561)."""

    def __init__(self, latent=256, hidden=(256, 512, 1024, 512, 256), d=256,
                 classes=102):
        super().__init__()
        self.time_emb = _TimeEmb(d)
        self.class_emb = nn.Sequential(
            nn.Embedding(classes, d), nn.Linear(d, d), nn.SiLU(), nn.Linear(d, d)
        )
        self.inp = nn.Linear(latent, hidden[0])
        self.t_projs = nn.ModuleList([nn.Linear(d, h) for h in hidden])
        self.attns = nn.ModuleList(
            [nn.MultiheadAttention(h, 8) for h in hidden]
        )
        self.blocks = nn.ModuleList()
        self.norms = nn.ModuleList()
        self.downs = nn.ModuleList()
        for i in range(len(hidden) - 1):
            self.blocks.append(
                nn.Sequential(nn.Linear(hidden[i], hidden[i]),
                              nn.LayerNorm(hidden[i]), nn.SiLU())
            )
            self.norms.append(nn.LayerNorm(hidden[i]))
            self.downs.append(nn.Linear(hidden[i], hidden[i + 1]))
        self.final_t = nn.Linear(d, hidden[-1])
        self.final_c = nn.Linear(d, hidden[-1])
        self.final_norm = nn.LayerNorm(hidden[-1])
        self.final = nn.Linear(hidden[-1], latent)

    def forward(self, x, t, c):
        te = self.time_emb(t)
        ce = self.class_emb(c)
        h = self.inp(x)
        for i in range(len(self.blocks)):
            h = h + self.t_projs[i](te) + self.t_projs[i](ce)
            h = h + self.blocks[i](h)
            hn = self.norms[i](h).unsqueeze(0)
            attn, _ = self.attns[i](hn, hn, hn)
            h = h + attn.squeeze(0)
            h = self.downs[i](h)
        h = h + self.final_t(te) + self.final_c(ce)
        return self.final(self.final_norm(h))


class _Decoder(nn.Module):
    """Cost model of the reference decoder (v1:242-290): the MLP head plus
    the transposed-conv stack at the same channel widths."""

    def __init__(self, latent=256):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(latent, 512), nn.LayerNorm(512), nn.SiLU(),
            nn.Linear(512, 512 * 8 * 8), nn.LayerNorm(512 * 8 * 8), nn.SiLU(),
        )
        ups = []
        for cin, cout, groups in ((512, 256, 32), (256, 128, 16), (128, 64, 8)):
            ups += [nn.ConvTranspose2d(cin, cout, 4, 2, 1),
                    nn.GroupNorm(groups, cout), nn.SiLU()]
        ups += [nn.Conv2d(64, 32, 3, padding=1), nn.GroupNorm(8, 32), nn.SiLU(),
                nn.Conv2d(32, 3, 3, padding=1), nn.Sigmoid()]
        self.ups = nn.Sequential(*ups)

    def forward(self, z):
        h = self.fc(z).view(-1, 512, 8, 8)
        return self.ups(h)


@torch.no_grad()
def measure_reference_sampling(
    batch: int = 50,
    n_steps: int = 1000,
    measure_steps: int = 50,
    latent: int = 256,
    device: str = "cpu",
) -> dict:
    """Measure the reference's python-loop ancestral sampling (v1:594-598)
    over `measure_steps` steps and extrapolate to the full n_steps, then add
    one measured decode. Returns {'images_per_sec', 'steps_per_sec', ...}."""
    torch.manual_seed(0)
    model = _LatentDenoiser(latent=latent).to(device).eval()
    decoder = _Decoder(latent=latent).to(device).eval()

    beta = torch.linspace(1e-4, 0.02, n_steps, device=device)
    alpha = 1 - beta
    alpha_bar = torch.cumprod(alpha, dim=0)

    x = torch.randn(batch, latent, device=device)
    c = torch.arange(batch, device=device) % 102

    def p_sample(x, t_int):
        t = torch.tensor([t_int], device=device)
        eps = model(x, t, c)
        a, ab = alpha[t], alpha_bar[t]
        mean = (x - ((1 - a) / torch.sqrt(1 - ab)) * eps) / torch.sqrt(a)
        if t_int > 0:
            return mean + torch.sqrt(beta[t]) * torch.randn_like(x)
        return mean

    for t_int in range(n_steps - 1, n_steps - 4, -1):  # warmup
        x = p_sample(x, t_int)
    start = time.perf_counter()
    for t_int in range(n_steps - 4, n_steps - 4 - measure_steps, -1):
        x = p_sample(x, t_int)
    step_time = (time.perf_counter() - start) / measure_steps

    d0 = time.perf_counter()
    decoder(x)
    decode_time = time.perf_counter() - d0

    total = step_time * n_steps + decode_time
    return {
        "device": device,
        "batch": batch,
        "n_steps": n_steps,
        "steps_per_sec": 1.0 / step_time,
        "decode_sec": decode_time,
        "images_per_sec": batch / total,
        "measured_steps": measure_steps,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(measure_reference_sampling(), indent=2))
