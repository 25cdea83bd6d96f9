"""Import trained PyTorch reference checkpoints into flowerdiff param trees.

The reference trains for hours on GPU and saves:
  - ``flower_autoencoder.pt``: ``{'autoencoder': sd, 'discriminator': sd}``
    (v1/model_train_test.py:1179-1190, 1326)
  - ``conditional_diffusion_final.pt``: raw ``ConditionalUNet.state_dict()``
    (v1:1282-1283, 1380)

A user switching frameworks should not have to retrain, so this module maps
those state_dicts — key-for-key, weight-for-weight — onto flowerdiff's flax
param trees.  Layout conversions applied:

  torch Conv2d          (Cout,Cin,kh,kw) -> flax Conv kernel (kh,kw,Cin,Cout)
  torch ConvTranspose2d (Cin,Cout,kh,kw) -> flax ConvTranspose kernel,
                        spatially FLIPPED (tests/test_torch_golden.py pins
                        flax(k4,s2,SAME) == torch(k4,s2,p1) under this map)
  torch Linear          (out,in)         -> flax Dense kernel (in,out)
  nn.MultiheadAttention in_proj_weight (3E,E) packed [q;k;v]
                                          -> fused qkv Dense kernel (E,3E)

and, at the conv<->dense flatten boundary, the CHW-major (torch NCHW
``x.view(B,-1)``, v1:237) <-> HWC-major (our NHWC ``h.reshape(B,-1)``,
models/vae.py) permutation of:
  - the encoder mu/logvar heads' first Linear INPUT rows (v1:210,216)
  - the decoder ``fc.3`` Linear OUTPUT rows + the following LayerNorm's
    affine (v1:249-250), since torch reshapes that vector to (512,8,8) while
    we reshape to (8,8,512).

Dead reference parameters (constructed but never used in forward) are
skipped and reported: ``time_projections.{last}`` / ``attention_layers.{last}``
/ ``cond_projections.{last}`` — the ModuleLists hold len(hidden_dims) entries
but the stage loop covers len-1 (v1:510-516 vs v1:541-556).

Known non-bijective piece: the discriminator.  Ours replaces BatchNorm with
GroupNorm (models/discriminator.py — documented deviation); conv weights map
exactly, the BN affine is copied onto the GN affine as an approximation and
the BN running statistics are reported as skipped.  The discriminator only
matters for CONTINUING adversarial training; VAE/denoiser inference parity
is exact (tests/test_torch_import.py pins forward equivalence).

No torch import is required here: any mapping of array-likes works
(torch tensors are detached via duck typing); ``load_torch_file`` is the
convenience loader for .pt files when torch is available.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

__all__ = [
    "ImportResult",
    "import_autoencoder",
    "import_discriminator",
    "import_latent_denoiser",
    "import_pixel_unet",
    "export_autoencoder",
    "export_discriminator",
    "export_latent_denoiser",
    "export_pixel_unet",
    "load_torch_file",
]


def _a(x: Any) -> np.ndarray:
    """Array-like (incl. torch tensor) -> float32 numpy."""
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


@dataclass
class ImportResult:
    """Converted params + an audit trail of every source key's fate."""

    params: Dict[str, Any]
    used: List[str] = field(default_factory=list)
    skipped: List[str] = field(default_factory=list)  # dead / unmappable keys
    approximated: List[str] = field(default_factory=list)  # e.g. BN -> GN
    aux: Dict[str, Any] = field(default_factory=dict)  # buffers, detected config

    def unused_keys(self, sd: Mapping[str, Any]) -> List[str]:
        touched = set(self.used) | set(self.skipped) | set(self.approximated)
        return [k for k in sd if k not in touched]


class _Reader:
    """Tracks which source keys were consumed."""

    def __init__(self, sd: Mapping[str, Any], result: ImportResult):
        self.sd = sd
        self.result = result

    def take(self, key: str) -> np.ndarray:
        self.result.used.append(key)
        return _a(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    # -- layer-level converters -------------------------------------------
    def conv(self, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
        out = {"kernel": self.take(f"{prefix}.weight").transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = self.take(f"{prefix}.bias")
        return out

    def conv_transpose(self, prefix: str) -> Dict[str, np.ndarray]:
        # torch (Cin,Cout,kh,kw) -> flax (kh,kw,Cin,Cout), spatial flip
        # (inverse of tests/test_torch_golden.py:44's flax->torch map).
        w = self.take(f"{prefix}.weight").transpose(2, 3, 0, 1)[::-1, ::-1]
        return {"kernel": np.ascontiguousarray(w),
                "bias": self.take(f"{prefix}.bias")}

    def dense(self, prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": self.take(f"{prefix}.weight").T,
                "bias": self.take(f"{prefix}.bias")}

    def dense_nobias(self, prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": self.take(f"{prefix}.weight").T}

    def ln2d(self, prefix: str) -> Dict[str, np.ndarray]:
        # our LayerNorm2d uses torch's param names (core/layers.py)
        return {"weight": self.take(f"{prefix}.weight"),
                "bias": self.take(f"{prefix}.bias")}

    def norm(self, prefix: str) -> Dict[str, np.ndarray]:
        # flax nn.LayerNorm / nn.GroupNorm affine
        return {"scale": self.take(f"{prefix}.weight"),
                "bias": self.take(f"{prefix}.bias")}

    def res_block(self, prefix: str) -> Dict[str, Any]:
        """ResidualBlock (v1:159-178) -> core.layers.ResidualBlock tree."""
        # CALayer 1x1 convs (bias=False, v1:58-60) are Dense gates here:
        # (Cout,Cin,1,1) -> (Cin,Cout)
        squeeze = self.take(f"{prefix}.ca.conv_du.0.weight")[:, :, 0, 0].T
        excite = self.take(f"{prefix}.ca.conv_du.2.weight")[:, :, 0, 0].T
        return {
            "conv1": self.conv(f"{prefix}.conv1"),
            "ln1": self.ln2d(f"{prefix}.ln1"),
            "conv2": self.conv(f"{prefix}.conv2"),
            "ln2": self.ln2d(f"{prefix}.ln2"),
            "ca": {"squeeze": {"kernel": squeeze}, "excite": {"kernel": excite}},
            "sa": {"conv": {
                "kernel": self.take(f"{prefix}.sa.conv.weight").transpose(2, 3, 1, 0)
            }},
        }


def _flat_perm_chw_to_hwc(c: int, h: int, w: int) -> np.ndarray:
    """perm[hwc_index] = chw_index for a (C,H,W)<->(H,W,C) flatten."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # value = chw flat index
    return idx.transpose(1, 2, 0).reshape(-1)  # laid out hwc-major


def import_autoencoder(sd: Mapping[str, Any]) -> ImportResult:
    """SimpleAutoencoder.state_dict() (v1:305-393) -> FlowerVAE params.

    Returns params {'encoder','decoder','classifier'} plus, in ``aux``:
    ``class_centers`` / ``center_counts`` (the reference's EMA buffers,
    v1:322-323 — held in the train state on our side) and the detected
    geometry.
    """
    res = ImportResult(params={})
    r = _Reader(sd, res)

    # ---- geometry, inferred from shapes ----------------------------------
    deep_c = int(_a(sd["encoder.down3.0.weight"]).shape[0])
    flat_in = int(_a(sd["encoder.fc_mu.0.weight"]).shape[1])
    hw = int(round((flat_in // deep_c) ** 0.5))
    assert deep_c * hw * hw == flat_in, (
        f"cannot infer deep feature map: C={deep_c}, flat={flat_in}")
    perm = _flat_perm_chw_to_hwc(deep_c, hw, hw)

    # ---- encoder ----------------------------------------------------------
    enc: Dict[str, Any] = {
        "stem_conv": r.conv("encoder.initial_conv.0"),
        "stem_ln": r.ln2d("encoder.initial_conv.1"),
    }
    for i in (1, 2, 3):
        enc[f"down{i}_conv"] = r.conv(f"encoder.down{i}.0")
        enc[f"down{i}_ln"] = r.ln2d(f"encoder.down{i}.1")
        enc[f"res{i}"] = r.res_block(f"encoder.res{i}")
    for tname, oname in (("fc_mu", "mu"), ("fc_logvar", "logvar")):
        fc1 = r.dense(f"encoder.{tname}.0")
        # permute INPUT rows: torch flattened CHW-major, we flatten HWC-major
        fc1["kernel"] = fc1["kernel"][perm]
        enc[f"{oname}_fc1"] = fc1
        enc[f"{oname}_ln"] = r.norm(f"encoder.{tname}.1")
        enc[f"{oname}_fc2"] = r.dense(f"encoder.{tname}.3")

    # ---- decoder ----------------------------------------------------------
    dec: Dict[str, Any] = {
        "fc1": r.dense("decoder.fc.0"),
        "fc1_ln": r.norm("decoder.fc.1"),
    }
    fc2 = r.dense("decoder.fc.3")
    # permute OUTPUT columns + the following LayerNorm: torch reshapes this
    # vector to (C,8,8) (v1:285), we reshape to (8,8,C)
    fc2["kernel"] = fc2["kernel"][:, perm]
    fc2["bias"] = fc2["bias"][perm]
    dec["fc2"] = fc2
    fc2_ln = r.norm("decoder.fc.4")
    dec["fc2_ln"] = {k: v[perm] for k, v in fc2_ln.items()}
    dec["res3"] = r.res_block("decoder.res3")
    for i in (3, 2, 1):
        dec[f"up{i}_conv"] = r.conv_transpose(f"decoder.up{i}.0")
        dec[f"up{i}_gn"] = r.norm(f"decoder.up{i}.1")
        if i > 1:
            dec[f"res{i - 1}"] = r.res_block(f"decoder.res{i - 1}")
    dec["final_conv1"] = r.conv("decoder.final_conv.0")
    dec["final_gn"] = r.norm("decoder.final_conv.1")
    dec["final_conv2"] = r.conv("decoder.final_conv.3")

    # ---- classifier (v1:311-321) -------------------------------------------
    clf = {
        "fc1": r.dense("classifier.0"),
        "ln1": r.norm("classifier.1"),
        "fc2": r.dense("classifier.4"),
        "ln2": r.norm("classifier.5"),
        "out": r.dense("classifier.8"),
    }

    res.params = {"encoder": enc, "decoder": dec, "classifier": clf}
    res.aux["class_centers"] = r.take("class_centers") if r.has("class_centers") else None
    res.aux["center_counts"] = r.take("center_counts") if r.has("center_counts") else None
    res.aux["latent_dim"] = int(_a(sd["encoder.fc_mu.3.weight"]).shape[0])
    res.aux["num_classes"] = int(_a(sd["classifier.8.weight"]).shape[0])
    leftovers = res.unused_keys(sd)
    res.skipped.extend(leftovers)
    return res


def import_discriminator(sd: Mapping[str, Any]) -> ImportResult:
    """Discriminator64.state_dict() (v1:983-1007) -> our Discriminator64.

    Conv weights map exactly.  The reference's BatchNorm affines are copied
    onto our GroupNorm affines (APPROXIMATION — the normalization statistics
    differ; models/discriminator.py documents why BN was replaced).  BN
    running stats have no target and are skipped.
    """
    res = ImportResult(params={})
    r = _Reader(sd, res)
    # Sequential indices (v1:986-1004): convs at 0,2,5,8; BN at 3,6,9; head 11
    conv_idx = {0: 0, 1: 2, 2: 5, 3: 8}
    bn_idx = {1: 3, 2: 6, 3: 9}
    params: Dict[str, Any] = {}
    for i, si in conv_idx.items():
        params[f"conv{i}"] = r.conv(f"model.{si}")
    for i, si in bn_idx.items():
        params[f"norm{i}"] = r.norm(f"model.{si}")
        res.approximated.extend([f"model.{si}.weight", f"model.{si}.bias"])
        for stat in ("running_mean", "running_var", "num_batches_tracked"):
            key = f"model.{si}.{stat}"
            if key in sd:
                res.skipped.append(key)
    params["head"] = r.conv("model.11")
    res.params = params
    res.skipped.extend(res.unused_keys(sd))
    return res


def import_latent_denoiser(sd: Mapping[str, Any]) -> ImportResult:
    """ConditionalUNet.state_dict() (v1:501-561 / v3:769-853) ->
    ConditionalLatentDenoiser params.

    Auto-detects the variant: ``multi_cond_emb.*`` keys mean v3 (dual
    class+color condition, separate per-stage ``cond_projections``);
    ``class_emb.*`` keys mean v1/v2 (shared time/cond projections, v1:544).
    ``aux`` carries the detected config to build the matching module:
    ``hidden_dims``, ``shared_cond_proj``, ``num_classes``, ``num_colors``,
    ``latent_dim``, ``time_emb_dim``.
    """
    res = ImportResult(params={})
    r = _Reader(sd, res)

    # ---- geometry ----------------------------------------------------------
    n_stages = len({k.split(".")[1] for k in sd if k.startswith("layers.")})
    hidden = [int(_a(sd["latent_proj.weight"]).shape[0])]
    for i in range(n_stages):
        hidden.append(int(_a(sd[f"layers.{i}.2.weight"]).shape[0]))
    latent_dim = int(_a(sd["latent_proj.weight"]).shape[1])
    time_emb_dim = int(_a(sd["time_emb.lin1.weight"]).shape[1])
    is_v3 = any(k.startswith("multi_cond_emb.") for k in sd)

    params: Dict[str, Any] = {
        "time_emb": {"lin1": r.dense("time_emb.lin1"),
                     "lin2": r.dense("time_emb.lin2")},
        "latent_proj": r.dense("latent_proj"),
    }
    if is_v3:
        params["cond_emb"] = {
            "flower_embedding": {"embedding": r.take("multi_cond_emb.flower_emb.weight")},
            "color_embedding": {"embedding": r.take("multi_cond_emb.color_emb.weight")},
            "proj": r.dense("multi_cond_emb.fc"),
        }
        num_classes = int(_a(sd["multi_cond_emb.flower_emb.weight"]).shape[0])
        num_colors = int(_a(sd["multi_cond_emb.color_emb.weight"]).shape[0])
    else:
        params["cond_emb"] = {
            "embedding": {"embedding": r.take("class_emb.embedding.weight")},
            "lin1": r.dense("class_emb.lin1"),
            "lin2": r.dense("class_emb.lin2"),
        }
        num_classes = int(_a(sd["class_emb.embedding.weight"]).shape[0])
        num_colors = None

    for i in range(n_stages):
        params[f"time_proj_{i}"] = r.dense(f"time_projections.{i}")
        if is_v3:
            params[f"cond_proj_{i}"] = r.dense(f"cond_projections.{i}")
        params[f"block_fc_{i}"] = r.dense(f"layers.{i}.0.0")
        params[f"block_ln_{i}"] = r.norm(f"layers.{i}.0.1")
        params[f"stage_ln_{i}"] = r.norm(f"layers.{i}.1")
        params[f"downsample_{i}"] = r.dense(f"layers.{i}.2")
        # torch MHA packs [q;k;v] along dim 0 of in_proj_weight (3E,E);
        # our fused qkv Dense splits q,k,v along the LAST axis -> plain .T
        params[f"attn_{i}"] = {
            "qkv": {"kernel": r.take(f"attention_layers.{i}.in_proj_weight").T,
                    "bias": r.take(f"attention_layers.{i}.in_proj_bias")},
            "out": r.dense(f"attention_layers.{i}.out_proj"),
        }

    params["final_time_proj"] = r.dense("final_time_proj")
    params["final_cond_proj"] = r.dense("final_class_proj")
    params["final_norm"] = r.norm("final_norm")
    params["final"] = r.dense("final")
    params["residual_weight"] = _a(sd["residual_weight"]).reshape(())
    res.used.append("residual_weight")

    # Dead ModuleList tails: constructed for every hidden dim but the stage
    # loop covers len-1 (v1:510-516 vs 541-556) — never used in forward.
    for dead in (f"time_projections.{n_stages}",
                 f"cond_projections.{n_stages}",
                 f"attention_layers.{n_stages}"):
        for k in sd:
            if k.startswith(dead + "."):
                res.skipped.append(k)

    res.params = params
    res.aux.update(
        hidden_dims=tuple(hidden), latent_dim=latent_dim,
        time_emb_dim=time_emb_dim, num_classes=num_classes,
        num_colors=num_colors, shared_cond_proj=not is_v3,
    )
    res.skipped.extend(res.unused_keys(sd))
    return res


# Reference SimpleUNet Sequential slots (v4/v5 model_train_test.py:37-103):
# double-convs are Sequential(Conv,ReLU,Conv,ReLU) -> conv indices 0 and 2;
# time_embed is Sequential(Linear,ReLU,Linear) -> same indices.
_PIXEL_DOUBLE_CONVS = ("conv1", "conv2", "conv3", "conv4", "conv5")


def import_pixel_unet(sd: Mapping[str, Any]) -> ImportResult:
    """SimpleUNet.state_dict() (v4/model_train_test.py:37-134, saved as
    ``diffusion_unet_pixels.pth`` at v4:252 / v5:275) -> PixelUNet params.

    Fully bijective: every reference parameter is live in forward, and the
    flax module mirrors the graph 1:1 (models/pixel_unet.py).  Auto-detects
    the variant: a ``res_ratio`` key means v5 (``learnable_residual=True``,
    v5:54,144); its absence means v4.  ``aux`` carries ``in_channels``,
    ``base_channels``, ``time_emb_dim`` and ``learnable_residual`` so the
    caller can build the matching module.
    """
    res = ImportResult(params={})
    r = _Reader(sd, res)

    params: Dict[str, Any] = {
        "time_fc_a": r.dense("time_embed.0"),
        "time_fc_b": r.dense("time_embed.2"),
        "time_to_s1": r.dense("time_fc1"),
        "time_to_s2": r.dense("time_fc2"),
        "time_to_s3": r.dense("time_fc3"),
    }
    for name in _PIXEL_DOUBLE_CONVS:
        params[f"{name}_a"] = r.conv(f"{name}.0")
        params[f"{name}_b"] = r.conv(f"{name}.2")
    for name in ("down1", "down2", "out_conv"):
        params[name] = r.conv(name)
    params["bottleneck_a"] = r.conv("bottleneck.0")
    params["bottleneck_b"] = r.conv("bottleneck.2")
    for name in ("up1", "up2"):
        params[name] = r.conv_transpose(name)

    learnable_residual = r.has("res_ratio")
    if learnable_residual:
        params["res_ratio"] = _a(sd["res_ratio"]).reshape(())
        res.used.append("res_ratio")

    res.params = params
    res.aux.update(
        in_channels=int(_a(sd["conv1.0.weight"]).shape[1]),
        base_channels=int(_a(sd["conv1.0.weight"]).shape[0]),
        time_emb_dim=int(_a(sd["time_embed.0.weight"]).shape[0]),
        learnable_residual=learnable_residual,
    )
    res.skipped.extend(res.unused_keys(sd))
    return res


def export_pixel_unet(params: Mapping[str, Any]) -> ImportResult:
    """PixelUNet params -> SimpleUNet.state_dict() (v4:37-134 / v5:38-145),
    the exact inverse of :func:`import_pixel_unet` — loadable with
    ``strict=True`` into the reference module and runnable by the original
    v4/v5 scripts (which load ``diffusion_unet_pixels.pth``)."""
    res = ImportResult(params={})
    w = _Writer(res)

    w.dense("time_embed.0", params["time_fc_a"])
    w.dense("time_embed.2", params["time_fc_b"])
    w.dense("time_fc1", params["time_to_s1"])
    w.dense("time_fc2", params["time_to_s2"])
    w.dense("time_fc3", params["time_to_s3"])
    for name in _PIXEL_DOUBLE_CONVS:
        w.conv(f"{name}.0", params[f"{name}_a"])
        w.conv(f"{name}.2", params[f"{name}_b"])
    for name in ("down1", "down2", "out_conv"):
        w.conv(name, params[name])
    w.conv("bottleneck.0", params["bottleneck_a"])
    w.conv("bottleneck.2", params["bottleneck_b"])
    for name in ("up1", "up2"):
        w.conv_transpose(name, params[name])
    if "res_ratio" in params:
        w.put("res_ratio", _a(params["res_ratio"]).reshape(()))
    res.params = w.sd
    return res


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pt file into a {key: float32 ndarray} dict.

    Handles both layouts the reference writes: the combined
    ``{'autoencoder': sd, 'discriminator': sd}`` dict (returned as a dict of
    dicts) and a raw state_dict.
    """
    import torch  # local import: the converter is the only torch-needing path

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "autoencoder" in obj:
        return {name: {k: _a(v) for k, v in sub.items()}
                for name, sub in obj.items()}
    return {k: _a(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# Export: flowerdiff param trees -> reference state_dicts (the inverse map)
# ---------------------------------------------------------------------------
class _Writer:
    """Inverse of _Reader: emits reference-keyed torch-layout arrays."""

    def __init__(self, result: "ImportResult"):
        self.sd: Dict[str, np.ndarray] = {}
        self.result = result

    def put(self, key: str, value: np.ndarray) -> None:
        self.sd[key] = np.ascontiguousarray(np.asarray(value, np.float32))
        self.result.used.append(key)

    def conv(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.put(f"{prefix}.weight", _a(p["kernel"]).transpose(3, 2, 0, 1))
        if "bias" in p:
            self.put(f"{prefix}.bias", _a(p["bias"]))

    def conv_transpose(self, prefix: str, p: Mapping[str, Any]) -> None:
        # flax (kh,kw,Cin,Cout), spatially pre-flipped -> torch (Cin,Cout,kh,kw)
        k = _a(p["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
        self.put(f"{prefix}.weight", k)
        self.put(f"{prefix}.bias", _a(p["bias"]))

    def dense(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.put(f"{prefix}.weight", _a(p["kernel"]).T)
        if "bias" in p:
            self.put(f"{prefix}.bias", _a(p["bias"]))

    def ln2d(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.put(f"{prefix}.weight", _a(p["weight"]))
        self.put(f"{prefix}.bias", _a(p["bias"]))

    def norm(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.put(f"{prefix}.weight", _a(p["scale"]))
        self.put(f"{prefix}.bias", _a(p["bias"]))

    def res_block(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.conv(f"{prefix}.conv1", p["conv1"])
        self.ln2d(f"{prefix}.ln1", p["ln1"])
        self.conv(f"{prefix}.conv2", p["conv2"])
        self.ln2d(f"{prefix}.ln2", p["ln2"])
        # CALayer Dense gates -> 1x1 convs (bias=False, v1:58-60)
        self.put(f"{prefix}.ca.conv_du.0.weight",
                 _a(p["ca"]["squeeze"]["kernel"]).T[:, :, None, None])
        self.put(f"{prefix}.ca.conv_du.2.weight",
                 _a(p["ca"]["excite"]["kernel"]).T[:, :, None, None])
        self.put(f"{prefix}.sa.conv.weight",
                 _a(p["sa"]["conv"]["kernel"]).transpose(3, 2, 0, 1))

    def synth(self, key: str, shape: Tuple[int, ...]) -> None:
        """Emit a zero tensor for a parameter the reference constructs but
        never uses in forward (dead ModuleList tails) or statistics we do
        not track (BN running stats use fresh-init values instead)."""
        self.sd[key] = np.zeros(shape, np.float32)
        self.result.approximated.append(key)


def export_autoencoder(
    params: Mapping[str, Any],
    class_centers: Any = None,
    center_counts: Any = None,
) -> ImportResult:
    """FlowerVAE params -> SimpleAutoencoder.state_dict() (v1:305-393).

    The exact inverse of :func:`import_autoencoder` — a reference user can
    ``model.load_state_dict(result.params, strict=True)`` and run the
    original scripts on flowerdiff-trained weights.  ``class_centers`` /
    ``center_counts`` (train-state buffers on our side) fill the reference's
    registered buffers; zeros if not provided.
    """
    res = ImportResult(params={})
    w = _Writer(res)
    enc, dec, clf = params["encoder"], params["decoder"], params["classifier"]

    deep_c = int(_a(enc["down3_conv"]["kernel"]).shape[-1])
    flat_in = int(_a(enc["mu_fc1"]["kernel"]).shape[0])
    hw = int(round((flat_in // deep_c) ** 0.5))
    assert deep_c * hw * hw == flat_in
    perm = _flat_perm_chw_to_hwc(deep_c, hw, hw)
    inv_perm = np.argsort(perm)

    # ---- encoder ----------------------------------------------------------
    w.conv("encoder.initial_conv.0", enc["stem_conv"])
    w.ln2d("encoder.initial_conv.1", enc["stem_ln"])
    for i in (1, 2, 3):
        w.conv(f"encoder.down{i}.0", enc[f"down{i}_conv"])
        w.ln2d(f"encoder.down{i}.1", enc[f"down{i}_ln"])
        w.res_block(f"encoder.res{i}", enc[f"res{i}"])
    for tname, oname in (("fc_mu", "mu"), ("fc_logvar", "logvar")):
        fc1 = dict(enc[f"{oname}_fc1"])
        fc1["kernel"] = _a(fc1["kernel"])[inv_perm]  # hwc rows -> chw rows
        w.dense(f"encoder.{tname}.0", fc1)
        w.norm(f"encoder.{tname}.1", enc[f"{oname}_ln"])
        w.dense(f"encoder.{tname}.3", enc[f"{oname}_fc2"])

    # ---- decoder ----------------------------------------------------------
    w.dense("decoder.fc.0", dec["fc1"])
    w.norm("decoder.fc.1", dec["fc1_ln"])
    fc2 = dict(dec["fc2"])
    fc2["kernel"] = _a(fc2["kernel"])[:, inv_perm]
    fc2["bias"] = _a(fc2["bias"])[inv_perm]
    w.dense("decoder.fc.3", fc2)
    w.norm("decoder.fc.4",
           {k: _a(v)[inv_perm] for k, v in dec["fc2_ln"].items()})
    w.res_block("decoder.res3", dec["res3"])
    for i in (3, 2, 1):
        w.conv_transpose(f"decoder.up{i}.0", dec[f"up{i}_conv"])
        w.norm(f"decoder.up{i}.1", dec[f"up{i}_gn"])
        if i > 1:
            w.res_block(f"decoder.res{i - 1}", dec[f"res{i - 1}"])
    w.conv("decoder.final_conv.0", dec["final_conv1"])
    w.norm("decoder.final_conv.1", dec["final_gn"])
    w.conv("decoder.final_conv.3", dec["final_conv2"])

    # ---- classifier --------------------------------------------------------
    w.dense("classifier.0", clf["fc1"])
    w.norm("classifier.1", clf["ln1"])
    w.dense("classifier.4", clf["fc2"])
    w.norm("classifier.5", clf["ln2"])
    w.dense("classifier.8", clf["out"])

    # ---- EMA center buffers (v1:322-323) ------------------------------------
    latent = int(_a(enc["mu_fc2"]["kernel"]).shape[-1])
    n_cls = int(_a(clf["out"]["kernel"]).shape[-1])
    w.put("class_centers", _a(class_centers) if class_centers is not None
          else np.zeros((n_cls, latent), np.float32))
    w.put("center_counts", _a(center_counts) if center_counts is not None
          else np.zeros((n_cls,), np.float32))
    res.params = w.sd
    return res


def export_discriminator(params: Mapping[str, Any]) -> ImportResult:
    """Our Discriminator64 params -> reference state_dict (v1:983-1007).

    GroupNorm affines are written onto the BatchNorm affines (APPROXIMATION,
    the inverse of import_discriminator's); BN running stats are emitted at
    their fresh-init values (mean 0 / var 1 / 0 batches)."""
    res = ImportResult(params={})
    w = _Writer(res)
    conv_idx = {0: 0, 1: 2, 2: 5, 3: 8}
    bn_idx = {1: 3, 2: 6, 3: 9}
    for i, si in conv_idx.items():
        w.conv(f"model.{si}", params[f"conv{i}"])
    for i, si in bn_idx.items():
        w.norm(f"model.{si}", params[f"norm{i}"])
        res.approximated.extend([f"model.{si}.weight", f"model.{si}.bias"])
        ch = int(_a(params[f"norm{i}"]["scale"]).shape[0])
        w.synth(f"model.{si}.running_mean", (ch,))
        w.sd[f"model.{si}.running_var"] = np.ones((ch,), np.float32)
        res.approximated.append(f"model.{si}.running_var")
        w.sd[f"model.{si}.num_batches_tracked"] = np.zeros((), np.int64)
        res.approximated.append(f"model.{si}.num_batches_tracked")
    w.conv("model.11", params["head"])
    res.params = w.sd
    return res


def export_latent_denoiser(params: Mapping[str, Any]) -> ImportResult:
    """ConditionalLatentDenoiser params -> ConditionalUNet.state_dict()
    (v1:501-561 / v3:769-853), inverse of :func:`import_latent_denoiser`.

    The reference's dead ModuleList tails (time_projections/{cond_projections}
    /attention_layers at index len(hidden)-1, never used in forward —
    v1:510-516 vs 541-556) are synthesized as zeros so strict loading works;
    they are listed in ``approximated``."""
    res = ImportResult(params={})
    w = _Writer(res)
    is_v3 = "flower_embedding" in params.get("cond_emb", {})

    w.dense("time_emb.lin1", params["time_emb"]["lin1"])
    w.dense("time_emb.lin2", params["time_emb"]["lin2"])
    w.dense("latent_proj", params["latent_proj"])
    if is_v3:
        ce = params["cond_emb"]
        w.put("multi_cond_emb.flower_emb.weight",
              _a(ce["flower_embedding"]["embedding"]))
        w.put("multi_cond_emb.color_emb.weight",
              _a(ce["color_embedding"]["embedding"]))
        w.dense("multi_cond_emb.fc", ce["proj"])
    else:
        ce = params["cond_emb"]
        w.put("class_emb.embedding.weight", _a(ce["embedding"]["embedding"]))
        w.dense("class_emb.lin1", ce["lin1"])
        w.dense("class_emb.lin2", ce["lin2"])

    n_stages = len([k for k in params if k.startswith("downsample_")])
    time_emb_dim = int(_a(params["time_emb"]["lin2"]["kernel"]).shape[-1])
    for i in range(n_stages):
        w.dense(f"time_projections.{i}", params[f"time_proj_{i}"])
        if is_v3:
            w.dense(f"cond_projections.{i}", params[f"cond_proj_{i}"])
        w.dense(f"layers.{i}.0.0", params[f"block_fc_{i}"])
        w.norm(f"layers.{i}.0.1", params[f"block_ln_{i}"])
        w.norm(f"layers.{i}.1", params[f"stage_ln_{i}"])
        w.dense(f"layers.{i}.2", params[f"downsample_{i}"])
        w.put(f"attention_layers.{i}.in_proj_weight",
              _a(params[f"attn_{i}"]["qkv"]["kernel"]).T)
        w.put(f"attention_layers.{i}.in_proj_bias",
              _a(params[f"attn_{i}"]["qkv"]["bias"]))
        w.dense(f"attention_layers.{i}.out_proj",
                params[f"attn_{i}"]["out"])

    # dead tails at index n_stages (width = hidden_dims[-1], i.e. the
    # downsample output of the last stage)
    last_w = int(_a(params[f"downsample_{n_stages - 1}"]["kernel"]).shape[-1])
    w.synth(f"time_projections.{n_stages}.weight", (last_w, time_emb_dim))
    w.synth(f"time_projections.{n_stages}.bias", (last_w,))
    if is_v3:
        w.synth(f"cond_projections.{n_stages}.weight", (last_w, time_emb_dim))
        w.synth(f"cond_projections.{n_stages}.bias", (last_w,))
    w.synth(f"attention_layers.{n_stages}.in_proj_weight", (3 * last_w, last_w))
    w.synth(f"attention_layers.{n_stages}.in_proj_bias", (3 * last_w,))
    w.synth(f"attention_layers.{n_stages}.out_proj.weight", (last_w, last_w))
    w.synth(f"attention_layers.{n_stages}.out_proj.bias", (last_w,))

    w.dense("final_time_proj", params["final_time_proj"])
    w.dense("final_class_proj", params["final_cond_proj"])
    w.norm("final_norm", params["final_norm"])
    w.dense("final", params["final"])
    w.put("residual_weight", _a(params["residual_weight"]).reshape(()))
    res.params = w.sd
    return res
