"""Quantitative sample-quality metrics (VERDICT r1 item 7).

The reference's only "eval" is visual artifact inspection (SURVEY.md §4);
these metrics make sample quality a NUMBER that moves when sampling breaks:

  - `classifier_accuracy_on_samples`: generate class-conditional latents and
    score them with the VAE's own classifier head (v1:311-321 trained with
    the center/CE losses to make latents class-separable). Collapsed or
    class-ignoring samplers drive this to ~1/num_classes.
  - `latent_mmd`: unbiased RBF-kernel MMD^2 between real encoded latents and
    generated latents — distribution-level match, label-free. Grows when the
    sampler drifts off the VAE posterior manifold.

  - `perceptual_fd`: Fréchet distance between pooled perceptual-feature
    Gaussians of real vs generated IMAGES (an FID analogue in the
    framework's own perceptual space — the reference has no image-space
    metric at all). Feature extraction runs on device; the 256×256
    covariance algebra runs on host numpy.

Device-side metrics run over jitted functions; hosts fetch one scalar.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def classifier_accuracy_on_samples(
    sampler,
    classify_fn: Callable[[jax.Array], jax.Array],
    rng: jax.Array,
    num_classes: int,
    n_per_class: int = 4,
    max_classes: Optional[int] = None,
) -> float:
    """Accuracy of the VAE classifier head on class-conditional samples.

    sampler: object with .sample(rng, batch, classes) -> latents (the
      class-only sampling facade; v3 dual-condition samplers go through the
      runner's _CondAdapter).
    classify_fn: latents -> logits (FlowerVAE.classify with trained params).
    """
    k = min(num_classes, max_classes or num_classes)
    classes = jnp.repeat(jnp.arange(k, dtype=jnp.int32), n_per_class)
    latents = sampler.sample(rng, int(classes.shape[0]), classes)
    logits = classify_fn(latents)
    pred = jnp.argmax(logits, axis=-1)
    return float(jnp.mean((pred == classes).astype(jnp.float32)))


def _pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    aa = jnp.sum(a * a, axis=1)[:, None]
    bb = jnp.sum(b * b, axis=1)[None, :]
    return jnp.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)


def latent_mmd(
    real: jax.Array,
    generated: jax.Array,
    bandwidth: Optional[float] = None,
) -> float:
    """Unbiased RBF MMD^2 between two latent sets (N,d)/(M,d).

    bandwidth defaults to the median heuristic over the pooled pairwise
    distances (computed on device).
    """
    real = jnp.asarray(real, jnp.float32)
    generated = jnp.asarray(generated, jnp.float32)
    if not (bool(jnp.isfinite(real).all()) and bool(jnp.isfinite(generated).all())):
        # A diverged sampler (inf/nan latents) is maximal distribution
        # mismatch — report inf, not nan, so thresholds still trip.
        return float("inf")

    d_rr = _pairwise_sq_dists(real, real)
    d_gg = _pairwise_sq_dists(generated, generated)
    d_rg = _pairwise_sq_dists(real, generated)

    if bandwidth is None:
        pooled = jnp.concatenate([d_rr.ravel(), d_gg.ravel(), d_rg.ravel()])
        med = jnp.median(pooled)
        bw = jnp.maximum(med, 1e-6)
    else:
        bw = jnp.float32(bandwidth)

    def k(d):
        return jnp.exp(-d / bw)

    n = real.shape[0]
    m = generated.shape[0]
    # unbiased: drop the diagonal of the within-set terms
    k_rr = (jnp.sum(k(d_rr)) - n) / (n * (n - 1))
    k_gg = (jnp.sum(k(d_gg)) - m) / (m * (m - 1))
    k_rg = jnp.mean(k(d_rg))
    return float(k_rr + k_gg - 2.0 * k_rg)


def frechet_from_stats(
    mu1: np.ndarray, sigma1: np.ndarray,
    mu2: np.ndarray, sigma2: np.ndarray,
) -> float:
    """Fréchet distance between N(mu1, sigma1) and N(mu2, sigma2):

        |mu1-mu2|^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2})

    The cross term uses Tr((S1 S2)^{1/2}) = Tr((R S2 R)^{1/2}) with
    R = S1^{1/2} — both factors symmetric PSD, so every matrix sqrt is an
    eigh with eigenvalues clipped at 0 (no scipy.sqrtm, which this image
    lacks; numerically this is the standard FID formulation)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)

    def psd_sqrt(s):
        w, v = np.linalg.eigh((s + s.T) / 2.0)
        return (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T

    r = psd_sqrt(sigma1)
    m = r @ sigma2 @ r
    w = np.linalg.eigvalsh((m + m.T) / 2.0)
    tr_cross = float(np.sum(np.sqrt(np.clip(w, 0.0, None))))
    diff = mu1 - mu2
    fd = float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
               - 2.0 * tr_cross)
    return max(fd, 0.0)


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Fréchet distance between Gaussians fit to two feature sets (N,d)/(M,d).

    Small-sample note: with N,M ~ a few hundred and d=256 the covariance
    estimates are rank-deficient and the absolute value is biased upward;
    compare runs only at MATCHED sample counts (same caveat as small-sample
    FID). Non-finite features (diverged sampler) report inf."""
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    if not (np.isfinite(a).all() and np.isfinite(b).all()):
        return float("inf")
    return frechet_from_stats(
        a.mean(0), np.cov(a, rowvar=False),
        b.mean(0), np.cov(b, rowvar=False),
    )


def fd_stamp(feature_params=None, run_id: Optional[str] = None) -> dict:
    """Comparability stamp for perceptual-FD numbers.

    The substitute-backbone FD ranks operating points WITHIN one training
    run (tools/fd_correlation.py: Spearman rho 0.7-0.8 vs the torch-VGG
    reference axis) but the ranking does NOT transfer across independently
    trained runs (commit b2eaa27's cross-run study). Every report that
    emits an FD therefore carries:
      - fd_backbone: hash of the feature-backbone parameters (which
        perceptual space the number lives in), and
      - fd_run_id: caller-supplied identity of the training run /
        checkpoint the samples came from.
    `check_fd_comparable` refuses deltas when either differs."""
    import hashlib

    stamp: dict = {}
    if feature_params is not None:
        h = hashlib.sha256()
        for leaf in jax.tree.leaves(feature_params):
            a = np.asarray(leaf)
            h.update(str(a.shape).encode())
            h.update(a.tobytes()[:4096])
        stamp["fd_backbone"] = h.hexdigest()[:16]
    if run_id is not None:
        stamp["fd_run_id"] = str(run_id)
    return stamp


def check_fd_comparable(a: dict, b: dict, what: str = "FD comparison") -> bool:
    """Guard an FD delta between two quality reports / sweep rows.

    Returns True when the stamps say the numbers live in the same
    perceptual space AND come from the same training run. Raises
    ValueError on a cross-run or cross-backbone comparison — the
    configuration tools/fd_correlation.py measured to be meaningless.
    Unstamped reports (legacy) get a loud warning and False."""
    import warnings

    for key, label in (("fd_backbone", "feature backbone"),
                       ("fd_run_id", "training run")):
        va, vb = a.get(key), b.get(key)
        if va is None or vb is None:
            warnings.warn(
                f"{what}: report(s) missing {key}; cross-run FD deltas are "
                f"not meaningful (tools/fd_correlation.py) — stamp reports "
                f"via quality.fd_stamp()", stacklevel=2)
            return False
        if va != vb:
            raise ValueError(
                f"{what}: refusing FD delta across different {label}s "
                f"({va!r} vs {vb!r}); substitute-backbone FD is only valid "
                f"WITHIN one run (tools/fd_correlation.py, commit b2eaa27)")
    return True


def perceptual_fd(
    feature_fn: Callable[[jax.Array], jax.Array],
    real_images: jax.Array,
    generated_images: jax.Array,
) -> float:
    """FID analogue in the framework's perceptual space: Fréchet distance
    between pooled VGG-prefix features (models/vgg.py relu3_3, global mean
    pool -> 256-d) of real vs generated image sets.

    The shipped perceptual weights are the validated substitute backbone
    (models/vgg.py docstring), so treat values as RELATIVE — comparable
    across runs of this framework, not against published ImageNet-FID
    numbers."""
    fa = np.asarray(feature_fn(real_images))
    fb = np.asarray(feature_fn(generated_images))
    return frechet_distance(fa, fb)


def sample_quality_report(
    sampler,
    classify_fn,
    encode_mu_fn,
    images: jax.Array,
    rng: jax.Array,
    num_classes: int,
    n_per_class: int = 4,
    max_classes: int = 26,
    max_real: int = 256,
    extra_splits: Optional[dict] = None,
    decode_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    feature_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    feature_params=None,
    run_id: Optional[str] = None,
) -> dict:
    """The final-sweep quality bundle: classifier accuracy + MMD vs the
    encoded real-set latents. Returns plain-float dict for JSONL logging.

    extra_splits: optional {name: images} — the same generated latents are
    also scored against each extra reference set (one generation pass),
    emitted as `latent_mmd_{name}` (VERDICT r2 item 7: train AND held-out
    rows from one sweep).

    decode_fn + feature_fn: when both are given, the generated latents are
    decoded to images once and `perceptual_fd` (image-space FID analogue)
    is emitted per split as `perceptual_fd` / `perceptual_fd_{name}`."""
    acc_rng, sample_rng = jax.random.split(rng)
    acc = classifier_accuracy_on_samples(
        sampler, classify_fn, acc_rng, num_classes,
        n_per_class=n_per_class, max_classes=max_classes,
    )
    k = min(num_classes, max_classes)
    classes = jnp.repeat(jnp.arange(k, dtype=jnp.int32), n_per_class)
    generated = sampler.sample(sample_rng, int(classes.shape[0]), classes)
    real = encode_mu_fn(images[:max_real])
    mmd = latent_mmd(real, generated)
    report = {
        "classifier_accuracy": acc,
        "chance_accuracy": 1.0 / num_classes,
        "latent_mmd": mmd,
        "n_generated": int(classes.shape[0]),
        "n_real": int(min(max_real, images.shape[0])),
    }
    for name, extra in (extra_splits or {}).items():
        report[f"latent_mmd_{name}"] = latent_mmd(
            encode_mu_fn(extra[:max_real]), generated
        )
    if decode_fn is not None and feature_fn is not None:
        gen_feats = np.asarray(feature_fn(decode_fn(generated)))
        report["perceptual_fd"] = frechet_distance(
            np.asarray(feature_fn(images[:max_real])), gen_feats
        )
        for name, extra in (extra_splits or {}).items():
            report[f"perceptual_fd_{name}"] = frechet_distance(
                np.asarray(feature_fn(extra[:max_real])), gen_feats
            )
        # Comparability stamp: FD deltas are only meaningful within one
        # run/backbone (see fd_stamp / check_fd_comparable).
        report.update(fd_stamp(feature_params, run_id))
    return report
