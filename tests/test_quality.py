"""Sample-quality metric tests (utils/quality.py): the numbers must MOVE when
sampling breaks — that is their whole job (VERDICT r1 item 7)."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.utils.quality import (
    classifier_accuracy_on_samples,
    latent_mmd,
    sample_quality_report,
)


class _FakeSampler:
    """Sampler whose latents carry the class signal in the first coordinate
    (scaled), or pure noise when `broken`."""

    def __init__(self, dim=8, broken=False):
        self.dim = dim
        self.broken = broken

    def sample(self, rng, batch, classes):
        noise = 0.05 * jax.random.normal(rng, (batch, self.dim))
        if self.broken:
            return noise
        onehotish = jnp.zeros((batch, self.dim)).at[:, 0].set(classes.astype(jnp.float32))
        return onehotish + noise


def _classify(z):
    """Ideal classifier for the fake sampler's encoding."""
    idx = jnp.round(z[:, 0]).astype(jnp.int32)
    return jax.nn.one_hot(jnp.clip(idx, 0, 4), 5) * 10.0


def test_classifier_accuracy_separates_working_from_broken():
    rng = jax.random.key(0)
    good = classifier_accuracy_on_samples(_FakeSampler(), _classify, rng, 5, 8)
    bad = classifier_accuracy_on_samples(_FakeSampler(broken=True), _classify, rng, 5, 8)
    assert good > 0.9
    assert bad < 0.5  # collapses toward chance (all-zero first coord -> class 0)


def test_mmd_zero_for_same_distribution_positive_for_shifted():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(128, 16)).astype(np.float32)
    b = rng.normal(size=(128, 16)).astype(np.float32)
    c = b + 3.0
    same = latent_mmd(a, b)
    shifted = latent_mmd(a, c)
    assert abs(same) < 0.05
    assert shifted > 10 * max(abs(same), 1e-4)


def test_mmd_detects_variance_collapse():
    """Mode collapse (tiny variance) must register even with matched means."""
    rng = np.random.default_rng(1)
    real = rng.normal(size=(128, 16)).astype(np.float32)
    collapsed = 0.01 * rng.normal(size=(128, 16)).astype(np.float32)
    assert latent_mmd(real, collapsed) > 0.1


def test_sample_quality_report_bundle():
    imgs = jnp.zeros((32, 4, 4, 3))

    def encode_mu(x):
        return jnp.tile(jnp.arange(x.shape[0], dtype=jnp.float32)[:, None] % 5, (1, 8))

    report = sample_quality_report(
        _FakeSampler(), _classify, encode_mu, imgs, jax.random.key(1),
        num_classes=5, n_per_class=4, max_classes=5, max_real=32,
    )
    assert set(report) >= {"classifier_accuracy", "latent_mmd", "chance_accuracy"}
    assert 0.0 <= report["classifier_accuracy"] <= 1.0
    assert np.isfinite(report["latent_mmd"])


def test_sample_quality_report_extra_splits():
    """extra_splits scores the SAME generated latents against additional
    reference sets (train + held-out rows from one generation pass)."""
    imgs = jnp.zeros((32, 4, 4, 3))
    imgs_train = jnp.ones((32, 4, 4, 3))

    def encode_mu(x):
        base = float(x[0, 0, 0, 0])  # 0.0 for heldout, 1.0 for train
        return base + jnp.tile(
            jnp.arange(x.shape[0], dtype=jnp.float32)[:, None] % 5, (1, 8))

    report = sample_quality_report(
        _FakeSampler(), _classify, encode_mu, imgs, jax.random.key(1),
        num_classes=5, n_per_class=4, max_classes=5, max_real=32,
        extra_splits={"train": imgs_train},
    )
    assert "latent_mmd_train" in report
    assert np.isfinite(report["latent_mmd_train"])
    # the shifted train reference must score differently from heldout
    assert report["latent_mmd_train"] != report["latent_mmd"]


def test_frechet_from_stats_closed_form():
    """Exact closed form: N(0, I_d) vs N(mu, 4 I_d) gives
    |mu|^2 + d*(1 + 4 - 2*2) = |mu|^2 + d."""
    from flowerdiff.utils.quality import frechet_from_stats

    d = 6
    mu = np.arange(d, dtype=np.float64) * 0.5
    fd = frechet_from_stats(np.zeros(d), np.eye(d), mu, 4.0 * np.eye(d))
    assert abs(fd - (float(mu @ mu) + d)) < 1e-9
    # identity case is exactly zero
    assert frechet_from_stats(mu, np.eye(d), mu, np.eye(d)) < 1e-12


def test_frechet_distance_orders_shift_and_handles_nonfinite():
    from flowerdiff.utils.quality import frechet_distance

    rng = np.random.default_rng(3)
    a = rng.normal(size=(400, 16))
    b = rng.normal(size=(400, 16))
    same = frechet_distance(a, b)
    shifted = frechet_distance(a, b + 2.0)
    assert shifted > same + 10.0  # |mu shift|^2 = 64 dominates sampling noise
    assert frechet_distance(a, np.full_like(b, np.nan)) == float("inf")


def test_sample_quality_report_perceptual_fd():
    """decode_fn + feature_fn add image-space FD rows; a feature-space shift
    between real and generated images must register."""
    imgs = jnp.zeros((32, 4, 4, 3))

    def encode_mu(x):
        return jnp.tile(jnp.arange(x.shape[0], dtype=jnp.float32)[:, None] % 5, (1, 8))

    def decode(z):  # latents -> "images" whose mean pixel tracks z[:, 0]
        return jnp.broadcast_to(z[:, 0][:, None, None, None], (z.shape[0], 4, 4, 3))

    def feats(x):  # pooled per-image features
        return jnp.mean(x, axis=(1, 2))

    report = sample_quality_report(
        _FakeSampler(), _classify, encode_mu, imgs, jax.random.key(1),
        num_classes=5, n_per_class=4, max_classes=5, max_real=32,
        extra_splits={"train": jnp.ones((32, 4, 4, 3))},
        decode_fn=decode, feature_fn=feats,
    )
    assert np.isfinite(report["perceptual_fd"])
    assert np.isfinite(report["perceptual_fd_train"])
    # generated means span 0..4 vs all-zero heldout vs all-one train: both
    # positive, and the two references score differently
    assert report["perceptual_fd"] > 0.0
    assert report["perceptual_fd"] != report["perceptual_fd_train"]


def test_fd_stamp_and_comparability_guard():
    """FD deltas are only valid within one run/backbone
    (tools/fd_correlation.py): fd_stamp stamps reports, check_fd_comparable
    passes same-run, raises cross-run/backbone, warns on unstamped."""
    import pytest

    from flowerdiff.utils.quality import check_fd_comparable, fd_stamp

    p1 = {"w": jnp.ones((4, 4))}
    p2 = {"w": jnp.ones((4, 4)) * 2}
    a = {"perceptual_fd": 1.0, **fd_stamp(p1, "/runs/a")}
    a2 = {"perceptual_fd": 2.0, **fd_stamp(p1, "/runs/a")}
    assert check_fd_comparable(a, a2)

    other_run = {"perceptual_fd": 3.0, **fd_stamp(p1, "/runs/b")}
    with pytest.raises(ValueError, match="training run"):
        check_fd_comparable(a, other_run)

    other_backbone = {"perceptual_fd": 3.0, **fd_stamp(p2, "/runs/a")}
    with pytest.raises(ValueError, match="backbone"):
        check_fd_comparable(a, other_backbone)

    with pytest.warns(UserWarning, match="fd_backbone"):
        assert not check_fd_comparable(a, {"perceptual_fd": 9.0})


def test_sample_quality_report_carries_fd_stamp():
    imgs = jnp.zeros((16, 4, 4, 3))

    def encode_mu(x):
        return jnp.tile(jnp.arange(x.shape[0], dtype=jnp.float32)[:, None] % 5, (1, 8))

    def decode(z):
        return jnp.broadcast_to(z[:, 0][:, None, None, None], (z.shape[0], 4, 4, 3))

    def feats(x):
        return jnp.mean(x, axis=(1, 2))

    fp = {"w": jnp.ones((3, 3))}
    report = sample_quality_report(
        _FakeSampler(), _classify, encode_mu, imgs, jax.random.key(1),
        num_classes=5, n_per_class=2, max_classes=5, max_real=16,
        decode_fn=decode, feature_fn=feats,
        feature_params=fp, run_id="/runs/x",
    )
    assert report["fd_run_id"] == "/runs/x"
    assert len(report["fd_backbone"]) == 16
