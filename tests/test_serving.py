"""SamplingService tests (serving.py): XLA path on CPU; the fused path is
covered by kernel tests + the TPU bench."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.models import ConditionalLatentDenoiser, FlowerVAE
from flowerdiff.serving import SamplingService
from flowerdiff.diffusion import linear_schedule


def test_sampling_service_end_to_end():
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=6
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)

    service = SamplingService(model, params, vae, vae_params,
                              sched=linear_schedule(8), use_fused=False)
    images = service.sample_classes([0, 3], n_per_class=2, rng=jax.random.key(1))
    assert images.shape == (4, 64, 64, 3)
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0

    latents = service.sample_latents(jnp.array([1, 2]), jax.random.key(2))
    assert latents.shape == (2, 16) and bool(jnp.isfinite(latents).all())


def _tiny_service(buckets=(4, 8)):
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=6
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)
    return SamplingService(model, params, vae, vae_params,
                           sched=linear_schedule(8), use_fused=False,
                           buckets=buckets)


def test_bucketing_rounds_up_and_slices_back():
    service = _tiny_service(buckets=(4, 8))
    assert service.bucket_size(1) == 4
    assert service.bucket_size(4) == 4
    assert service.bucket_size(5) == 8
    # oversize requests are CHUNKED, not padded to a mega-batch
    assert service.request_plan(9) == [8, 4]
    assert service.request_plan(16) == [8, 8]
    assert service.request_plan(17) == [8, 8, 4]
    assert service.request_plan(3) == [4]
    out = service.sample_classes([2, 4, 5], n_per_class=1, rng=jax.random.key(3))
    assert out.shape == (3, 64, 64, 3)  # padded to 4 internally, sliced back


def test_oversize_request_chunks_within_ladder_waste():
    """A request just past the top bucket runs [top, small-tail] chunks —
    not a padded multiple of the top bucket (VERDICT r2 item 9: a
    513-image request with a 512 top bucket must cost 520, not 1024).
    Scaled here: 9 images with top bucket 8 -> [8, 4] = 12 sampled."""
    service = _tiny_service(buckets=(4, 8))
    seen = []
    orig = service.sampler.sample

    def spy(rng, batch, *cond):
        seen.append(batch)
        return orig(rng, batch, *cond)

    service.sampler.sample = spy
    out = service.sample_classes(list(range(3)), n_per_class=3,
                                 rng=jax.random.key(8))  # n=9
    assert out.shape == (9, 64, 64, 3)
    assert seen == [8, 4]  # <= one ladder step of waste
    assert sum(seen) < 16  # strictly better than the old 2*top mega-batch

    seen.clear()
    lat = service.sample_latents(jnp.arange(13) % 6, jax.random.key(9))
    assert lat.shape == (13, 16)
    assert seen == [8, 8]  # 13 -> top chunk + bucket_size(5)=8 tail


def test_bucketing_reuses_one_program_across_request_sizes():
    """Two different request sizes in the same bucket must hit the SAME
    compiled program (batch is a static jit arg): assert the sampler sees
    one padded batch size for both (VERDICT r1 item 8)."""
    service = _tiny_service(buckets=(4, 8))
    seen = []
    orig = service.sampler.sample

    def spy(rng, batch, *cond):
        seen.append(batch)
        return orig(rng, batch, *cond)

    service.sampler.sample = spy
    service.sample_classes([0], n_per_class=2, rng=jax.random.key(4))  # n=2
    service.sample_classes([0, 1, 2], n_per_class=1, rng=jax.random.key(5))  # n=3
    service.sample_latents(jnp.array([1]), jax.random.key(6))  # n=1
    # decode requests ride the ONE-dispatch sample+decode pipeline
    # (_pipe_jit): the sampler is invoked only when jit TRACES a new bucket
    # shape, so two same-bucket decode requests record a single batch-4
    # trace — the no-recompile property itself. The latents request calls
    # the sampler eagerly (second 4).
    assert seen == [4, 4]
    # a third same-bucket decode request must not trace anything new
    service.sample_classes([3], n_per_class=4, rng=jax.random.key(7))  # n=4
    assert seen == [4, 4]


def test_service_with_latent_stats_and_clip():
    """Codec + clipping compose with bucketing: outputs come back in raw
    latent space, sliced to the request size."""
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=6
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)
    mean = jnp.full((16,), 2.0)
    std = jnp.full((16,), 0.5)
    service = SamplingService(model, params, vae, vae_params,
                              sched=linear_schedule(8), use_fused=False,
                              buckets=(4,), latent_stats=(mean, std),
                              clip_x0=3.0)
    lat = service.sample_latents(jnp.array([1, 2, 3]), jax.random.key(1))
    assert lat.shape == (3, 16)
    # model space is clipped near [-3-ish, 3-ish]; raw = z*0.5 + 2
    assert float(lat.mean()) > 0.5  # shifted by the mean -> clearly raw space
    assert bool(jnp.isfinite(lat).all())


def test_warmup_covers_buckets():
    service = _tiny_service(buckets=(4,))
    seen = []
    orig = service.sampler.sample

    def spy(rng, batch, *cond):
        seen.append(batch)
        return orig(rng, batch, *cond)

    service.sampler.sample = spy
    service.warmup(jax.random.key(7))
    assert seen == [4]


def test_ddim_serving_path():
    """sampler_kind='ddim' routes requests through the accelerated DDIM
    scan (VERDICT r2 item 8: DDIM must be reachable from serving)."""
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=6
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)
    service = SamplingService(model, params, vae, vae_params,
                              sched=linear_schedule(32), use_fused=False,
                              buckets=(4,), sampler_kind="ddim", ddim_steps=4)
    seen = []
    inner = service.sampler._inner  # the DDIMSampler view wraps this
    orig = inner.ddim

    def spy(rng_, batch, *cond, num_steps):
        seen.append((batch, num_steps))
        return orig(rng_, batch, *cond, num_steps=num_steps)

    inner.ddim = spy
    imgs = service.sample_classes([1, 2], n_per_class=1, rng=jax.random.key(1))
    assert imgs.shape == (2, 64, 64, 3)
    assert seen == [(4, 4)]  # bucketed batch through the DDIM path


# ---------------------------------------------------------------------------
# pixel family (v4/v5) serving
# ---------------------------------------------------------------------------
def _tiny_pixel_service(**kw):
    from flowerdiff.models.pixel_unet import PixelUNet
    from flowerdiff.serving import PixelSamplingService

    model = PixelUNet(base_channels=8, time_emb_dim=16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))
    kw.setdefault("sched", linear_schedule(8))
    kw.setdefault("buckets", (2, 4))
    kw.setdefault("img_size", 16)
    return PixelSamplingService(model, params, **kw)


def test_pixel_service_end_to_end():
    service = _tiny_pixel_service()
    imgs = service.sample_images(3, jax.random.key(1))
    assert imgs.shape == (3, 16, 16, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    # oversize request chunks through the ladder
    assert service.request_plan(5) == [4, 2]
    imgs = service.sample_images(5, jax.random.key(2))
    assert imgs.shape == (5, 16, 16, 3)


def test_pixel_service_ddim():
    service = _tiny_pixel_service(sampler_kind="ddim", ddim_steps=4)
    imgs = service.sample_images(2, jax.random.key(3))
    assert imgs.shape == (2, 16, 16, 3)
    assert bool(jnp.isfinite(imgs).all())


def test_pixel_service_determinism_across_chunking():
    """Chunk i folds the request rng, so a given (rng, n) is deterministic."""
    service = _tiny_pixel_service()
    a = service.sample_images(5, jax.random.key(7))
    b = service.sample_images(5, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_bf16_service_contract():
    """decode_bf16=True runs the decoder convs in bf16 but the service
    contract is unchanged: f32 images in [0,1] (or uint8 with
    quantize_uint8), matching the f32 service to sub-quantization error."""
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=6
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)
    kw = dict(sched=linear_schedule(8), use_fused=False, buckets=(4,))
    svc32 = SamplingService(model, params, vae, vae_params, **kw)
    svc16 = SamplingService(model, params, vae, vae_params,
                            decode_bf16=True, **kw)
    img32 = svc32.sample_classes([0, 3], n_per_class=2, rng=jax.random.key(1))
    img16 = svc16.sample_classes([0, 3], n_per_class=2, rng=jax.random.key(1))
    assert img16.dtype == np.float32
    assert img16.shape == img32.shape == (4, 64, 64, 3)
    assert float(np.mean(np.abs(img32 - img16))) < 1.0 / 255.0
