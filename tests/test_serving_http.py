"""HTTP serving front-end tests (serving_http.py): coalescing batcher
semantics (deterministic, manual-drain mode) + a live ThreadingHTTPServer
round-trip on an ephemeral port with the tiny CPU service."""
import io
import json
import threading
import http.client

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.diffusion import linear_schedule
from flowerdiff.models import ConditionalLatentDenoiser, FlowerVAE
from flowerdiff.serving import SamplingService
from flowerdiff.serving_http import CoalescingBatcher, serve


def _tiny_service(num_colors=None, buckets=(4, 8)):
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
        num_classes=6, num_colors=num_colors,
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    cond = (jnp.zeros((1,), jnp.int32),) * (2 if num_colors else 1)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        *cond)
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)
    return SamplingService(model, params, vae, vae_params,
                           sched=linear_schedule(8), use_fused=False,
                           buckets=buckets)


# ---------------------------------------------------------------------------
# batcher semantics (no worker thread -> deterministic coalescing)
# ---------------------------------------------------------------------------
def test_batcher_coalesces_requests_into_one_dispatch():
    service = _tiny_service()
    batcher = CoalescingBatcher(service, jax.random.key(1), autostart=False)
    seen = []
    orig = service.sample_async

    def spy(classes, key, colors=None, decode=True):
        seen.append(int(np.asarray(classes).shape[0]))
        return orig(classes, key, colors, decode=decode)

    service.sample_async = spy
    results = {}

    def client(name, classes):
        results[name] = batcher.submit(classes)

    threads = [threading.Thread(target=client, args=(i, [i % 6, (i + 1) % 6]))
               for i in range(3)]
    for t in threads:
        t.start()
    # wait until all three requests are queued, then drain ONCE
    for _ in range(100):
        if batcher.stats["requests"] == 3:
            break
        threading.Event().wait(0.01)
    batcher.drain_once()
    for t in threads:
        t.join(timeout=30)
    assert seen == [6]  # 3 x 2 rows merged into one device call
    assert batcher.stats == {
        "requests": 3, "images": 6, "dispatches": 1,
        "max_coalesced": 3, "errors": 0,
    }
    for i in range(3):
        assert results[i].shape == (2, 64, 64, 3)


def test_batcher_rows_match_unbatched_request():
    """Coalescing must be invisible: each caller's rows equal a direct
    service call with the same dispatch key and its position's slice."""
    service = _tiny_service()
    batcher = CoalescingBatcher(service, jax.random.key(2), autostart=False)
    outs = {}
    t1 = threading.Thread(target=lambda: outs.update(
        a=batcher.submit([1, 2])))
    t2 = threading.Thread(target=lambda: outs.update(
        b=batcher.submit([3])))
    t1.start(); t2.start()
    for _ in range(100):
        if batcher.stats["requests"] == 2:
            break
        threading.Event().wait(0.01)
    batcher.drain_once()
    t1.join(timeout=30); t2.join(timeout=30)
    # replay the merged dispatch directly (order = submission order)
    merged_classes = np.concatenate([[1, 2], [3]]) if "a" in outs else None
    key = jax.random.fold_in(jax.random.key(2), 0)
    direct = np.asarray(service.sample(merged_classes, key))
    np.testing.assert_array_equal(outs["a"], direct[:2])
    np.testing.assert_array_equal(outs["b"], direct[2:3])


def test_batcher_groups_incompatible_kinds_separately():
    """A latents request and a decoded request can't share a program —
    they dispatch separately but both complete."""
    service = _tiny_service()
    batcher = CoalescingBatcher(service, jax.random.key(3), autostart=False)
    outs = {}
    t1 = threading.Thread(
        target=lambda: outs.update(img=batcher.submit([0])))
    t2 = threading.Thread(
        target=lambda: outs.update(lat=batcher.submit([1], decode=False)))
    t1.start(); t2.start()
    for _ in range(100):
        if batcher.stats["requests"] == 2:
            break
        threading.Event().wait(0.01)
    batcher.drain_once()
    t1.join(timeout=30); t2.join(timeout=30)
    assert batcher.stats["dispatches"] == 2
    assert outs["img"].shape == (1, 64, 64, 3)
    assert outs["lat"].shape == (1, 16)


def test_batcher_propagates_errors_per_caller():
    service = _tiny_service()
    batcher = CoalescingBatcher(service, jax.random.key(4), autostart=False)

    def boom(*a, **k):
        raise RuntimeError("device exploded")

    service.sample_async = boom
    err = {}

    def client():
        try:
            batcher.submit([0])
        except RuntimeError as exc:
            err["exc"] = exc

    t = threading.Thread(target=client)
    t.start()
    for _ in range(100):
        if batcher.stats["requests"] == 1:
            break
        threading.Event().wait(0.01)
    batcher.drain_once()
    t.join(timeout=30)
    assert "device exploded" in str(err["exc"])
    assert batcher.stats["errors"] == 1


def test_batcher_double_buffers_dispatch_ahead_of_fetch():
    """The round-4 serving lever: window i+1 must DISPATCH while window i's
    fetch (D2H) is still blocked — the old serial worker couldn't
    (BASELINE.md round 4: burst sat at ~43% of the pipelined ceiling)."""
    class _AsyncStub:
        def __init__(self):
            self.dispatched = []
            self.release = threading.Event()

        def sample_async(self, classes, key, colors=None, decode=True):
            n = int(np.asarray(classes).shape[0])
            self.dispatched.append(n)

            def fetch():
                assert self.release.wait(20), "fetch never released"
                return np.zeros((n, 4, 4, 3), np.float32)

            return fetch

    stub = _AsyncStub()
    batcher = CoalescingBatcher(stub, jax.random.key(7), max_wait_ms=1.0,
                                autostart=True)
    try:
        results = {}

        def client(i):
            results[i] = batcher.submit([i, i + 1])

        t0 = threading.Thread(target=client, args=(0,))
        t0.start()
        for _ in range(500):  # wait for window 0 to dispatch
            if len(stub.dispatched) == 1:
                break
            threading.Event().wait(0.01)
        assert len(stub.dispatched) == 1
        # window 0's fetch is blocked on `release`; window 1 must still
        # reach the device
        t1 = threading.Thread(target=client, args=(2,))
        t1.start()
        for _ in range(500):
            if len(stub.dispatched) == 2:
                break
            threading.Event().wait(0.01)
        assert len(stub.dispatched) == 2, (
            "second window did not dispatch while the first fetch was "
            "in flight — batcher is serial again")
        stub.release.set()
        t0.join(timeout=20)
        t1.join(timeout=20)
        assert results[0].shape == (2, 4, 4, 3)
        assert results[2].shape == (2, 4, 4, 3)
        assert batcher.stats["dispatches"] == 2
    finally:
        stub.release.set()
        batcher.stop()


# ---------------------------------------------------------------------------
# live HTTP server round-trip
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def http_server():
    service = _tiny_service()
    server = serve(service, jax.random.key(9), host="127.0.0.1", port=0,
                   max_wait_ms=1.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server
    server.shutdown()
    server.batcher.stop()


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.server_address[1],
                                      timeout=120)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_http_healthz_and_stats(http_server):
    status, ctype, data = _request(http_server, "GET", "/healthz")
    assert status == 200 and ctype == "application/json"
    health = json.loads(data)
    assert health["ok"] is True and health["num_classes"] == 6
    status, _, data = _request(http_server, "GET", "/stats")
    assert status == 200 and "dispatches" in json.loads(data)


def test_http_sample_npy(http_server):
    status, ctype, data = _request(
        http_server, "POST", "/v1/sample",
        {"classes": [0, 3], "n_per_class": 2, "format": "npy"})
    assert status == 200 and ctype == "application/octet-stream"
    arr = np.load(io.BytesIO(data))
    assert arr.shape == (4, 64, 64, 3)
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_http_sample_png_grid(http_server):
    from PIL import Image

    status, ctype, data = _request(
        http_server, "POST", "/v1/sample", {"classes": [1, 2, 4]})
    assert status == 200 and ctype == "image/png"
    img = Image.open(io.BytesIO(data))
    assert img.size == (2 * 64, 2 * 64)  # 3 images -> 2x2 grid


def test_http_sample_latents_json(http_server):
    status, _, data = _request(
        http_server, "POST", "/v1/sample",
        {"classes": [5], "latents": True, "format": "json"})
    assert status == 200
    body = json.loads(data)
    assert body["shape"] == [1, 16]
    assert np.isfinite(np.asarray(body["data"])).all()


def test_http_classes_endpoint_and_name_resolution(http_server):
    """Names mirror the reference's name-or-index args (v1:856-882):
    default class names are stringified indices (v1:1302)."""
    status, _, data = _request(http_server, "GET", "/v1/classes")
    assert status == 200
    names = json.loads(data)["classes"]
    assert names == [str(i) for i in range(6)]
    # sample by name == sample by index (names resolve before dispatch)
    status, ctype, _ = _request(
        http_server, "POST", "/v1/sample",
        {"classes": ["2", 4, "0"], "format": "npy"})
    assert status == 200 and ctype == "application/octet-stream"
    status, _, data = _request(
        http_server, "POST", "/v1/sample", {"classes": ["nope"]})
    assert status == 400 and "unknown classes name" in json.loads(data)["error"]
    # uncolored model: /v1/colors is a 404
    status, _, _ = _request(http_server, "GET", "/v1/colors")
    assert status == 404


def test_http_color_names():
    """v3 dual conditioning by color NAME (v3:1175-1234 name-or-index)."""
    from flowerdiff.data.color_labels import COLOR_NAMES

    service = _tiny_service(num_colors=10)
    server = serve(service, jax.random.key(12), host="127.0.0.1", port=0,
                   max_wait_ms=1.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        status, _, data = _request(server, "GET", "/v1/colors")
        assert status == 200
        assert json.loads(data)["colors"] == COLOR_NAMES
        status, _, data = _request(
            server, "POST", "/v1/sample",
            {"classes": [0, 1], "colors": [COLOR_NAMES[2], 3],
             "format": "npy"})
        assert status == 200
        assert np.load(io.BytesIO(data)).shape == (2, 64, 64, 3)
        status, _, data = _request(
            server, "POST", "/v1/sample",
            {"classes": [0], "colors": ["chartreuse"]})
        assert status == 400
        assert "unknown colors name" in json.loads(data)["error"]
    finally:
        server.shutdown()
        server.batcher.stop()


def test_http_animate_gif(http_server):
    """POST /v1/animate returns a multi-frame GIF (the reference's
    create_diffusion_animation artifact, v1:884-960, as a service)."""
    from PIL import Image

    status, ctype, data = _request(
        http_server, "POST", "/v1/animate",
        {"class": "3", "num_frames": 6, "fps": 5, "seed": 7})
    assert status == 200 and ctype == "image/gif"
    gif = Image.open(io.BytesIO(data))
    # ping-pong list for 6 frames over 8 steps: forward + interior backward
    assert gif.format == "GIF" and gif.n_frames > 6
    # seeded -> reproducible bytes
    status2, _, data2 = _request(
        http_server, "POST", "/v1/animate",
        {"class": "3", "num_frames": 6, "fps": 5, "seed": 7})
    assert status2 == 200 and data2 == data
    # stats carry the animation counter
    _, _, stats = _request(http_server, "GET", "/stats")
    assert json.loads(stats)["animations"] >= 2


def test_http_animate_validation(http_server):
    cases = [
        ({}, 400),                                   # missing class
        ({"class": 99}, 400),                        # out of range
        ({"class": 0, "num_frames": 1}, 400),        # too few frames
        ({"class": 0, "fps": 0}, 400),               # bad fps
        ({"class": 0, "seed": "x"}, 400),            # bad seed
        ({"class": 0, "color": 1}, 400),             # uncolored model
    ]
    for body, want in cases:
        status, _, data = _request(http_server, "POST", "/v1/animate", body)
        assert status == want, (body, status, data)


def test_http_validation_errors(http_server):
    cases = [
        ({}, 400),                                     # missing classes
        ({"classes": []}, 400),                        # empty
        ({"classes": [99]}, 400),                      # out of range
        ({"classes": [0], "n_per_class": 0}, 400),     # bad repeat
        ({"classes": [0], "format": "bmp"}, 400),      # bad format
        ({"classes": [0], "latents": True}, 400),      # latents need npy/json
        ({"classes": [0], "colors": [1]}, 400),        # model has no colors
        ({"classes": list(range(6)) * 200}, 413),      # over max_batch
    ]
    for body, want in cases:
        status, _, data = _request(http_server, "POST", "/v1/sample", body)
        assert status == want, (body, status, data)
        assert "error" in json.loads(data)
    # malformed JSON
    conn = http.client.HTTPConnection(
        "127.0.0.1", http_server.server_address[1], timeout=30)
    conn.request("POST", "/v1/sample", body=b"{nope",
                 headers={"Content-Type": "application/json"})
    assert conn.getresponse().status == 400
    conn.close()


def test_http_concurrent_requests_all_served(http_server):
    """A burst of parallel clients all get correct rows back (coalescing
    itself is asserted deterministically in the batcher tests above)."""
    results = {}

    def client(i):
        status, _, data = _request(
            http_server, "POST", "/v1/sample",
            {"classes": [i % 6], "format": "npy"})
        results[i] = (status, np.load(io.BytesIO(data)))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 5
    for status, arr in results.values():
        assert status == 200 and arr.shape == (1, 64, 64, 3)


def _tiny_pixel_service():
    from flowerdiff.models.pixel_unet import PixelUNet
    from flowerdiff.serving import PixelSamplingService

    model = PixelUNet(base_channels=8, time_emb_dim=16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))
    return PixelSamplingService(model, params, sched=linear_schedule(8),
                                buckets=(2, 4), img_size=16)


def test_http_pixel_family():
    """The same server fronts the unconditional v4/v5 family: {'n': count}
    requests, class-free animation, 404 class/color discovery."""
    from PIL import Image

    server = serve(_tiny_pixel_service(), jax.random.key(21),
                   host="127.0.0.1", port=0, max_wait_ms=1.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        status, _, data = _request(server, "GET", "/healthz")
        health = json.loads(data)
        assert health["family"] == "pixel" and health["num_classes"] is None
        status, _, _ = _request(server, "GET", "/v1/classes")
        assert status == 404
        status, ctype, data = _request(
            server, "POST", "/v1/sample", {"n": 3, "format": "npy"})
        assert status == 200
        arr = np.load(io.BytesIO(data))
        assert arr.shape == (3, 16, 16, 3)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
        # conditional args are rejected with a helpful message
        for bad in ({"classes": [0]}, {"n": 1, "colors": [0]},
                    {"n": 0}, {"n": 1, "latents": True}):
            status, _, data = _request(server, "POST", "/v1/sample", bad)
            assert status == 400, (bad, data)
        # class-free animation
        status, ctype, data = _request(
            server, "POST", "/v1/animate",
            {"num_frames": 4, "fps": 5, "seed": 3})
        assert status == 200 and ctype == "image/gif"
        gif = Image.open(io.BytesIO(data))
        assert gif.format == "GIF" and gif.n_frames >= 4
        status, _, _ = _request(server, "POST", "/v1/animate", {"class": 0})
        assert status == 400
    finally:
        server.shutdown()
        server.batcher.stop()


def test_http_color_conditioned_model():
    """v3 dual conditioning over HTTP: colors validated + threaded through."""
    service = _tiny_service(num_colors=4)
    server = serve(service, jax.random.key(11), host="127.0.0.1", port=0,
                   max_wait_ms=1.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        status, ctype, data = _request(
            server, "POST", "/v1/sample",
            {"classes": [0, 2], "colors": [1, 3], "format": "npy"})
        assert status == 200
        assert np.load(io.BytesIO(data)).shape == (2, 64, 64, 3)
        status, _, data = _request(
            server, "POST", "/v1/sample",
            {"classes": [0], "colors": [9]})  # color out of range
        assert status == 400
    finally:
        server.shutdown()
        server.batcher.stop()


def test_pixel_service_from_run(tmp_path):
    """pixel_service_from_run restores a saved ckpt_pixel and serves it
    (the v4/v5 counterpart of service_from_run)."""
    from flowerdiff.configs import get_preset, tiny_preset
    from flowerdiff.serving import pixel_service_from_run
    from flowerdiff.train.checkpoints import CheckpointManager, state_to_tree
    from flowerdiff.train.pixel_ddpm import PixelDiffusionTrainer

    preset = tiny_preset(get_preset("v4"))
    trainer = PixelDiffusionTrainer(preset.pixel, jax.random.key(42))
    CheckpointManager(str(tmp_path / "ckpt_pixel")).save(
        1, state_to_tree(trainer.state))
    svc = pixel_service_from_run(str(tmp_path), version="v4", tiny=True,
                                 buckets=(2, 4))
    imgs = svc.sample_images(3, jax.random.key(1))
    size = preset.pixel.img_size
    assert imgs.shape == (3, size, size, 3)
    assert np.isfinite(imgs).all()
