"""Real-Oxford-102 readiness (VERDICT r3 item 5).

Two layers:
  - fast mechanics tests for tools/real_data_drill.py (hash verification,
    artifact-name parity matching) that always run;
  - a `realdata`-marked integration test that runs the FULL drill (stage,
    native ingest, short train, artifact parity) and auto-skips unless the
    three upstream files exist (this image has no network egress, so they
    never do in CI — the day they are dropped next to the repo,
    `pytest -m realdata` proves real-flower parity end to end).

Real file discovery: $FLOWERS102_FILES (colon-separated tarball:labels:setid)
or ./102flowers.tgz, ./imagelabels.mat, ./setid.mat in the repo root.
"""
import hashlib
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from real_data_drill import KNOWN_MD5, artifact_parity, md5  # noqa: E402


def _real_files():
    env = os.environ.get("FLOWERS102_FILES")
    if env:
        parts = env.split(":")
        if len(parts) == 3 and all(os.path.exists(p) for p in parts):
            return parts
    cand = [os.path.join(REPO, n) for n in
            ("102flowers.tgz", "imagelabels.mat", "setid.mat")]
    if all(os.path.exists(p) for p in cand):
        return cand
    return None


def test_md5_helper_matches_hashlib(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"flowerdiff" * 1000)
    assert md5(str(p)) == hashlib.md5(b"flowerdiff" * 1000).hexdigest()


def test_known_hash_table_is_the_torchvision_contract():
    # the three torchvision _file_dict entries, keyed by canonical filename
    assert set(KNOWN_MD5) == {"102flowers.tgz", "imagelabels.mat", "setid.mat"}
    assert all(len(v) == 32 and int(v, 16) >= 0 for v in KNOWN_MD5.values())


def test_artifact_parity_matching():
    produced = {
        "autoencoder_losses.png", "vae_samples_grid_subset.png",
        "diffusion_loss.png", "denoising_path_21_final.png",
        "diffusion_animation_21_final.gif", "sample_class_3_epoch_300.png",
        "sample_quality.jsonl",
    }
    assert artifact_parity(produced) == []
    # remove one family -> exactly that pattern is reported missing
    produced.discard("diffusion_loss.png")
    assert artifact_parity(produced) == ["diffusion_loss.png"]
    # epoch placeholder must be numeric
    bad = set(produced) | {"diffusion_loss.png"}
    bad.discard("sample_class_3_epoch_300.png")
    bad.add("sample_class_3_epoch_final.png")
    assert artifact_parity(bad) == ["sample_class_{c}_epoch_{e}.png"]


@pytest.mark.realdata
@pytest.mark.slow
def test_real_data_drill_end_to_end(tmp_path):
    files = _real_files()
    if files is None:
        pytest.skip("real Oxford-102 files not present (no egress in CI); "
                    "drop 102flowers.tgz/imagelabels.mat/setid.mat in the "
                    "repo root or set FLOWERS102_FILES to run")
    tarball, labels, setid = files
    out = tmp_path / "drill_out"
    rc = subprocess.call([
        sys.executable, os.path.join(REPO, "tools", "real_data_drill.py"),
        "--tarball", tarball, "--labels", labels, "--setid", setid,
        "--root", str(tmp_path / "data"), "--out", str(out),
    ])
    assert rc == 0
    assert (out / "sample_quality.jsonl").exists()
