#!/usr/bin/env python
"""Offline converter: torchvision VGG16 state_dict -> flowerdiff .npz asset.

Usage (on a machine with the torchvision checkpoint file, e.g.
~/.cache/torch/hub/checkpoints/vgg16-*.pth):

    python tools/convert_vgg_weights.py <vgg16_state_dict.pth> \
        src/flowerdiff/assets/vgg16_features16.npz

Converts features.{0,2,5,7,10,12,14}.{weight,bias} — the conv prefix through
relu3_3 used by the reference perceptual loss (v1/model_train_test.py:965) —
from torch's (out,in,kh,kw) to NHWC-ready (kh,kw,in,out).
"""
import sys

import numpy as np
import torch

_IDX_TO_NAME = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
}


def main(src: str, dst: str) -> None:
    state = torch.load(src, map_location="cpu", weights_only=True)
    out = {}
    for idx, name in _IDX_TO_NAME.items():
        w = state[f"features.{idx}.weight"].numpy()  # (out, in, kh, kw)
        b = state[f"features.{idx}.bias"].numpy()
        out[f"{name}_kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"{name}_bias"] = b.astype(np.float32)
    np.savez(dst, **out)
    print(f"wrote {dst}: {sorted(out)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
