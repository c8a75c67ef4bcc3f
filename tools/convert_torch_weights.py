"""Convert auxiliary torch weights (VGG16 for LPIPS, I3D for FVD) into the
files our eval stack loads.

Run where torchvision / the published I3D port are available:

  # LPIPS backbone + linear heads
  python tools/convert_torch_weights.py vgg --out pretrained_models/vgg16_torch.pth
  # kinetics-400 I3D (piergiaj/pytorch-i3d rgb_imagenet.pt naming)
  python tools/convert_torch_weights.py i3d --src rgb_imagenet.pt \
      --out pretrained_models/i3d_torch.pt
"""

import argparse
import sys


def convert_vgg(out: str):
    import torch
    import torchvision
    model = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    torch.save(model.state_dict(), out)
    print(f"wrote {out}")


def convert_i3d(src: str, out: str):
    import torch
    sd = torch.load(src, map_location="cpu")
    # piergiaj naming already matches ivideogpt_tpu.models.i3d.load_torch_i3d;
    # pass through with a sanity scan
    convs = [k for k in sd if k.endswith("conv3d.weight")]
    assert convs, f"unexpected I3D state dict keys: {list(sd)[:5]}"
    torch.save(sd, out)
    print(f"wrote {out} ({len(convs)} conv units)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["vgg", "i3d"])
    p.add_argument("--src", default=None)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    if a.kind == "vgg":
        convert_vgg(a.out)
    else:
        assert a.src, "--src required for i3d"
        convert_i3d(a.src, a.out)
