"""Convert the official LPIPS (alex) weights to the flat npz consumed by
nicer_slam_tpu.models.lpips.

Run where torch + torchvision + the lpips package checkpoint are available
(this offline image cannot fetch them):
  python tools/convert_lpips.py --alexnet alexnet-owt.pth \
      --lpips lpips_alex.pth --out lpips_alex.npz

Sources:
  * torchvision AlexNet `features` convs at indices 0,3,6,8,10
  * the LPIPS checkpoint's lin0..lin4 `.model.1.weight` [C_out=1, C, 1, 1]
Torch convs [co,ci,kh,kw] -> [kh,kw,ci,co]; lin weights -> [1,1,C,1].

Validated by tests/test_priors_models.py round-trip against a torch
reference with the official layouts.
"""

from __future__ import annotations

import argparse

_FEATURE_IDX = (0, 3, 6, 8, 10)


def convert_state_dicts(alex_sd, lpips_sd):
    import numpy as np

    out = {}
    for i, fi in enumerate(_FEATURE_IDX):
        w = np.asarray(alex_sd[f"features.{fi}.weight"])
        b = np.asarray(alex_sd[f"features.{fi}.bias"])
        out[f"conv/{i}/w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"conv/{i}/b"] = b.astype(np.float32)
    for i in range(5):
        # lpips checkpoints store lin weights as "lin{i}.model.1.weight"
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                w = np.asarray(lpips_sd[key])         # [1, C, 1, 1]
                out[f"lin/{i}/w"] = np.transpose(
                    w, (2, 3, 1, 0)).astype(np.float32)  # [1,1,C,1]
                break
        else:
            raise KeyError(f"lin{i} weight not found in lpips checkpoint")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--alexnet", required=True,
                   help="torchvision alexnet state dict (.pth)")
    p.add_argument("--lpips", required=True,
                   help="lpips alex linear-head checkpoint (.pth)")
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)

    import numpy as np
    import torch

    alex_sd = torch.load(a.alexnet, map_location="cpu")
    lpips_sd = torch.load(a.lpips, map_location="cpu")
    alex_sd = {k: v.numpy() for k, v in alex_sd.items() if hasattr(v, "numpy")}
    lpips_sd = {k: v.numpy() for k, v in lpips_sd.items() if hasattr(v, "numpy")}

    out = convert_state_dicts(alex_sd, lpips_sd)
    np.savez(a.out, **out)
    print(f"wrote {a.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
