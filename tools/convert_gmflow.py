"""Convert the official GMFlow torch checkpoint (gmflow_sintel) to the flat
npz consumed by nicer_slam_tpu.models.gmflow.

Run where the torch checkpoint is available (this offline image cannot
fetch it):
  python tools/convert_gmflow.py --ckpt gmflow_sintel-0c07dcb3.pth --out gmflow.npz

Torch convs [co,ci,kh,kw] -> [kh,kw,ci,co]; linears [co,ci] -> [ci,co].
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)

    import numpy as np
    import torch

    sd = torch.load(a.ckpt, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]

    out = {}

    def conv(key, t):
        out[key + "/w"] = t.permute(2, 3, 1, 0).numpy().astype(np.float32)

    def lin(key, wt, bt=None):
        out[key + "/w"] = wt.t().numpy().astype(np.float32)
        if bt is not None:
            out[key + "/b"] = bt.numpy().astype(np.float32)

    # backbone convs (upstream: backbone.conv1/2 + trident blocks; map the
    # first six conv layers onto backbone/c1..c6 — extend for the exact
    # upstream layout when converting)
    conv_keys = [k for k in sd if k.endswith(".weight") and sd[k].dim() == 4]
    for i, k in enumerate(sorted(conv_keys)[:6]):
        conv(f"backbone/c{i+1}", sd[k])
        bk = k.replace(".weight", ".bias")
        if bk in sd:
            out[f"backbone/c{i+1}/b"] = sd[bk].numpy().astype(np.float32)

    # transformer blocks: upstream transformer.layers.N.{self_attn,cross_attn}
    for n in range(6):
        for half, tag in (("self_attn", 2 * n), ("cross_attn", 2 * n + 1)):
            pre = f"transformer.layers.{n}.{half}."
            if pre + "q_proj.weight" not in sd:
                continue
            lin(f"blocks/{tag}/q", sd[pre + "q_proj.weight"],
                sd.get(pre + "q_proj.bias"))
            lin(f"blocks/{tag}/k", sd[pre + "k_proj.weight"],
                sd.get(pre + "k_proj.bias"))
            lin(f"blocks/{tag}/v", sd[pre + "v_proj.weight"],
                sd.get(pre + "v_proj.bias"))
            lin(f"blocks/{tag}/proj", sd[pre + "merge.weight"],
                sd.get(pre + "merge.bias"))

    print(f"converted {len(out)} arrays "
          f"({len(sd)} source tensors; extend mappings as needed)")
    np.savez(a.out, **out)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
