"""Convert official Omnidata DPT-hybrid torch checkpoints to the flat npz
consumed by nicer_slam_tpu.models.dpt.

Run where the torch checkpoints are available (this offline image cannot
fetch them):
  python tools/convert_omnidata.py --ckpt omnidata_dpt_depth_v2.ckpt \
      --task depth --out dpt_depth.npz

Key mapping notes (torch DPT-hybrid -> our param tree):
  pretrained.model.patch_embed.backbone.*  -> resnet/*
  pretrained.model.blocks.N.*              -> blocks/N/*
  scratch.layerN_rn / refinenetN           -> act_post / fusion
  scratch.output_conv.*                    -> head/*
Torch convs are [co,ci,kh,kw] -> transpose to [kh,kw,ci,co]; linear weights
[co,ci] -> [ci,co].
"""

from __future__ import annotations

import argparse
import sys


def conv_w(t):
    return t.permute(2, 3, 1, 0).numpy()


def lin_w(t):
    return t.t().numpy()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--task", choices=["depth", "normal"], required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)

    import numpy as np
    import torch

    sd = torch.load(a.ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
          for k, v in sd.items()}

    out = {}

    def put(key, val):
        out[key] = np.asarray(val, dtype=np.float32)

    # --- ViT blocks
    for i in range(12):
        pre = f"pretrained.model.blocks.{i}."
        if pre + "norm1.weight" not in sd:
            continue
        put(f"blocks/{i}/ln1/g", sd[pre + "norm1.weight"])
        put(f"blocks/{i}/ln1/b", sd[pre + "norm1.bias"])
        put(f"blocks/{i}/ln2/g", sd[pre + "norm2.weight"])
        put(f"blocks/{i}/ln2/b", sd[pre + "norm2.bias"])
        put(f"blocks/{i}/qkv/w", lin_w(sd[pre + "attn.qkv.weight"]))
        put(f"blocks/{i}/qkv/b", sd[pre + "attn.qkv.bias"])
        put(f"blocks/{i}/proj/w", lin_w(sd[pre + "attn.proj.weight"]))
        put(f"blocks/{i}/proj/b", sd[pre + "attn.proj.bias"])
        put(f"blocks/{i}/fc1/w", lin_w(sd[pre + "mlp.fc1.weight"]))
        put(f"blocks/{i}/fc1/b", sd[pre + "mlp.fc1.bias"])
        put(f"blocks/{i}/fc2/w", lin_w(sd[pre + "mlp.fc2.weight"]))
        put(f"blocks/{i}/fc2/b", sd[pre + "mlp.fc2.bias"])

    if "pretrained.model.pos_embed" in sd:
        put("pos_embed", sd["pretrained.model.pos_embed"])
        put("cls_token", sd["pretrained.model.cls_token"])

    # --- remaining groups require the exact upstream checkpoint layout;
    # extend the mapping here when converting (resnet stem/stages, patch
    # embed proj, scratch.layer*_rn, refinenets, output conv).
    missing = [k for k in sd if k.startswith("scratch.")][:8]
    print(f"converted {len(out)} arrays; sample unconverted keys: {missing}")
    np.savez(a.out, **out)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
