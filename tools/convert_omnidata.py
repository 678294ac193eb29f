"""Convert official Omnidata DPT-hybrid torch checkpoints to the flat npz
consumed by nicer_slam_tpu.models.dpt.

Run where the torch checkpoints are available (this offline image cannot
fetch them):
  python tools/convert_omnidata.py --ckpt omnidata_dpt_depth_v2.ckpt \
      --task depth --out dpt_depth.npz

The source layout is the DPT repo's DPTDepthModel over the timm
vit_base_r50_s16_384 hybrid backbone (ResNetV2 stages (3,4,9) with
weight-standardized convs + GroupNorm, 12 ViT blocks, "project" readouts,
4 RefineNet fusion stages, 3-conv head), exactly what
nicer_slam_tpu/models/dpt.py implements. Conversions:
  torch conv weights [co,ci,kh,kw] -> [kh,kw,ci,co]
  torch linear weights [co,ci]     -> [ci,co]
  scratch.refinenet{4..1}          -> fusion/{0..3} (deepest first)

Validated by tests/test_priors_models.py: a synthetically constructed
state dict in this layout round-trips through convert_state_dict() into the
JAX model and matches a torch reference forward.
"""

from __future__ import annotations

import argparse


def conv_w(t):
    import numpy as np
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def lin_w(t):
    import numpy as np
    return np.asarray(t).T


def convert_state_dict(sd, depth: int = 12):
    """torch state dict (numpy-able tensors) -> flat {jax_key: np.ndarray}."""
    import numpy as np

    out = {}

    def put(key, val):
        out[key] = np.asarray(val, dtype=np.float32)

    def put_conv(key, pre, bias=True):
        put(key + "/w", conv_w(sd[pre + ".weight"]))
        if bias and (pre + ".bias") in sd:
            put(key + "/b", sd[pre + ".bias"])

    def put_norm(key, pre):
        put(key + "/g", sd[pre + ".weight"])
        put(key + "/b", sd[pre + ".bias"])

    def put_lin(key, pre):
        put(key + "/w", lin_w(sd[pre + ".weight"]))
        put(key + "/b", sd[pre + ".bias"])

    bb = "pretrained.model.patch_embed.backbone."

    # --- ResNetV2 backbone
    put_conv("resnet/stem", bb + "stem.conv", bias=False)
    put_norm("resnet/stem_norm", bb + "stem.norm")
    for s, n_blocks in enumerate((3, 4, 9)):
        for b in range(n_blocks):
            pre = f"{bb}stages.{s}.blocks.{b}."
            dst = f"resnet/stage{s}/{b}"
            for i in (1, 2, 3):
                put_conv(f"{dst}/conv{i}", pre + f"conv{i}", bias=False)
                put_norm(f"{dst}/norm{i}", pre + f"norm{i}")
            if pre + "downsample.conv.weight" in sd:
                put_conv(f"{dst}/down", pre + "downsample.conv", bias=False)
                put_norm(f"{dst}/down_norm", pre + "downsample.norm")

    # --- patch embed + tokens
    put_conv("patch_embed", "pretrained.model.patch_embed.proj")
    put("pos_embed", sd["pretrained.model.pos_embed"])
    put("cls_token", sd["pretrained.model.cls_token"])

    # --- ViT blocks
    for i in range(depth):
        pre = f"pretrained.model.blocks.{i}."
        put_norm(f"blocks/{i}/ln1", pre + "norm1")
        put_norm(f"blocks/{i}/ln2", pre + "norm2")
        put_lin(f"blocks/{i}/qkv", pre + "attn.qkv")
        put_lin(f"blocks/{i}/proj", pre + "attn.proj")
        put_lin(f"blocks/{i}/fc1", pre + "mlp.fc1")
        put_lin(f"blocks/{i}/fc2", pre + "mlp.fc2")

    # --- readout projections + act_postprocess convs
    put_lin("readout/0", "pretrained.act_postprocess3.0.project.0")
    put_lin("readout/1", "pretrained.act_postprocess4.0.project.0")
    put_conv("act_post/proj3", "pretrained.act_postprocess3.3")
    put_conv("act_post/proj4", "pretrained.act_postprocess4.3")
    put_conv("act_post/down4", "pretrained.act_postprocess4.4")

    # --- scratch: layer projections, refinenets (4=deepest -> fusion/0), head
    for i in range(4):
        put_conv(f"layer_rn/{i}", f"scratch.layer{i + 1}_rn", bias=False)
    for fi, rn in enumerate((4, 3, 2, 1)):
        pre = f"scratch.refinenet{rn}."
        for rcu in ("resConfUnit1", "resConfUnit2"):
            dst = "rcu1" if rcu == "resConfUnit1" else "rcu2"
            put_conv(f"fusion/{fi}/{dst}/conv1", pre + rcu + ".conv1")
            put_conv(f"fusion/{fi}/{dst}/conv2", pre + rcu + ".conv2")
        put_conv(f"fusion/{fi}/out", pre + "out_conv")
    for hi, oc in enumerate((0, 2, 4)):
        put_conv(f"head/{hi}", f"scratch.output_conv.{oc}")

    return out


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
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    out = convert_state_dict(sd)
    converted_src_keys = len(out)
    unconverted = [k for k in sd
                   if not any(k.startswith(p) for p in
                              ("pretrained.", "scratch."))]
    print(f"converted {converted_src_keys} arrays; "
          f"unrecognized source keys: {unconverted[:8]}")
    np.savez(a.out, **out)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
