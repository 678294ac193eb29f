"""Convert the official GMFlow torch checkpoint (gmflow_sintel) to the flat
npz consumed by nicer_slam_tpu.models.gmflow.

Run where the torch checkpoint is available (this offline image cannot
fetch it):
  python tools/convert_gmflow.py --ckpt gmflow_sintel-0c07dcb3.pth --out gmflow.npz

Source layout (haofeixu/gmflow GMFlow module):
  backbone.conv1 / backbone.layer{1,2,3}.{0,1}.{conv1,conv2,downsample.0}
  backbone.conv2
  transformer.layers.{n}.{self_attn,cross_attn_ffn}.{q_proj,k_proj,v_proj,
      merge,norm1,mlp.0,mlp.2,norm2}
  feature_flow_attn.{q_proj,k_proj}
  upsampler.{0,2}
InstanceNorms are affine=False (no parameters). Torch convs [co,ci,kh,kw]
-> [kh,kw,ci,co]; linears [co,ci] -> [ci,co].

Validated by tests/test_priors_models.py round-trip against a torch
reference built with the official key names.
"""

from __future__ import annotations

import argparse


def convert_state_dict(sd):
    """torch state dict (numpy-able values) -> flat {jax_key: np.ndarray}."""
    import numpy as np

    out = {}

    def put(key, val):
        out[key] = np.asarray(val, dtype=np.float32)

    def put_conv(key, pre):
        put(key + "/w", np.transpose(np.asarray(sd[pre + ".weight"]),
                                     (2, 3, 1, 0)))
        if (pre + ".bias") in sd:
            put(key + "/b", sd[pre + ".bias"])

    def put_lin(key, pre, bias=True):
        put(key + "/w", np.asarray(sd[pre + ".weight"]).T)
        if bias and (pre + ".bias") in sd:
            put(key + "/b", sd[pre + ".bias"])

    def put_norm(key, pre):
        put(key + "/g", sd[pre + ".weight"])
        put(key + "/b", sd[pre + ".bias"])

    # --- CNN encoder
    put_conv("backbone/conv1", "backbone.conv1")
    for li, layer in enumerate(("layer1", "layer2", "layer3"), start=1):
        for b in range(2):
            pre = f"backbone.{layer}.{b}."
            dst = f"backbone/layer{li}/{b}"
            put_conv(f"{dst}/conv1", pre + "conv1")
            put_conv(f"{dst}/conv2", pre + "conv2")
            if pre + "downsample.0.weight" in sd:
                put_conv(f"{dst}/down", pre + "downsample.0")
    put_conv("backbone/conv2", "backbone.conv2")

    # --- transformer blocks
    n = 0
    while f"transformer.layers.{n}.self_attn.q_proj.weight" in sd:
        for half, tag in (("self_attn", "self_attn"),
                          ("cross_attn_ffn", "cross_attn_ffn")):
            pre = f"transformer.layers.{n}.{half}."
            dst = f"blocks/{n}/{tag}"
            put_lin(f"{dst}/q", pre + "q_proj")
            put_lin(f"{dst}/k", pre + "k_proj")
            put_lin(f"{dst}/v", pre + "v_proj")
            put_lin(f"{dst}/merge", pre + "merge")
            put_norm(f"{dst}/norm1", pre + "norm1")
            if pre + "mlp.0.weight" in sd:
                put_lin(f"{dst}/mlp0", pre + "mlp.0", bias=False)
                put_lin(f"{dst}/mlp2", pre + "mlp.2", bias=False)
                put_norm(f"{dst}/norm2", pre + "norm2")
        n += 1

    # --- flow propagation + upsampler
    put_lin("prop/q", "feature_flow_attn.q_proj")
    put_lin("prop/k", "feature_flow_attn.k_proj")
    put_conv("upsampler/0", "upsampler.0")
    put_conv("upsampler/1", "upsampler.2")

    return out


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
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    out = convert_state_dict(sd)
    mapped_src = set()
    unconverted = [k for k in sd if not any(
        k.startswith(p) for p in ("backbone.", "transformer.",
                                  "feature_flow_attn.", "upsampler."))]
    print(f"converted {len(out)} arrays from {len(sd)} source tensors; "
          f"unrecognized: {unconverted[:8]}")
    np.savez(a.out, **out)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
