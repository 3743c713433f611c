#!/usr/bin/env python
"""Convert a torch/timm DINOv2 ViT state dict to the flax VisionTransformer.

The reference featurizes patches with timm's pretrained
``vit_base_patch14_dinov2.lvd142m`` (reference
``dgdm_histopath/preprocessing/tissue_graph_builder.py:87-99``). This
environment has no network egress, so conversion is file-based: feed it a
torch ``state_dict`` file (``torch.save`` .pth/.pt/.bin, loaded with
``weights_only=True`` — no pickle code execution) or an .npz of the same
tensors, get a name-keyed npz bundle loadable by
``PatchFeatureExtractor.load_npz_weights``.

Layout mapping (timm ``VisionTransformer`` -> ``models/vit.py``):

  cls_token                       -> cls_token                  [1, 1, D]
  pos_embed                       -> pos_embed (grid bicubic-resized when the
                                     target image size differs)
  patch_embed.proj.weight [D,3,P,P] -> patch_embed/kernel [P,P,3,D]
  patch_embed.proj.bias           -> patch_embed/bias
  blocks.i.norm1.{weight,bias}    -> block{i}/norm1/{scale,bias}
  blocks.i.attn.qkv.weight [3D,D] -> block{i}/attn/{query,key,value}/kernel
                                     [D, H, D/H]   (torch W stored [out,in];
                                     flax kernel is its transpose)
  blocks.i.attn.qkv.bias [3D]     -> .../{query,key,value}/bias [H, D/H]
  blocks.i.attn.proj.weight [D,D] -> block{i}/attn/out/kernel [H, D/H, D]
  blocks.i.attn.proj.bias         -> block{i}/attn/out/bias [D]
  blocks.i.ls{1,2}.gamma          -> block{i}/ls{1,2}_gamma (LayerScale)
  blocks.i.mlp.fc{1,2}.{weight,bias} -> block{i}/mlp{1,2}/{kernel,bias}
  norm.{weight,bias}              -> norm/{scale,bias}

Usage:
  python scripts/convert_timm_vit.py dinov2_b14.pth out.npz \
      --arch dinov2_b14 --image-size 224
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load tensors from a torch checkpoint file or npz, as numpy arrays."""
    path = Path(path)
    if path.suffix == ".npz":
        data = np.load(path, allow_pickle=False)
        return {k: data[k] for k in data.files}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.").removeprefix("backbone.")
        out[k] = v.detach().cpu().numpy()
    return out


def interpolate_pos_embed(pos: np.ndarray, target_tokens: int) -> np.ndarray:
    """Bicubic-resize the grid part of a [1, 1+G*G, D] pos embed to a new
    square grid (timm does the same when changing input resolution)."""
    if pos.shape[1] == target_tokens:
        return pos
    import jax
    import jax.numpy as jnp
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    g_old = int(round(np.sqrt(grid_pos.shape[1])))
    g_new = int(round(np.sqrt(target_tokens - 1)))
    if g_old * g_old != grid_pos.shape[1] or g_new * g_new != target_tokens - 1:
        raise ValueError(f"non-square pos grids: {grid_pos.shape[1]} -> "
                         f"{target_tokens - 1}")
    d = grid_pos.shape[-1]
    grid = jnp.asarray(grid_pos, jnp.float32).reshape(1, g_old, g_old, d)
    resized = jax.image.resize(grid, (1, g_new, g_new, d), method="bicubic")
    resized = np.asarray(resized).reshape(1, g_new * g_new, d)
    return np.concatenate([cls_pos, resized], axis=1)


def convert_state_dict(sd: Dict[str, np.ndarray], depth: int, num_heads: int,
                       target_tokens: int | None = None) -> Dict:
    """timm torch layout -> flax ``VisionTransformer`` params tree."""
    d = int(sd["cls_token"].shape[-1])
    dh = d // num_heads
    f32 = lambda a: np.asarray(a, np.float32)

    pos = f32(sd["pos_embed"])
    if target_tokens is not None:
        pos = interpolate_pos_embed(pos, target_tokens)

    params: Dict = {
        "cls_token": f32(sd["cls_token"]),
        "pos_embed": pos,
        "patch_embed": {
            # torch conv [D, 3, P, P] -> flax [P, P, 3, D]
            "kernel": f32(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": f32(sd["patch_embed.proj.bias"]),
        },
        "norm": {"scale": f32(sd["norm.weight"]), "bias": f32(sd["norm.bias"])},
    }
    for i in range(depth):
        p = f"blocks.{i}."
        qkv_w = f32(sd[p + "attn.qkv.weight"])      # [3D, D]
        qkv_b = f32(sd[p + "attn.qkv.bias"])        # [3D]
        wq, wk, wv = np.split(qkv_w, 3, axis=0)     # each [D, D] (out, in)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        # torch: y = x @ W.T  -> flax kernel = W.T with heads folded out
        mk = lambda w: w.T.reshape(d, num_heads, dh)
        mb = lambda b: b.reshape(num_heads, dh)
        block = {
            "norm1": {"scale": f32(sd[p + "norm1.weight"]),
                      "bias": f32(sd[p + "norm1.bias"])},
            "attn": {
                "query": {"kernel": mk(wq), "bias": mb(bq)},
                "key": {"kernel": mk(wk), "bias": mb(bk)},
                "value": {"kernel": mk(wv), "bias": mb(bv)},
                "out": {
                    "kernel": f32(sd[p + "attn.proj.weight"]).T.reshape(
                        num_heads, dh, d),
                    "bias": f32(sd[p + "attn.proj.bias"]),
                },
            },
            "norm2": {"scale": f32(sd[p + "norm2.weight"]),
                      "bias": f32(sd[p + "norm2.bias"])},
            "mlp1": {"kernel": f32(sd[p + "mlp.fc1.weight"]).T,
                     "bias": f32(sd[p + "mlp.fc1.bias"])},
            "mlp2": {"kernel": f32(sd[p + "mlp.fc2.weight"]).T,
                     "bias": f32(sd[p + "mlp.fc2.bias"])},
        }
        if p + "ls1.gamma" in sd:
            block["ls1_gamma"] = f32(sd[p + "ls1.gamma"])
            block["ls2_gamma"] = f32(sd[p + "ls2.gamma"])
        params[f"block{i}"] = block
    return {"params": params}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help="torch state-dict file (.pth/.pt/.bin) or .npz")
    ap.add_argument("output", help="output npz bundle path")
    ap.add_argument("--arch", default="dinov2_b14",
                    help="target arch key in models/vit.py _ARCHS")
    ap.add_argument("--image-size", type=int, default=224,
                    help="inference resolution; pos embed is grid-resized")
    args = ap.parse_args(argv)

    from dgdm_histopath_tpu.models.vit import _ARCHS, VisionTransformer
    from dgdm_histopath_tpu.training.checkpoint import save_model_bundle

    kwargs, feat_dim = _ARCHS[args.arch]
    sd = load_torch_state_dict(args.input)
    grid = args.image_size // kwargs["patch_size"]
    params = convert_state_dict(sd, depth=kwargs["depth"],
                                num_heads=kwargs["num_heads"],
                                target_tokens=grid * grid + 1)

    # structural check against a freshly-initialized template: same paths,
    # same shapes — load_model_bundle re-verifies on every later load
    import jax
    import jax.numpy as jnp
    module = VisionTransformer(**kwargs)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    template = module.init(jax.random.PRNGKey(0), dummy)
    t_paths = {"/".join(str(getattr(k, "key", k)) for k in kp): np.shape(v)
               for kp, v in jax.tree_util.tree_flatten_with_path(template)[0]}
    c_paths = {"/".join(str(getattr(k, "key", k)) for k in kp): np.shape(v)
               for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    if t_paths != c_paths:
        missing = sorted(set(t_paths) - set(c_paths))[:6]
        extra = sorted(set(c_paths) - set(t_paths))[:6]
        mismatch = sorted(k for k in set(t_paths) & set(c_paths)
                          if t_paths[k] != c_paths[k])[:6]
        print(f"conversion structure mismatch:\n missing={missing}\n "
              f"extra={extra}\n shape-mismatch={mismatch}", file=sys.stderr)
        return 1

    save_model_bundle(args.output, params,
                      {"arch": args.arch, "image_size": args.image_size,
                       **kwargs},
                      extra={"source": str(args.input),
                             "feature_dim": feat_dim})
    print(f"converted {len(sd)} tensors -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
