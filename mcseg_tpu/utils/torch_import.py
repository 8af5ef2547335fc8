"""Torch checkpoint import shim.

SURVEY.md section 5: reference checkpoints are torch dicts
``{epoch, args, g_state_dict, f1_state_dict, f2_state_dict, ...}``; torch-cpu
is installed so we can read them and seed parity evaluations. This module
converts torch conv/BN tensors into our flax param/batch-stats trees.

Layout conventions converted:
  conv weight   OIHW -> HWIO
  linear weight OI   -> IO
  BN: weight/bias -> scale/bias (params); running_mean/var -> batch_stats

The name mapping is structural: we flatten OUR param tree, sort both sides'
conv/bn tensors in module-definition order, and match by shape signature in
sequence — robust to cosmetic name differences between the torch module and
our flax modules as long as layer ORDER matches (it does: drn.py builds
levels 0..8 in order, as the reference trunk does).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


def _to_np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> List[Tuple[str, Any]]:
    out = []
    for k in sorted(tree.keys()):
        v = tree[k]
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(flatten_tree(v, path))
        else:
            out.append((path, v))
    return out


def set_in_tree(tree: Dict[str, Any], path: str, value) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def import_torch_state_dict(
    torch_sd: Dict[str, Any],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    widen_first: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fill (params, batch_stats) for ONE module (e.g. the G trunk) from a
    torch state_dict, matching tensors in definition order by shape.

    ``widen_first=True`` reproduces the reference model_util's pretrained
    seeding (SURVEY.md section 2 "Model/optim factory" row): when one of OUR
    conv kernels wants ``input_ch != 3`` input channels and the torch side only
    has the 3-channel (RGB/ImageNet) kernel, the RGB slice is copied and the
    extra channels are filled via ``widen_first_conv_params``.

    Returns new (params, batch_stats) trees; raises if any of our tensors
    finds no shape-compatible torch tensor in order.
    """
    import copy

    params = copy.deepcopy(jnp_to_py(params))
    batch_stats = copy.deepcopy(jnp_to_py(batch_stats))

    # torch side, in insertion (module-definition) order
    t_items = [(k, _to_np(v)) for k, v in torch_sd.items()
               if not k.endswith("num_batches_tracked")]

    # our side: group (kernel|scale|bias|mean|var) in definition order.
    # flax dict ordering is not definition order, so we order by name depth +
    # natural sort, which matches layerN/blockM/convK construction order.
    ours: List[Tuple[str, str, np.ndarray]] = []  # (collection, path, value)
    for path, v in _ordered_leaves(params):
        ours.append(("params", path, np.asarray(v)))
    for path, v in _ordered_leaves(batch_stats):
        ours.append(("batch_stats", path, np.asarray(v)))

    # Consume torch tensors greedily in order, matching BOTH the tensor
    # category (by torch name suffix) and the post-transform shape — shape
    # alone would confuse BN weight/bias (identical 1-D shapes).
    used = [False] * len(t_items)

    def take(category_pred, shape, transform):
        for i, (k, v) in enumerate(t_items):
            if used[i] or not category_pred(k, v):
                continue
            tv = transform(v)
            if tv.shape == shape:
                used[i] = True
                return tv
        return None

    new_params, new_stats = params, batch_stats
    for coll, path, cur in ours:
        leaf = path.split("/")[-1]
        if leaf == "kernel" and cur.ndim == 4:
            tv = take(lambda k, v: k.endswith("weight") and v.ndim == 4,
                      cur.shape, torch_conv_to_hwio)
            if tv is None and widen_first and cur.shape[2] != 3:
                # first-conv widening: take the pretrained 3-channel kernel
                # and widen (RGB slice kept, extras = RGB channel mean).
                from mcseg_tpu.models.factory import widen_first_conv_params

                want3 = (cur.shape[0], cur.shape[1], 3, cur.shape[3])
                tv3 = take(lambda k, v: k.endswith("weight") and v.ndim == 4,
                           want3, torch_conv_to_hwio)
                if tv3 is not None:
                    tv = np.asarray(
                        widen_first_conv_params(jnp.asarray(tv3), cur.shape[2])
                    )
            if tv is None:
                # FCN-style fc->conv: seed a conv kernel from a torch Linear
                # whose weight is [O, ci*kh*kw] — how the reference FCN8s
                # convolutionalizes torchvision VGG16's fc6/fc7
                # (fc6.weight.view(4096, 512, 7, 7)) [SURVEY 2 VGG-FCN row].
                kh, kw, ci, co = cur.shape

                def fc_to_conv(v, _sh=(co, ci, kh, kw)):
                    return np.transpose(v.reshape(_sh), (2, 3, 1, 0))

                tv = take(
                    lambda k, v: k.endswith("weight") and v.ndim == 2
                    and v.shape == (co, ci * kh * kw),
                    cur.shape, fc_to_conv)
        elif leaf == "kernel" and cur.ndim == 2:
            tv = take(lambda k, v: k.endswith("weight") and v.ndim == 2,
                      cur.shape, np.transpose)
        elif leaf == "scale":
            tv = take(lambda k, v: k.endswith("weight") and v.ndim == 1,
                      cur.shape, lambda t: t)
        elif leaf == "bias":
            tv = take(lambda k, v: k.endswith("bias"), cur.shape, lambda t: t)
        elif leaf == "mean":
            tv = take(lambda k, v: k.endswith("running_mean"), cur.shape,
                      lambda t: t)
        elif leaf == "var":
            tv = take(lambda k, v: k.endswith("running_var"), cur.shape,
                      lambda t: t)
        else:
            tv = take(lambda k, v: True, cur.shape, lambda t: t)
        if tv is None:
            raise ValueError(f"no torch tensor found for {coll}:{path} {cur.shape}")
        if coll == "params":
            set_in_tree(new_params, path, jnp.asarray(tv))
        else:
            set_in_tree(new_stats, path, jnp.asarray(tv))
    return new_params, new_stats


def _natural_key(path: str):
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", path)]


def _ordered_leaves(tree: Dict[str, Any]) -> List[Tuple[str, Any]]:
    flat = flatten_tree(tree)
    return sorted(flat, key=lambda kv: _natural_key(kv[0]))


def jnp_to_py(tree):
    if isinstance(tree, dict):
        return {k: jnp_to_py(v) for k, v in tree.items()}
    return tree


def load_reference_checkpoint(path: str):
    """Read a torch checkpoint file (reference format) -> dict of state_dicts.
    Requires torch (installed, CPU build)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return blob
