"""Torch-checkpoint -> Flax parameter conversion (numpy-level, torch-free).

The reference's trained models are Lightning state_dicts over mltools' torch
CUNet/LightVDM (reference src/utils.py:434-471, configs.yaml:1-217 lists the
12 blessed checkpoints). This module maps such a state_dict — given as a flat
``{key: np.ndarray}`` — onto our Flax parameter tree so the reference's
weights can run on TPU:

  * conv weights   (O, I, *k)  ->  (*k, I, O)
  * linear weights (out, in)   ->  kernel = W.T (reshaped to the template's
    DenseGeneral shape, which also covers the attention qkv/proj projections)
  * GroupNorm weight/bias      ->  scale/bias
  * learned-linear gamma schedule params -> {"gamma": {"b", "w"}}

Key-name differences between a real mltools checkpoint and our module names
are handled by a rename table (regex), not code changes — see
tools/convert_torch_ckpt.py. Validation: tests/test_torch_parity.py round-
trips a randomly initialized torch twin (tools/torch_cunet.py) and asserts
eps_hat and ELBO-term agreement on shared inputs at 1e-4.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Optional, Tuple

import jax
import numpy as np

# our-module-name -> torch-attribute-name differences in the torch twin
_DEFAULT_RENAMES = {"mid_attn": "mid_attn_blk"}


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _unflatten(items: Iterable[Tuple[Tuple[str, ...], np.ndarray]]):
    out: Dict = {}
    for path, leaf in items:
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return out


def torch_state_dict_to_flax(
    sd: Dict[str, np.ndarray],
    unet_template,
    renames: Optional[Dict[str, str]] = None,
    strict: bool = True,
):
    """Map a flat torch state_dict (numpy values) onto the template's
    structure. ``unet_template`` is the ``params['unet']`` subtree from
    ``VDM.init_params`` (shapes/dtypes define every transform). Returns the
    converted tree; raises KeyError listing missing keys when ``strict``."""
    renames = {**_DEFAULT_RENAMES, **(renames or {})}
    used = set()
    missing = []
    converted = []

    for path, tmpl in _flatten(unet_template):
        mod = ".".join(renames.get(p, p) for p in path[:-1])
        leaf = path[-1]
        torch_leaf = "weight" if leaf in ("kernel", "scale") else leaf
        key = f"{mod}.{torch_leaf}" if mod else torch_leaf
        if key not in sd:
            missing.append(key)
            continue
        w = np.asarray(sd[key])
        used.add(key)
        if leaf == "kernel":
            if w.ndim in (4, 5):  # conv (O, I, *k) -> (*k, I, O)
                arr = w.transpose(*range(2, w.ndim), 1, 0)
            else:  # linear (out, in) -> (in, out) [-> DenseGeneral shape]
                arr = w.T.reshape(tmpl.shape)
        elif leaf == "scale":
            arr = w
        else:  # bias (qkv biases reshape to the DenseGeneral out shape)
            arr = w.reshape(tmpl.shape)
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"{key}: converted shape {arr.shape} != template {tmpl.shape}")
        converted.append((path, arr.astype(np.dtype(tmpl.dtype))))

    if missing and strict:
        raise KeyError(
            f"{len(missing)} parameters missing from the state_dict, e.g. "
            f"{missing[:8]}")
    unused = sorted(set(sd) - used)
    return _unflatten(converted), missing, unused


def extract_gamma(sd: Dict[str, np.ndarray], gamma_template):
    """Pull learned-linear schedule params if the checkpoint carries them
    under gamma.{b,w}; otherwise return the template's init values."""
    out = {}
    found = False
    for name, tmpl in gamma_template.items():
        for key in (f"gamma.{name}", f"model.gamma.{name}"):
            if key in sd:
                out[name] = np.asarray(sd[key]).astype(np.dtype(tmpl.dtype))
                found = True
                break
        else:
            out[name] = np.asarray(tmpl)
    return out, found


def strip_and_rename(sd: Dict[str, np.ndarray],
                     strip_prefix: Optional[str] = None,
                     regex_renames: Iterable[Tuple[str, str]] = ()):
    """Pre-process raw checkpoint keys: strip a Lightning prefix (auto-detects
    the '...score_model.' prefix if none given) and apply regex renames."""
    if strip_prefix is None:
        for key in sd:
            i = key.find("score_model.")
            if i >= 0:
                strip_prefix = key[: i + len("score_model.")]
                break
    out = {}
    for k, v in sd.items():
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        for pat, rep in regex_renames:
            k = re.sub(pat, rep, k)
        out[k] = v
    return out


def params_from_torch(sd, vdm, renames=None, strict=True):
    """Full params tree {'unet', 'gamma'} for a VDM from a torch state_dict."""
    template = jax.eval_shape(lambda: vdm.init_params(jax.random.PRNGKey(0)))
    template = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    gamma_tmpl = vdm.schedule.init_params()
    unet, missing, unused = torch_state_dict_to_flax(
        sd, template["unet"], renames=renames, strict=strict)
    gamma, found = extract_gamma(sd, gamma_tmpl)
    return {"unet": unet, "gamma": gamma}, {
        "missing": missing, "unused": unused, "gamma_found": found}
