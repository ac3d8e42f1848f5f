"""Dataset production CLI — scripted replacements for the reference's
data-prep notebooks (SURVEY.md §3.5):

  downsample — trilinear-downsample 256^3 grid stacks to {128,160,192,224}^3
               (reference scripts/make_down_grids.ipynb: F.interpolate
               trilinear); here: jitted jax.image.resize, batched.
  project    — 3D -> 2D slabs with linear-taper depth weights (reference
               scripts/make_2d_from3d.ipynb).
  normalize  — per-field log-space mean/std over a set -> normalizations JSON
               (reference scripts/calc_normalization.ipynb).

All deterministic, streaming (one sim at a time; no full-stack RAM blowup).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _resize_trilinear(vol: np.ndarray, out_size: int):
    import jax
    import jax.numpy as jnp

    f = jax.jit(
        lambda v: jax.image.resize(v, (out_size,) * 3, method="trilinear"),
    )
    return np.asarray(f(jnp.asarray(vol)))


def cmd_downsample(args):
    data = np.load(args.input, mmap_mode="r")
    n = len(data)
    out = None
    for i in range(n):
        ds = _resize_trilinear(np.asarray(data[i], np.float32), args.size)
        if out is None:
            out = np.lib.format.open_memmap(
                args.output, mode="w+", dtype=np.float32, shape=(n, *ds.shape)
            )
        if args.conserve_mass:
            # mass-weighted fields: preserve the total, not the mean
            ds = ds * (np.asarray(data[i]).sum() / max(ds.sum(), 1e-30))
        out[i] = ds
        print(f"[downsample] {i + 1}/{n}", flush=True)
    out.flush()
    print(f"[downsample] wrote {args.output} shape {out.shape}")


def cmd_project(args):
    """3D (N, R, R, R) -> 2D maps (N*nslabs, R, R): sum over a depth slab with
    linear taper weights at both slab edges."""
    data = np.load(args.input, mmap_mode="r")
    n = len(data)
    size = data.shape[-1]
    depth = args.depth
    nslabs = size // depth
    taper = np.ones(depth, np.float32)
    if args.taper > 0:
        ramp = np.linspace(0, 1, args.taper + 1, dtype=np.float32)[1:]
        taper[: args.taper] = ramp
        taper[-args.taper :] = ramp[::-1]
    maps = []
    for i in range(n):
        vol = np.asarray(data[i], np.float32)
        for s in range(nslabs):
            slab = vol[s * depth : (s + 1) * depth]
            maps.append((slab * taper[:, None, None]).sum(0))
        print(f"[project] {i + 1}/{n}", flush=True)
    out = np.stack(maps)
    np.save(args.output, out)
    print(f"[project] wrote {args.output} shape {out.shape}")


def cmd_normalize(args):
    """Compute per-field log10(x + alpha) mean/std -> normalizations JSON."""
    result = {}
    alphas = json.load(open(args.alphas)) if args.alphas else {}
    for spec in args.fields:
        name, path = spec.split("=", 1)
        alpha = float(alphas.get(name, 1.0))
        data = np.load(path, mmap_mode="r")
        s1, s2, count = 0.0, 0.0, 0
        for i in range(len(data)):
            logx = np.log10(np.asarray(data[i], np.float64) + alpha)
            s1 += logx.sum()
            s2 += (logx**2).sum()
            count += logx.size
        mean = s1 / count
        std = float(np.sqrt(s2 / count - mean**2))
        result[f"{name}_m"] = float(mean)
        result[f"{name}_s"] = std
        print(f"[normalize] {name}: mean={mean:.4f} std={std:.4f}", flush=True)
    if os.path.exists(args.output) and args.merge:
        existing = json.load(open(args.output))
        existing.update(result)
        result = existing
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[normalize] wrote {args.output}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="Dataset production tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("downsample", help="trilinear-downsample a 3D grid stack")
    d.add_argument("input"), d.add_argument("output")
    d.add_argument("--size", type=int, required=True)
    d.add_argument("--conserve-mass", action="store_true")
    d.set_defaults(fn=cmd_downsample)

    p = sub.add_parser("project", help="project 3D grids to tapered 2D slabs")
    p.add_argument("input"), p.add_argument("output")
    p.add_argument("--depth", type=int, required=True)
    p.add_argument("--taper", type=int, default=4)
    p.set_defaults(fn=cmd_project)

    n = sub.add_parser("normalize", help="compute log-space normalizations")
    n.add_argument("fields", nargs="+", metavar="NAME=PATH.npy")
    n.add_argument("--output", required=True)
    n.add_argument("--alphas", default=None, help="alphas JSON for log offsets")
    n.add_argument("--merge", action="store_true")
    n.set_defaults(fn=cmd_normalize)

    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
