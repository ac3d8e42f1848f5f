"""Data-product sanity check — the scripted equivalent of the reference's
scripts/check_cc.ipynb: cross-correlate two field stacks (e.g. a downsampled
product against its source, or Mstar against Mcdm) and report r(k).

    python examples/check_cc.py A=path_a.npy B=path_b.npy [--n 4] [--platform cpu]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fields", nargs=2, metavar="NAME=PATH.npy")
    ap.add_argument("--n", type=int, default=4, help="number of sims to check")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    from vdm4cdm_tpu.cli._common import setup_jax

    setup_jax(platform=args.platform)
    import jax.numpy as jnp

    from vdm4cdm_tpu.evals import get_ccs
    from vdm4cdm_tpu.utils import to_np

    (name_a, path_a), (name_b, path_b) = (s.split("=", 1) for s in args.fields)
    a = np.load(path_a, mmap_mode="r")[: args.n]
    b = np.load(path_b, mmap_mode="r")[: args.n]
    assert a.shape == b.shape, f"{a.shape} != {b.shape}"
    if a.ndim == len(a.shape[1:]) + 1:  # add channel dim -> (N, 1, *spatial)
        a = np.asarray(a)[:, None]
        b = np.asarray(b)[:, None]

    # normalize each field to unit total (the reference's pk convention for
    # mass-weighted fields)
    axes = tuple(range(2, a.ndim))
    a = a / a.sum(axis=axes, keepdims=True)
    b = b / b.sum(axis=axes, keepdims=True)

    ks, ccs = get_ccs(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    ks, ccs = to_np(ks[0]), to_np(ccs)
    print(f"cross-correlation r(k) of {name_a} x {name_b} over {len(a)} sims:")
    for i in range(len(ccs)):
        print(f"  sim {i}: " + " ".join(f"{v:+.3f}" for v in ccs[i]))
    print("mean r(k):", " ".join(f"{v:+.3f}" for v in ccs.mean(0)))


if __name__ == "__main__":
    main()
