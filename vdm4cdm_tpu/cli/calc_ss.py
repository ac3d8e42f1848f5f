"""Summary-statistics evaluator CLI — parity with reference calc_SS.py.

For each generation campaign found under DATA_DIR ({CV_1_128, CV_12_12,
1P_24, 1P_128}), computes per-sample (reference calc_SS.py:77-99):

    3D: mean, std, P(k), log-PDF (100 bins in log10(x+1))
    2D half/quarter-depth projections: mean, std, P(k), log-PDF, and the
    order-2 reduced wavelet scattering transform (N=128, NR=4, NT=4)

plus the same stats on the ground-truth boxes and, for CV_1_128, the
posterior mean/std over the 128 reps (calc_SS.py:150-158). Results pickle to
``summary.pkl`` (the reference writes torch's ``summary.pth``; same content,
dependency-free container).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

ONE_P_INDICES = [0, 4, 7, 23, 28]
ONE_P_NAMES = ["fid", "Om_m2", "Om_p2", "ASN1_m3", "ASN1_p3"]


def main(argv=None):
    ap = argparse.ArgumentParser(description="Compute summary statistics of generation campaigns")
    ap.add_argument("model_name", type=str)
    ap.add_argument("--data-dir", type=str, required=True,
                    help="directory holding campaign subdirs (gen_*.npy stacks)")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--set", dest="overrides", nargs="*", metavar="SEC.KEY=VAL",
                    help="config overrides — must match the campaign's")
    args = ap.parse_args(argv)

    from ._common import setup_jax

    jax = setup_jax(platform=args.platform)
    import jax.numpy as jnp

    from ..config import build_datamodule
    from ..evals import lwt, pdfs, spectra
    from ..presets import preset as get_preset
    from ..utils.array import to_np

    cfg = get_preset(args.model_name)
    from .train import parse_overrides

    for k, v in parse_overrides(args.overrides).items():
        section, _, field = k.partition(".")
        setattr(getattr(cfg, section), field, v)
    resol = cfg.data.cropsize
    half, quarter = resol // 2, resol // 4

    wavelet_mms, wavelet_vals = lwt.make_wavelets(N=128, NR=4, NT=4, sqrt=True)

    def get_log_rwst(fields2d):
        wst = to_np(lwt.WST_abs2(jnp.asarray(fields2d[:, 0]), wavelet_mms, wavelet_vals, m=2))
        rwst = lwt.get_rwst(wst, NR=4, NT=4)[:, 2:]
        return np.log(rwst + 1)

    def get_pk(fields):
        f = jnp.asarray(fields)
        axes = tuple(range(2, f.ndim))
        f = f / f.sum(axis=axes, keepdims=True)
        return to_np(spectra.pk(f)[1])

    def get_stats(fields):
        """fields: (B, 1, R, R, R) unnormalized. Reference calc_SS.py:77-99."""
        f = np.asarray(fields)
        stats = {
            "3d_mean": float(f.mean()),
            "3d_std": float(f.std()),
            "3d_pk": get_pk(f),
            "3d_logpdf": to_np(pdfs.log_pdf(jnp.asarray(f), pdfs.BINS_3D)),
        }
        for name, depth in [("half", half), ("quarter", quarter)]:
            f2d = f[:, :, :depth].sum(axis=2)
            stats[f"2d_{name}_mean"] = float(f2d.mean())
            stats[f"2d_{name}_std"] = float(f2d.std())
            stats[f"2d_{name}_pk"] = get_pk(f2d)
            stats[f"2d_{name}_logpdf"] = to_np(pdfs.log_pdf(jnp.asarray(f2d), pdfs.BINS_2D))
            if f2d.shape[-1] == 128:
                stats[f"2d_{name}_rwst"] = get_log_rwst(f2d)
        return stats

    def unnorm_nchw(dm, arr, i_channel):
        return np.asarray(dm.unnorm_func(np.asarray(arr), i_channel))

    summary = {}
    for key in ["CV_1_128", "CV_12_12", "1P_24", "1P_128"]:
        fol = os.path.join(args.data_dir, key)
        if not os.path.exists(fol):
            continue
        print(f"[calc_ss] processing {fol}", flush=True)
        cfg.data.set_name = key.split("_")[0]
        cfg.data.batch_size = 1
        dm = build_datamodule(cfg, stage="test")
        ss, images = {}, {}

        def gt_pass(batch_filter, name_fn):
            count = 0
            for i_batch, batch in enumerate(dm.test_dataloader()):
                if not batch_filter(i_batch):
                    continue
                # channels-last (1, *sp, C) -> channels-first (1, C, *sp)
                x = np.moveaxis(np.asarray(batch["x"]), -1, 1)
                c = np.moveaxis(np.asarray(batch["conditioning"]), -1, 1)
                xu = unnorm_nchw(dm, x, 1)
                cu = unnorm_nchw(dm, c, 0)
                name = name_fn(count, i_batch)
                ss[f"Mcdm_GT_{name}"] = get_stats(xu)
                images[f"half_Mcdm_GT_{name}"] = xu[:, :, :half].sum(2)
                images[f"quarter_Mcdm_GT_{name}"] = xu[:, :, :quarter].sum(2)
                images[f"half_cond_GT_{name}"] = cu[:, :, :half].sum(2)
                images[f"quarter_cond_GT_{name}"] = cu[:, :, :quarter].sum(2)
                count += 1
            return count

        if key == "CV_1_128":
            gt_pass(lambda i: i == 2, lambda c, i: str(c))
            data = np.load(os.path.join(fol, "gen_0.npy"))
            for i in range(len(data)):
                xu = unnorm_nchw(dm, data[[i]], 1)
                ss[f"Mcdm_0_{i}"] = get_stats(xu)
                images[f"half_Mcdm_0_{i}"] = xu[:, :, :half].sum(2)
                images[f"quarter_Mcdm_0_{i}"] = xu[:, :, :quarter].sum(2)
            all_u = unnorm_nchw(dm, data, 1)
            summary[key] = {
                "stats": ss, "images": images,
                "post_means": all_u.mean(0, keepdims=True),
                "post_stds": all_u.std(0, keepdims=True),
            }
        elif key == "CV_12_12":
            gt_pass(lambda i: i < 12, lambda c, i: str(c))
            for i in range(12):
                data = np.load(os.path.join(fol, f"gen_{i}.npy"))
                for j in range(len(data)):
                    xu = unnorm_nchw(dm, data[[j]], 1)
                    ss[f"Mcdm_{i}_{j}"] = get_stats(xu)
                    images[f"half_Mcdm_{i}_{j}"] = xu[:, :, :half].sum(2)
                    images[f"quarter_Mcdm_{i}_{j}"] = xu[:, :, :quarter].sum(2)
            summary[key] = {"stats": ss, "images": images}
        else:  # 1P campaigns
            rep = 24 if key == "1P_24" else 128
            gt_pass(lambda i: i in ONE_P_INDICES,
                    lambda c, i: ONE_P_NAMES[ONE_P_INDICES.index(i)])
            for name in ONE_P_NAMES:
                path = os.path.join(fol, f"{name}_{rep}.npy")
                if not os.path.exists(path):
                    path = os.path.join(fol, f"{name}.npy")
                data = np.load(path)
                for j in range(len(data)):
                    xu = unnorm_nchw(dm, data[[j]], 1)
                    ss[f"Mcdm_{name}_{j}"] = get_stats(xu)
                    images[f"half_Mcdm_{name}_{j}"] = xu[:, :, :half].sum(2)
                    images[f"quarter_Mcdm_{name}_{j}"] = xu[:, :, :quarter].sum(2)
            summary[key] = {"stats": ss, "images": images}

    out = os.path.join(args.data_dir, "summary.pkl")
    with open(out, "wb") as f:
        pickle.dump(summary, f)
    print(f"[calc_ss] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
