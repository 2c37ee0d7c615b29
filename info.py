"""Diagnostics: channel-probability statistics of cached decoding matrices.

Capability parity with the reference's info script (reference info.py:1-42):
for each cached (code, p) decoding-matrix set, print channel-probability
min/max/mean and save histograms.
"""
from __future__ import annotations

import argparse
import glob
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cache-dir", default="matrix_cache")
    ap.add_argument("--out-dir", default="info_vis")
    ap.add_argument("--gallery", action="store_true",
                    help="regenerate the 12-diagram explainer gallery "
                         "(reference info_vis/01..12) from live framework "
                         "objects; see qldpc_tpu/utils/gallery.py")
    ap.add_argument("--gallery-code", default="[[72, 12, 6]]")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    if args.gallery:
        from qldpc_tpu.utils.gallery import generate_gallery
        generate_gallery(args.out_dir, code_name=args.gallery_code,
                         validation_json="validation_results.json")
        return
    files = sorted(glob.glob(os.path.join(args.cache_dir, "matrices_*.npz")))
    if not files:
        print(f"no cached matrices in {args.cache_dir}")
        return
    for path in files:
        key = os.path.basename(path)[len("matrices_"):-len(".npz")]
        d = np.load(path)
        for basis in ("Z", "X"):
            probs = d[f"channel_probs{basis}"]
            H = d[f"Hdec{basis}"]
            print(f"{key} {basis}: H {H.shape}, probs "
                  f"min={probs.min():.3e} max={probs.max():.3e} "
                  f"mean={probs.mean():.3e}")
            plt.figure(figsize=(6, 4))
            plt.hist(probs, bins=60)
            plt.yscale("log")
            plt.xlabel("channel probability")
            plt.ylabel("fault classes")
            plt.title(f"{key} ({basis}) channel probabilities")
            plt.tight_layout()
            plt.savefig(os.path.join(args.out_dir,
                                     f"{key}_{basis}_probs.png"), dpi=120)
            plt.close()
    print(f"histograms saved to {args.out_dir}")


if __name__ == "__main__":
    main()
