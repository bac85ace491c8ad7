"""Quick-look viewer for raw binary dumps (reference vizu.py equivalent).

Renders a raw array file as an image: ``python tools/quick_view.py
out_reachability.bin --shape 141 161 --dtype uint8`` (or any 2-D slice of
a float dump).
"""

from __future__ import annotations

import argparse

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--shape", type=int, nargs=2, required=True)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default="quick_view.png")
    args = ap.parse_args()

    data = np.fromfile(args.path, dtype=np.dtype(args.dtype))
    n = args.shape[0] * args.shape[1]
    img = data[:n].reshape(args.shape)
    plt.figure(figsize=(8, 6))
    plt.imshow(img.T, origin="lower", cmap="viridis")
    plt.colorbar()
    plt.title(args.path)
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
