"""Visual CLAHE-vs-original comparison (reference imgs/compare_hist_clahe.py
equivalent): renders an image pair before/after our device CLAHE with their
channel histograms.

Usage: python tools/compare_clahe.py <visible.jpg> [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.data.clahe import clahe_batch  # noqa: E402


def main(path: str, out: str = "clahe_compare.png"):
    import cv2

    img = cv2.imread(path)[:, :, ::-1]
    h, w = img.shape[:2]
    img = img[:h - h % 4, :w - w % 4]  # tile-divisible
    eq = np.asarray(clahe_batch(jnp.asarray(img[None])))[0]

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    axes[0, 0].imshow(img)
    axes[0, 0].set_title("original")
    axes[0, 1].imshow(eq)
    axes[0, 1].set_title("CLAHE (clip 1.0, 4x4 tiles)")
    for ax, im in zip(axes[1], (img, eq)):
        for c, color in enumerate("rgb"):
            ax.hist(im[..., c].ravel(), bins=64, histtype="step", color=color)
        ax.set_xlim(0, 255)
    for ax in axes[0]:
        ax.axis("off")
    fig.savefig(out, bbox_inches="tight", dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "clahe_compare.png")
