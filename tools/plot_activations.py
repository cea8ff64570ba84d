"""Plot the activation-function zoo (reference docs/draw_activation.py
equivalent) using the framework's own jnp implementations."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from double_yolo_kaist_tpu.models.layers import ACTIVATIONS  # noqa: E402


def main(out_path: str = "activations.png"):
    x = jnp.linspace(-6, 6, 400)
    fig, ax = plt.subplots(figsize=(8, 6))
    for name, fn in ACTIVATIONS.items():
        if name == "linear":
            continue
        ax.plot(np.asarray(x), np.asarray(fn(x)), label=name)
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title("activation functions")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "activations.png")
