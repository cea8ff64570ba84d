"""Plotting tools: PR curves, FPPI-MR curves, training-curve plots.

Covers the reference's draw_pr_fm.py:11-201 (aggregate recall/precision and
log-log FPPI-MR curves from saved .npy metric dumps, y in [0.1, 1]) and
other_utils/visualize_results.py:13-60 (mAP/loss/lr curves from results.txt).

Usage:
  python tools/plot_curves.py pr   out.png model1.npy model2.npy ...
  python tools/plot_curves.py fm   out.png model1.npy ...
  python tools/plot_curves.py train out.png runs/exp/results.txt ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _load(npy_path: str) -> dict:
    return np.load(npy_path, allow_pickle=True).item()


def draw_pr(out_path: str, npy_paths: list):
    fig, ax = plt.subplots(figsize=(7, 6))
    for p in npy_paths:
        d = _load(p)
        name = os.path.splitext(os.path.basename(p))[0]
        ax.plot(d["recall"], d["precision"],
                label=f"{name} (AP={d['ap'] * 100:.2f}%)")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.grid(alpha=0.3)
    ax.legend(loc="lower left")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    print(f"wrote {out_path}")


def draw_fppi_mr(out_path: str, npy_paths: list):
    fig, ax = plt.subplots(figsize=(7, 6))
    for p in npy_paths:
        d = _load(p)
        name = os.path.splitext(os.path.basename(p))[0]
        ax.plot(d["fppi"], d["mr"],
                label=f"{name} (LAMR={d['lamr'] * 100:.2f}%)")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlim(1e-3, 1e1)
    ax.set_ylim(0.1, 1.0)
    ax.set_xlabel("False Positives Per Image (FPPI)")
    ax.set_ylabel("Miss Rate")
    ax.grid(which="both", alpha=0.3)
    ax.legend(loc="lower left")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    print(f"wrote {out_path}")


def parse_results_txt(path: str):
    """'epoch:N <12 coco stats> <loss> <lr>' lines -> dict of arrays."""
    epochs, m95, m50, loss, lr = [], [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or not parts[0].startswith("epoch:"):
                continue
            epochs.append(int(parts[0].split(":")[1]))
            vals = [float(x) for x in parts[1:]]
            m95.append(vals[0])
            m50.append(vals[1])
            loss.append(vals[-2])
            lr.append(vals[-1])
    return {"epoch": np.asarray(epochs), "map95": np.asarray(m95),
            "map50": np.asarray(m50), "loss": np.asarray(loss),
            "lr": np.asarray(lr)}


def draw_training(out_path: str, results_paths: list):
    fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))
    for p in results_paths:
        d = parse_results_txt(p)
        name = os.path.basename(os.path.dirname(p)) or p
        axes[0].plot(d["epoch"], d["map50"], label=name)
        axes[1].plot(d["epoch"], d["loss"], label=name)
        axes[2].plot(d["epoch"], d["lr"], label=name)
    for ax, title in zip(axes, ("mAP@0.5", "train loss", "learning rate")):
        ax.set_xlabel("epoch")
        ax.set_title(title)
        ax.grid(alpha=0.3)
        ax.legend()
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    print(f"wrote {out_path}")


def draw_activations(out_path: str):
    """2x2 activation-function panel (reference docs/draw_activation.py:1-40:
    sigmoid / tanh / leaky-ReLU(0.1) / mish over z in [-10, 10]), computed
    through the framework's own op library so the plot documents the exact
    functions the models run (incl. the select-free leaky/mish forms)."""
    import jax

    # plotting needs no accelerator; keep the (possibly shared/tunneled)
    # TPU out of it. No-op if a backend is already up (e.g. under pytest).
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import jax.numpy as jnp

    from double_yolo_kaist_tpu.models import layers as L

    z = np.arange(-10, 10, 0.01, dtype=np.float32)
    zj = jnp.asarray(z)
    panels = [
        ("(a) Sigmoid", 1.0 / (1.0 + np.exp(-z))),
        ("(b) Tanh", np.tanh(z)),
        ("(c) Leaky ReLU", np.asarray(L.activate("leaky", zj))),
        ("(d) Mish", np.asarray(L.activate("mish", zj))),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, (title, g) in zip(axes.flat, panels):
        ax.spines["right"].set_visible(False)
        ax.spines["top"].set_visible(False)
        ax.set_title(title, y=-0.25)
        ax.set_xticks(np.linspace(-10, 10, 5))
        ax.set_xlabel("z")
        ax.set_ylabel("g(z)")
        ax.plot(z, g)
    fig.subplots_adjust(left=0.1, right=0.9, bottom=0.1, top=0.98,
                        wspace=0.3, hspace=0.3)
    fig.savefig(out_path, bbox_inches="tight", dpi=100)
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["pr", "fm", "train", "activations"])
    ap.add_argument("out")
    ap.add_argument("inputs", nargs="*")
    args = ap.parse_args()
    if args.kind == "pr":
        draw_pr(args.out, args.inputs)
    elif args.kind == "fm":
        draw_fppi_mr(args.out, args.inputs)
    elif args.kind == "activations":
        draw_activations(args.out)
    else:
        draw_training(args.out, args.inputs)


if __name__ == "__main__":
    main()
