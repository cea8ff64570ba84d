"""AOT-exported serving artifacts: the whole request program as one file.

The reference's deployment story ends at a ``.pt`` checkpoint that needs the
full framework (cfg parser, model builder, weight loader) on every inference
host. This module completes the TPU build's artifact chain
(tools/calibrate.py calibration stats -> quantized variables -> HERE the
compiled program itself): `export_serving_artifact` serializes the
Predictor's fused request program (uint8 letterbox + BN-folded forward
[bf16 or int8 PTQ] + fixed-shape NMS + packed valid mask — serving.py's
`_full_program`) via ``jax.export`` into a single ``.dykx`` zip:

    program.bin     serialized StableHLO (jax.export.Exported), lowered for
                    one or more platforms (tpu + cpu by default)
    variables.npz   the folded/quantized parameter tree (bf16 stored as
                    uint16 bit patterns, int8 native)
    meta.json       shapes, letterbox undo constants, thresholds, versions

`ExportedPredictor` loads that file and serves it with the same
``__call__`` contract as ``serving.Predictor`` — but the inference host
needs ONLY this module + jax/numpy: no cfg files, no graph IR, no weight
importers, no quantization code. Deployment becomes "ship one file".

Notes on scope: artifacts are single-replica (scale out by running one
process per chip or loading under a mesh-less jit); the exported program is
pure XLA (the Pallas NMS/decode kernels are opt-in and OFF by default), so
multi-platform lowering works and the same file runs on TPU and CPU.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1
_META = "meta.json"
_PROGRAM = "program.bin"
_VARIABLES = "variables.npz"


# ----------------------------------------------------------- tree <-> npz
# Self-contained (mirrors models/quantize.save_quantized's encoding) so that
# ExportedPredictor hosts don't import the model/quantize stack at all.

def _flatten(tree, prefix=""):
    """Flatten nested string-keyed dicts to {'a/b/c': array}. Empty subtrees
    are recorded under ``empties`` so the reconstruction is structure-exact
    (the exported program's in_tree must match, e.g. the folded variables'
    empty 'state' dict)."""
    out, empties = {}, []
    if isinstance(tree, dict):
        if not tree:
            empties.append("{}" + prefix[:-1])
        for k, v in tree.items():
            if "/" in k:
                # fail loudly at export time (matching the list/tuple check
                # below): '/' is the join separator, so a key containing it
                # would reconstruct into the wrong nesting and surface only
                # as an opaque pytree mismatch at serve time
                raise TypeError(
                    f"variable tree key {k!r} at {prefix or '<root>'!r} "
                    f"contains '/', the flatten separator; exported trees "
                    f"must not use '/' in key names")
            o, e = _flatten(v, f"{prefix}{k}/")
            out.update(o)
            empties.extend(e)
    elif tree is None:
        empties.append("N" + prefix[:-1])
    elif isinstance(tree, (list, tuple)):
        # fail loudly at export time: a stacked ndarray would silently
        # diverge from the exported program's in_tree (pytree mismatch at
        # serve time with no key name attached)
        raise TypeError(
            f"variable tree contains a {type(tree).__name__} at "
            f"{prefix[:-1]!r}; exported trees must be nested dicts of "
            f"arrays")
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out, empties


def _tree_to_npz_bytes(tree) -> bytes:
    import ml_dtypes

    flat, empties = _flatten(jax.device_get(tree))
    bf16 = [k for k, a in flat.items() if a.dtype == ml_dtypes.bfloat16]
    for k in bf16:
        flat[k] = flat[k].view(np.uint16)
    flat["__bf16__"] = np.asarray(bf16)
    flat["__empty__"] = np.asarray(empties)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue()


def _tree_from_npz_bytes(data: bytes) -> dict:
    import ml_dtypes

    def _mkdir(tree, key):
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        return node, parts[-1]

    with np.load(io.BytesIO(data)) as z:
        bf16 = set(z["__bf16__"].tolist()) if "__bf16__" in z.files else set()
        tree: dict = {}
        for key in z.files:
            if key in ("__bf16__", "__empty__"):
                continue
            arr = z[key]
            if key in bf16:
                arr = arr.view(ml_dtypes.bfloat16)
            node, leaf = _mkdir(tree, key)
            node[leaf] = arr
        if "__empty__" in z.files:
            for tagged in z["__empty__"].tolist():
                is_none = tagged.startswith("N")
                key = tagged[1:] if is_none else tagged[2:]
                node, leaf = _mkdir(tree, key)
                node.setdefault(leaf, None if is_none else {})
    return tree


# ---------------------------------------------------------- letterbox undo

def unpack_detections(det, valid, real, ratio: float, pad, src_hw):
    """Packed (B, max_det, 6) detections + valid mask -> per-image
    (boxes xyxy in the ORIGINAL frame, scores, classes) for the first
    ``real`` images. The letterbox undo (pad subtract, ratio divide, frame
    clip) lives HERE ONCE and is shared by serving.Predictor and
    ExportedPredictor, so live servers and exported artifacts cannot
    diverge (reference utils.scale_coords semantics)."""
    out = []
    for i in range(real):
        d = det[i][valid[i]]
        boxes = d[:, :4].copy()
        if len(boxes):
            boxes[:, [0, 2]] -= pad[0]
            boxes[:, [1, 3]] -= pad[1]
            boxes /= ratio
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, src_hw[1])
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, src_hw[0])
        out.append((boxes, d[:, 4], d[:, 5].astype(int)))
    return out


# ------------------------------------------------------------------ export

def export_serving_artifact(predictor, src_hw, batch: int, out_path: str,
                            *, platforms=None) -> dict:
    """Serialize ``predictor``'s fused request program for native frames of
    shape ``src_hw`` at compiled batch size ``batch`` into ``out_path``.

    ``predictor``: a mesh-less serving.Predictor. If it was built with
    ``int8=True`` its quantized variables must already exist (pass
    ``quantized=``/``calibration=`` artifacts or serve the calibration
    batches first) — an artifact must be deterministic, not
    traffic-dependent. ``platforms``: target platform list; default tries
    ``("tpu", "cpu")`` (one file serves prod and CI) and falls back to the
    current backend if cross-lowering fails. Returns the meta dict."""
    if predictor.mesh is not None:
        raise ValueError(
            "export is single-replica: build the Predictor without a mesh "
            "(scale out by running one exported replica per chip)")
    quant = bool(predictor._int8)
    if quant and predictor._qvars is None:
        raise ValueError(
            "int8 Predictor is not quantized yet — pass quantized=/"
            "calibration= artifacts (tools/calibrate.py) so the exported "
            "program is deterministic")
    src_hw = (int(src_hw[0]), int(src_hw[1]))
    fn, ratio, pad = predictor._preprocess(src_hw)
    body = predictor._infer_q_raw if quant else predictor._infer_raw
    params = predictor._qvars if quant else predictor.folded

    def run(p, v_u8, l_u8):
        xv, xl = fn(v_u8, l_u8)
        det, valid = body(p, xv, xl)
        return jnp.concatenate(
            [det, valid[..., None].astype(det.dtype)], axis=-1)

    img_spec = jax.ShapeDtypeStruct((int(batch),) + src_hw + (3,), jnp.uint8)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    if platforms is None:
        candidates = [("tpu", "cpu"), None]  # None = current backend only
    else:
        candidates = [tuple(platforms)]
    exp, errors = None, []
    for plats in candidates:
        try:
            exp = jax.export.export(jax.jit(run), platforms=plats)(
                p_spec, img_spec, img_spec)
            break
        except Exception as e:  # noqa: BLE001 — fall back, then re-raise
            errors.append((plats, e))
            import sys as _sys
            print(f"# export: lowering for platforms={plats} failed "
                  f"({type(e).__name__}: {e}); falling back",
                  file=_sys.stderr, flush=True)
    if exp is None:
        detail = "; ".join(f"{p}: {type(e).__name__}: {e}"
                           for p, e in errors)
        raise RuntimeError(
            f"jax.export lowering failed: {detail}") from errors[-1][1]

    import hashlib

    program_bytes = bytes(exp.serialize())
    var_bytes = _tree_to_npz_bytes(params)
    meta = {
        "format_version": FORMAT_VERSION,
        "sha256": {
            "program": hashlib.sha256(program_bytes).hexdigest(),
            "variables": hashlib.sha256(var_bytes).hexdigest(),
        },
        "platforms": list(exp.platforms),
        "src_hw": list(src_hw),
        "batch": int(batch),
        "img_size": int(predictor.img_size),
        "ratio": float(ratio[0]),
        "pad": [float(pad[0]), float(pad[1])],
        "conf_thres": float(predictor.conf_thres),
        "int8": quant,
        "int8_mode": predictor._int8_mode if quant else None,
        "jax_version": jax.__version__,
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META, json.dumps(meta, indent=1))
        zf.writestr(_PROGRAM, program_bytes)
        zf.writestr(_VARIABLES, var_bytes,
                    compress_type=zipfile.ZIP_STORED)
    return meta


# -------------------------------------------------------------------- load

class ExportedPredictor:
    """Serve a ``.dykx`` artifact with serving.Predictor's ``__call__``
    contract (uint8 RGB (N, H, W, 3) pairs at native size -> per-image
    (boxes xyxy in the original frame, scores, classes)).

    Framework-free: deserializes the compiled program and calls it — no
    cfg/IR/weights code runs on this host. Frames must match the exported
    ``src_hw``; partial batches pad to the exported batch size (same
    padding scheme the live Predictor uses)."""

    def __init__(self, path: str):
        import hashlib

        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read(_META).decode())
            if self.meta.get("format_version", 0) > FORMAT_VERSION:
                raise ValueError(
                    f"{path}: format_version {self.meta['format_version']} "
                    f"is newer than this loader ({FORMAT_VERSION})")
            program_bytes = zf.read(_PROGRAM)
            var_bytes = zf.read(_VARIABLES)
            # format v1 always records digests; their absence means the
            # meta was rewritten without them, which is exactly the
            # repackaging mistake this check exists to catch. (This is an
            # integrity check against corruption/botched repackaging, not
            # an authenticity check — meta.json itself is unauthenticated.)
            digests = self.meta.get("sha256")
            if digests is None:
                raise ValueError(
                    f"{path}: meta.json has no sha256 digests — artifact "
                    f"was repackaged incorrectly; re-export it")
            for name, blob in (("program", program_bytes),
                               ("variables", var_bytes)):
                want = digests.get(name)
                got = hashlib.sha256(blob).hexdigest()
                if want != got:
                    raise ValueError(
                        f"{path}: {name} sha256 mismatch (artifact corrupt "
                        f"or repackaged without updating meta.json): "
                        f"recorded {str(want)[:12]}…, got {got[:12]}…")
            exp = jax.export.deserialize(bytearray(program_bytes))
            self.variables = jax.tree.map(
                jnp.asarray, _tree_from_npz_bytes(var_bytes))
        backend = jax.default_backend()
        # jax.default_backend() says 'gpu' where export platform names are
        # 'cuda'/'rocm' — accept either spelling
        aliases = {"gpu": ("cuda", "rocm")}.get(backend, ())
        ok = (backend in exp.platforms
              or any(a in exp.platforms for a in aliases))
        if not ok:
            wanted = aliases[0] if aliases else backend
            raise ValueError(
                f"{path} was lowered for {list(exp.platforms)}; this host's "
                f"backend is {backend!r} — re-export with platforms="
                f"('{wanted}', ...)")
        self.src_hw = tuple(self.meta["src_hw"])
        self.batch = int(self.meta["batch"])
        self._ratio = float(self.meta["ratio"])
        self._pad = tuple(self.meta["pad"])
        self._run = jax.jit(exp.call)

    def warmup(self) -> None:
        """Compile + run once on zeros (first real request then serves at
        steady-state latency)."""
        z = jnp.zeros((self.batch,) + self.src_hw + (3,), jnp.uint8)
        np.asarray(self._run(self.variables, z, z))

    def __call__(self, v_imgs: np.ndarray, l_imgs=None):
        v_imgs = np.asarray(v_imgs)
        if l_imgs is None:
            l_imgs = v_imgs
        l_imgs = np.asarray(l_imgs)
        if tuple(v_imgs.shape[1:3]) != self.src_hw:
            raise ValueError(
                f"artifact compiled for frames {self.src_hw}, got "
                f"{tuple(v_imgs.shape[1:3])} — export one artifact per "
                f"native frame size")
        n = len(v_imgs)
        out = []
        for b0 in range(0, n, self.batch):
            chunk_v = v_imgs[b0:b0 + self.batch]
            chunk_l = l_imgs[b0:b0 + self.batch]
            real = len(chunk_v)
            if real < self.batch:
                padn = self.batch - real
                chunk_v = np.concatenate(
                    [chunk_v, np.zeros((padn,) + chunk_v.shape[1:],
                                       chunk_v.dtype)])
                chunk_l = np.concatenate(
                    [chunk_l, np.zeros((padn,) + chunk_l.shape[1:],
                                       chunk_l.dtype)])
            packed = np.asarray(self._run(self.variables,
                                          jnp.asarray(chunk_v),
                                          jnp.asarray(chunk_l)))
            det, valid = packed[..., :6], packed[..., 6] > 0.5
            out.extend(unpack_detections(det, valid, real, self._ratio,
                                         self._pad, self.src_hw))
        return out
