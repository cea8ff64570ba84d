"""int8 PTQ: calibration coverage and quantized-vs-fp output agreement."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.config.ir import compile_cfg
from double_yolo_kaist_tpu.models import graph
from double_yolo_kaist_tpu.models import quantize as Q

TINY = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_dyolov3.cfg")


def _setup():
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    folded = graph.fold_batchnorm(ir, variables)
    rng = np.random.default_rng(0)
    batches = [(jnp.asarray(rng.random((2, 64, 64, 3), np.float32)),
                jnp.asarray(rng.random((2, 64, 64, 3), np.float32)))
               for _ in range(2)]
    return ir, folded, batches


def test_calibration_covers_all_quantizable():
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    targets = Q._quantizable(ir)
    # head predictor convs (before each yolo) are excluded
    preds = {ir.nodes[yi - 1].index for yi in ir.yolo_indices}
    assert not (targets & preds)
    for n in ir.nodes:
        if n.index in targets and n.kind == "conv":
            assert f"l{n.index}" in stats
            assert stats[f"l{n.index}"] > 0


def test_quantized_matches_fp():
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    qvars = Q.quantize(ir, folded, stats)

    xv, xl = batches[0]
    io_fp, _ = graph.apply_folded(ir, folded, xv, xl,
                                  compute_dtype=jnp.float32)
    io_q, _ = Q.apply_quantized(ir, qvars, xv, xl,
                                compute_dtype=jnp.float32)
    fp = np.asarray(io_fp, np.float32)
    q = np.asarray(io_q, np.float32)
    assert fp.shape == q.shape

    # confidences (bounded, accuracy-critical) must track closely
    d_conf = np.abs(fp[..., 4] - q[..., 4])
    assert d_conf.max() < 0.05, d_conf.max()
    # box centers within ~a pixel at this 64px scale
    d_xy = np.abs(fp[..., :2] - q[..., :2])
    assert np.quantile(d_xy, 0.99) < 1.5, np.quantile(d_xy, 0.99)
    # global agreement
    cos = (fp.ravel() @ q.ravel()) / (
        np.linalg.norm(fp) * np.linalg.norm(q) + 1e-9)
    assert cos > 0.995, cos


def test_int8_weights_really_int8():
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    qvars = Q.quantize(ir, folded, stats)
    n_q = 0
    for key, entry in qvars["params"].items():
        for sub in entry.values():
            if isinstance(sub, dict) and "wq" in sub:
                assert sub["wq"].dtype == jnp.int8
                n_q += 1
    # the tiny model's 3x3 convs are quantized — minus the stem-fusion
    # pairs (2 convs per stream), which run the faster fused bf16 path
    from double_yolo_kaist_tpu.models import graph as G
    pairs = G.stem_fusion_pairs(ir)
    assert n_q >= 6 - 2 * len(pairs)
    for i in list(pairs) + list(pairs.values()):
        assert "fp" in qvars["params"][f"l{i}"]  # stems stay full precision


def test_int8_evaluator_path(tmp_path):
    """evaluate_dataset(int8=True): calibration + quantized NMS loop."""
    import cv2
    from double_yolo_kaist_tpu.data.dataset import KaistDataset
    from double_yolo_kaist_tpu.eval.evaluator import evaluate_dataset

    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(4):
        im = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), im)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), im)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.3 0.4\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    (tmp_path / "t.txt").write_text("\n".join(logical))
    ds = KaistDataset(str(tmp_path / "t.txt"), 64, 4, rect=True)

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    res = evaluate_dataset(ir, variables, ds, batch_size=4,
                           compute_dtype=jnp.float32, int8=True,
                           calibration_batches=1)
    assert res["coco_stats"].shape == (12,)
    assert 0.0 <= res["ap"] <= 1.0


def test_plan_modes_nest_and_emit_edges_are_sound():
    ir, _, _ = _setup()
    std = Q._standard_convs(ir)
    seed, e0 = Q.plan_quantization(ir, "seed")
    chain, e1 = Q.plan_quantization(ir, "chain")
    full, e2 = Q.plan_quantization(ir, "all")
    assert e0 == set()
    assert seed <= chain <= full <= std
    for targets, emits in ((chain, e1), (full, e2)):
        for i in emits:
            # emit edge: sole-consumer chain into the next quantized conv
            assert i in targets and (i + 1) in targets
            assert i not in ir.consumed
            assert ir.nodes[i + 1].kind == "conv"
            assert not ir.nodes[i + 1].takes_second_input


def test_chain_and_all_match_fp():
    """Requantized chains stay numerically equivalent to per-conv dequant."""
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    xv, xl = batches[0]
    io_fp, _ = graph.apply_folded(ir, folded, xv, xl,
                                  compute_dtype=jnp.float32)
    fp = np.asarray(io_fp, np.float32)
    for mode in ("chain", "all"):
        qvars = Q.quantize(ir, folded, stats, mode=mode)
        io_q, _ = Q.apply_quantized(ir, qvars, xv, xl,
                                    compute_dtype=jnp.float32)
        q = np.asarray(io_q, np.float32)
        d_conf = np.abs(fp[..., 4] - q[..., 4])
        assert d_conf.max() < 0.06, (mode, d_conf.max())
        cos = (fp.ravel() @ q.ravel()) / (
            np.linalg.norm(fp) * np.linalg.norm(q) + 1e-9)
        assert cos > 0.99, (mode, cos)


def test_percentile_calibration_clips_outliers():
    """VERDICT r1 item #10: pct<100 ignores a single hot activation pixel
    when setting int8 scales."""
    import jax
    import jax.numpy as jnp
    from double_yolo_kaist_tpu.models import graph, quantize as Q

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    folded = jax.jit(lambda v: graph.fold_batchnorm(ir, v))(variables)
    rng = np.random.default_rng(3)
    x = rng.random((2, 64, 64, 3), np.float32) * 0.2
    x[0, 5, 5, 0] = 1.0                       # lone outlier
    xv = jnp.asarray(x)

    s_max = Q.calibrate(ir, folded, [(xv, xv)], compute_dtype=jnp.float32)
    s_pct = Q.calibrate(ir, folded, [(xv, xv)], compute_dtype=jnp.float32,
                        pct=99.0)
    # input-layer scale must shrink markedly under percentile clipping
    # (per-tensor input keys only; ".out" keys are per-channel vectors)
    k_in = [k for k in s_max if k in s_pct and not k.endswith(".out")]
    assert k_in
    first = sorted(k_in, key=lambda k: int(k[1:].split("/")[0]
                                           if "/" in k else k[1:]))[0]
    assert s_pct[first] < 0.8 * s_max[first]
    # and all stats stay positive / finite
    assert all(np.isfinite(v).all() and np.all(np.asarray(v) > 0)
               for v in s_pct.values())

    # the quantized model still runs with percentile stats
    qv = jax.jit(lambda f: Q.quantize(ir, f, s_pct, mode="chain"))(folded)
    io, _ = Q.apply_quantized(ir, qv, xv, xv, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(io)).all()


def test_edge_plan_consistent():
    """plan_edges invariants: folded-input convs' producers emit int8;
    int8-stored routes have all-int8 inputs; head-feeding edges stay fp."""
    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    targets, int8_out, folded_in = Q.plan_edges(ir)
    preds = {ir.nodes[yi - 1].index for yi in ir.yolo_indices}
    assert not (targets & preds)
    for i in folded_in:
        p = Q._stream_producer(ir, i)
        assert p is not None and int8_out[p], (i, p)
    for n in ir.nodes:
        if n.kind == "route" and int8_out[n.index]:
            assert all(int8_out[j] for j in n.inputs), n.index
        if n.index in preds:
            p = Q._stream_producer(ir, n.index)
            if p is not None:
                assert not int8_out[p], ("head predictor fed int8", n.index)


def test_edge_quantized_matches_fp():
    """mode='edge' (per-channel int8 edges) output tracks the fp forward at
    least as closely as the per-tensor chain mode does."""
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    qvars = Q.quantize(ir, folded, stats, mode="edge")

    xv, xl = batches[0]
    io_fp, _ = graph.apply_folded(ir, folded, xv, xl,
                                  compute_dtype=jnp.float32)
    io_q, _ = Q.apply_quantized(ir, qvars, xv, xl,
                                compute_dtype=jnp.float32, mode="edge")
    fp = np.asarray(io_fp, np.float32)
    q = np.asarray(io_q, np.float32)
    assert fp.shape == q.shape
    d_conf = np.abs(fp[..., 4] - q[..., 4])
    assert d_conf.max() < 0.05, d_conf.max()
    d_xy = np.abs(fp[..., :2] - q[..., :2])
    assert np.quantile(d_xy, 0.99) < 1.5, np.quantile(d_xy, 0.99)
    cos = (fp.ravel() @ q.ravel()) / (
        np.linalg.norm(fp) * np.linalg.norm(q) + 1e-9)
    assert cos > 0.995, cos


def test_edge_quantized_with_prepared_hw():
    """edge mode with hw-prepared s2d kernels == edge mode with trace-time
    transforms (the fold-then-transform precompute path)."""
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    q1 = Q.quantize(ir, folded, stats, mode="edge")
    q2 = Q.quantize(ir, folded, stats, mode="edge", hw=(64, 64))
    xv, xl = batches[0]
    io1, _ = Q.apply_quantized(ir, q1, xv, xl, compute_dtype=jnp.float32,
                               mode="edge")
    io2, _ = Q.apply_quantized(ir, q2, xv, xl, compute_dtype=jnp.float32,
                               mode="edge")
    np.testing.assert_allclose(np.asarray(io1), np.asarray(io2),
                               atol=1e-4, rtol=1e-4)


def test_calibration_save_load_roundtrip(tmp_path):
    """save_calibration/load_calibration preserve scalar amax stats and
    per-channel edge vectors exactly (float64 npz roundtrip), so quantizing
    from the loaded artifact equals quantizing from the live dict."""
    path = str(tmp_path / "c.npz")
    stats = {"l0": 3.75, "l1": 0.001220703125,
             "l0.out": np.asarray([1.5, 2.25, 0.125], np.float64)}
    Q.save_calibration(path, stats, pct=99.9)
    loaded, pct = Q.load_calibration(path)
    assert pct == 99.9
    assert set(loaded) == set(stats)
    assert loaded["l0"] == stats["l0"] and loaded["l1"] == stats["l1"]
    np.testing.assert_array_equal(loaded["l0.out"], stats["l0.out"])

    ir, folded, batches = _setup()
    live = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    Q.save_calibration(str(tmp_path / "m.npz"), live)
    re, _ = Q.load_calibration(str(tmp_path / "m.npz"))
    q1 = Q.quantize(ir, folded, live, mode="chain")
    q2 = Q.quantize(ir, folded, re, mode="chain")
    xv, xl = batches[0]
    io1, _ = Q.apply_quantized(ir, q1, xv, xl, compute_dtype=jnp.float32)
    io2, _ = Q.apply_quantized(ir, q2, xv, xl, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(io1), np.asarray(io2))


def test_quantized_artifact_preserves_bf16(tmp_path):
    """save_quantized/load_quantized round-trip bfloat16 leaves bit-exactly
    (npz has no native bf16 — they travel as uint16 bit patterns)."""
    import ml_dtypes

    ir, folded, batches = _setup()
    folded16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded)
    stats = Q.calibrate(ir, folded16, batches)
    qv = Q.quantize(ir, folded16, stats, mode="chain", hw=(64, 64))
    path = str(tmp_path / "q.npz")
    Q.save_quantized(path, qv, mode="chain", hw=(64, 64))
    re, mode, hw = Q.load_quantized(path)
    assert mode == "chain" and hw == (64, 64)
    flat_a = jax.tree.leaves(jax.device_get(qv))
    flat_b = jax.tree.leaves(re)
    assert len(flat_a) == len(flat_b)
    saw_bf16 = False
    for a, b in zip(flat_a, flat_b):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        if np.asarray(a).dtype == ml_dtypes.bfloat16:
            saw_bf16 = True
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert saw_bf16


def test_thin_input_stems_not_quantized():
    """in_ch<16 convs (raw-image stems at K=27) are excluded from seed/chain
    plans: no MXU win below the 256-lane K tile, and the full-resolution
    boundary passes measured a 35% regression on the MobileNetv3 dual
    (docs/ROADMAP.md round-3 int8 family sweep)."""
    from double_yolo_kaist_tpu.models.zoo import cfg_path

    mnv3 = compile_cfg(cfg_path("Double-YOLOv4-MNv3-Fshare-Global-CSE3"))
    for mode in ("seed", "chain"):
        targets, _ = Q.plan_quantization(mnv3, mode)
        assert targets == set(), f"{mode}: {sorted(targets)}"
    # the rule applies in EVERY mode: 'all'/'edge' still quantize the
    # pointwise 1x1s but never the thin-input stems
    for mode in ("all", "edge"):
        targets, _ = Q.plan_quantization(mnv3, mode)
        assert targets, mode
        assert all(mnv3.nodes[i].in_ch >= 16 for i in targets), mode

    flagship = compile_cfg(cfg_path("Double-YOLOv4-Fshare-Global-CSE3"))
    targets, _ = Q.plan_quantization(flagship, "chain")
    # the classic backbone's plan is untouched by the thin-input rule
    assert len(targets) >= 80
    assert all(flagship.nodes[i].in_ch >= 16 for i in targets)


def test_empty_plan_quantize_matches_folded():
    """quantize/apply_quantized degrade gracefully to the pure-fp program
    when the plan is empty (the MobileNet-family case)."""
    ir, folded, batches = _setup()
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    import unittest.mock as mock
    with mock.patch.object(Q, "_quantizable", lambda *a, **k: set()):
        targets, emits = Q.plan_quantization(ir, "chain")
        assert targets == set()
        qvars = Q.quantize(ir, folded, stats)
        xv, xl = batches[0]
        got = Q.apply_quantized(ir, qvars, xv, xl,
                                compute_dtype=jnp.float32)[0]
    want = graph.apply_folded(ir, folded, xv, xl,
                              compute_dtype=jnp.float32)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_int8_evaluator_empty_plan_downgrades(tmp_path):
    """evaluate_dataset(int8=True) on a model with an empty int8 plan warns
    and produces the folded-path results (no calibration, no quantize)."""
    import warnings
    import unittest.mock as mock

    import cv2
    from double_yolo_kaist_tpu.data.dataset import KaistDataset
    from double_yolo_kaist_tpu.eval import evaluator as EV

    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    logical = []
    for i in range(4):
        im = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"I{i}_visible.jpg"), im)
        cv2.imwrite(str(img_dir / f"I{i}_lwir.jpg"), im)
        (lab_dir / f"I{i}.txt").write_text("0 0.5 0.5 0.3 0.4\n")
        logical.append(str(img_dir / f"I{i}.jpg"))
    (tmp_path / "t.txt").write_text("\n".join(logical))
    ds = KaistDataset(str(tmp_path / "t.txt"), 64, 4, rect=True)

    ir = compile_cfg(TINY, yolo_strides=[8, 4])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    with mock.patch.object(Q, "plan_quantization",
                           lambda ir, mode="chain": (set(), set())):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = EV.evaluate_dataset(ir, variables, ds, batch_size=4,
                                      compute_dtype=jnp.float32, int8=True)
        assert any("empty" in str(x.message) for x in w)
    want = EV.evaluate_dataset(ir, variables, ds, batch_size=4,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(got["coco_stats"], want["coco_stats"])
    assert got["ap"] == want["ap"]


RESID_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

# second block enters with a 3x3 so the FIRST shortcut's next node is a
# quantizable conv -> both adds are spine-eligible and the second add
# reads the first's s8 output (the partner-dequant path)
[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23, 30,61, 62,45, 59,119
classes=1
num=6
"""


def _setup_resid(tmp_path):
    """Single-stream net with a two-block residual spine (plain adds whose
    next node is a quantizable 3x3) — tiny_dyolov3's only shortcut is
    weighted, so it can't carry the spine plan."""
    cfg = tmp_path / "resid.cfg"
    cfg.write_text(RESID_CFG)
    ir = compile_cfg(str(cfg), yolo_strides=[8])
    variables = graph.init(ir, jax.random.PRNGKey(0))
    folded = graph.fold_batchnorm(ir, variables)
    rng = np.random.default_rng(0)
    batches = [(jnp.asarray(rng.random((2, 64, 64, 3), np.float32)), None)
               for _ in range(2)]
    return ir, folded, batches


def test_spine_plan_and_matches_fp(tmp_path):
    """mode='spine'/'spineall' (VERDICT r4 item 5): residual adds emit s8
    once with the next conv's entry scale; consumers read the codes
    directly (quantized) or dequantize at read (fp / partner adds)."""
    ir, folded, batches = _setup_resid(tmp_path)
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    targets, _ = Q.plan_quantization(ir, "chain")

    spine_all = Q._plan_spine(ir, targets, {}, everywhere=True)
    assert len(spine_all) == 2, spine_all
    for s in spine_all:
        n = ir.nodes[s]
        assert n.kind == "shortcut" and not n.weighted
        assert ir.nodes[s + 1].index in targets

    xv, _ = batches[0]
    io_fp, _ = graph.apply_folded(ir, folded, xv,
                                  compute_dtype=jnp.float32)
    fp = np.asarray(io_fp, np.float32)
    for mode in ("spine", "spineall"):
        qvars = Q.quantize(ir, folded, stats, mode=mode, hw=(64, 64))
        tagged = [k for k, v in qvars["params"].items() if "spine" in v]
        if mode == "spineall":
            assert len(tagged) == len(spine_all)
        io_q, _ = Q.apply_quantized(ir, qvars, xv,
                                    compute_dtype=jnp.float32, mode=mode)
        q = np.asarray(io_q, np.float32)
        d_conf = np.abs(fp[..., 4] - q[..., 4])
        assert d_conf.max() < 0.06, (mode, d_conf.max())
        cos = (fp.ravel() @ q.ravel()) / (
            np.linalg.norm(fp) * np.linalg.norm(q) + 1e-9)
        assert cos > 0.99, (mode, cos)


def test_spine_first_add_bit_matches_chain_entry_quantize(tmp_path):
    """The FIRST spine add (bf16 partners) must produce byte-identical s8
    codes to the entry-quantize pass the consumer conv runs in chain mode —
    only subsequent adds' partner reads introduce spine-specific noise."""
    ir, folded, batches = _setup_resid(tmp_path)
    stats = Q.calibrate(ir, folded, batches, compute_dtype=jnp.float32)
    targets, _ = Q.plan_quantization(ir, "chain")
    first = min(Q._plan_spine(ir, targets, {}, everywhere=True))
    nxt = f"l{first + 1}"
    qv_spine = Q.quantize(ir, folded, stats, mode="spineall", hw=(64, 64))
    qv_chain = Q.quantize(ir, folded, stats, mode="chain", hw=(64, 64))
    sp = qv_spine["params"][f"l{first}"]["spine"]
    inv_sx = qv_chain["params"][nxt]["q"]["inv_sx"]
    assert np.float32(sp["inv_sy"]) == np.float32(inv_sx)
