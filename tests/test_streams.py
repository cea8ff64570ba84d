"""LoadStream (video/webcam source) with a synthetic video file."""

import cv2
import numpy as np
import pytest

from double_yolo_kaist_tpu.data.pipeline import make_eval_preprocess_fn
from double_yolo_kaist_tpu.data.streams import LoadStream, iter_preprocessed


@pytest.fixture
def video(tmp_path):
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64))
    if not w.isOpened():
        pytest.skip("no MJPG codec available")
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write(rng.integers(0, 256, (64, 96, 3), dtype=np.uint8))
    w.release()
    return path


def test_stream_iterates(video):
    frames = list(LoadStream(video, img_size=64))
    assert len(frames) == 6
    assert frames[0].shape == (64, 96, 3)


def test_stream_preprocessed(video):
    stream = LoadStream(video, img_size=64)
    out = list(iter_preprocessed(stream, make_eval_preprocess_fn))
    assert len(out) == 6
    v, frame, (ratio, pad, src_hw) = out[0]
    assert v.shape[0] == 1 and v.shape[-1] == 3
    assert v.shape[1] % 64 == 0 and v.shape[2] % 64 == 0
    assert src_hw == (64, 96)
