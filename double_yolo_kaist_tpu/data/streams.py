"""Live single-modality inference sources (webcam / RTSP / video file).

Equivalent of the reference's (unused) LoadWebcam
(other_utils/dataset.py:6-60): frames are letterboxed for the network and
yielded with the undo parameters. Gated on cv2 capture availability — on
headless TPU hosts this is only exercised with a video file path.
"""

from __future__ import annotations

import numpy as np


class LoadStream:
    def __init__(self, source: str | int = 0, img_size: int = 512):
        import cv2

        self.cv2 = cv2
        self.source = int(source) if str(source).isdigit() else source
        self.img_size = img_size
        self.cap = cv2.VideoCapture(self.source)
        if not self.cap.isOpened():
            raise RuntimeError(f"cannot open stream {source!r}")

    def __iter__(self):
        return self

    def __next__(self):
        ok, frame = self.cap.read()
        if not ok:
            self.cap.release()
            raise StopIteration
        return frame[:, :, ::-1]  # BGR -> RGB HWC uint8

    def close(self):
        self.cap.release()


def iter_preprocessed(stream: LoadStream, make_fn):
    """Wrap a stream with a jitted letterbox fn built on the first frame.
    ``make_fn(src_hw, dst_hw, img_size)`` is data.pipeline.make_eval_preprocess_fn."""
    import jax.numpy as jnp

    fn = None
    meta = None
    s = stream.img_size
    for frame in stream:
        if fn is None:
            src_hw = frame.shape[:2]
            r = s / max(src_hw)
            dst = (int(np.ceil(src_hw[0] * r / 64) * 64),
                   int(np.ceil(src_hw[1] * r / 64) * 64))
            fn, ratio, pad = make_fn(src_hw, dst, s)
            meta = (ratio, pad, src_hw)
        v, _ = fn(jnp.asarray(frame[None]), jnp.asarray(frame[None]))
        yield v, frame, meta
