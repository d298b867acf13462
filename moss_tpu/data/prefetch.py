"""Streaming frame iterator: host decode thread + bounded staging queue.

The reference's Scene decodes every frame up-front and keeps the whole split
resident on the GPU (/root/reference/scene/__init__.py:24-107,
cameras.py:60-72 — SURVEY.md §3.5 flags this as the layer to replace). Here a
background thread decodes frame i+depth (imageio/cv2 work, FrameSpec.load)
while the device consumes frame i, so peak device memory is O(depth) frames
regardless of split size — the ZJU test split alone is ~374 frames (~1+ GB)
that the trainer only touches a few times per run.

Already-loaded Frame pytrees pass through untouched, so callers can mix eager
(small train splits that are revisited 30x each) and lazy (large test splits)
inputs behind one interface.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple


def iter_frames(
    items: Iterable,
    crop_hw: Optional[Tuple[int, int]] = None,
    depth: int = 2,
) -> Iterator:
    """Yield Frames from FrameSpecs (decoded `depth` ahead on a worker thread)
    or pass through items that are already Frames (no `.load` attribute)."""
    items = list(items)
    if not items:
        return
    if not any(hasattr(it, "load") for it in items):
        yield from items
        return

    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    _SENTINEL = object()
    stop = threading.Event()

    def _put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for it in items:
                if stop.is_set():
                    return
                f = it.load(crop_hw) if hasattr(it, "load") else it
                if not _put(f):
                    return
        except BaseException as e:  # surfaced on the consumer side
            _put((_SENTINEL, e))
            return
        _put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True, name="moss-frame-prefetch")
    t.start()
    try:
        while True:
            got = q.get()
            if isinstance(got, tuple) and len(got) == 2 and got[0] is _SENTINEL:
                if got[1] is not None:
                    raise got[1]
                return
            yield got
    finally:
        stop.set()  # consumer bailed early (or finished): stop decoding
