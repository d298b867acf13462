"""Observability: TensorBoard scalars/images, EMA progress, result files.

TPU-native counterpart of the reference's logging (SURVEY.md §5.5):
tensorboardX scalars + image dumps (train_ZJU.py:220-291), tqdm-style EMA
losses (:144-158), per-subject metric lines appended to result/<dataset>.txt
(:269-272,314-321), plus jax.profiler trace capture replacing CUDA-event
timing (SURVEY §5.1).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import numpy as np


class TimestampedStdout:
    """Stamp every stdout line with wall time.

    Counterpart of the reference safe_state's stdout wrapper
    (utils/general_utils.py:120-136) — long training runs get attributable
    log lines. This one prefixes `[HH:MM:SS]` at the START of each line
    (quiet=True swallows output entirely, like safe_state(quiet))."""

    def __init__(self, inner, quiet: bool = False, fmt: str = "%H:%M:%S"):
        self._inner = inner
        self._quiet = quiet
        self._fmt = fmt
        self._line_start = True

    def write(self, s: str):
        if self._quiet:
            return
        for piece in s.splitlines(keepends=True):
            if self._line_start and piece.strip():
                self._inner.write(f"[{time.strftime(self._fmt)}] ")
            self._inner.write(piece)
            self._line_start = piece.endswith("\n")

    def flush(self):
        self._inner.flush()

    def __getattr__(self, name):
        return getattr(self._inner, name)


def install_timestamped_stdout(quiet: bool = False):
    """Wrap sys.stdout in place (idempotent); returns the wrapper."""
    import sys

    if isinstance(sys.stdout, TimestampedStdout):
        return sys.stdout
    sys.stdout = TimestampedStdout(sys.stdout, quiet=quiet)
    return sys.stdout


class EMALogger:
    """EMA-smoothed loss tracker (the reference's 0.4/0.6 mix, train_ZJU.py:146)."""

    def __init__(self, alpha: float = 0.4):
        self.alpha = alpha
        self.values: Dict[str, float] = {}

    def update(self, logs: Dict) -> Dict[str, float]:
        for k, v in logs.items():
            try:
                f = float(v)
            except (TypeError, ValueError):
                continue
            self.values[k] = self.alpha * f + (1 - self.alpha) * self.values.get(k, f)
        return dict(self.values)


class TBWriter:
    """Thin tensorboardX wrapper; silently disabled when unavailable."""

    def __init__(self, logdir: Optional[str]):
        self.writer = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter

                os.makedirs(logdir, exist_ok=True)
                self.writer = SummaryWriter(logdir)
            except ImportError:
                pass

    def scalar(self, tag: str, value, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def scalars(self, logs: Dict, step: int, prefix: str = "train/"):
        for k, v in logs.items():
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def image(self, tag: str, img_hwc, step: int):
        if self.writer is not None:
            img = np.clip(np.asarray(img_hwc), 0, 1)
            self.writer.add_image(tag, img, step, dataformats="HWC")

    def histogram(self, tag: str, values, step: int):
        if self.writer is not None:
            self.writer.add_histogram(tag, np.asarray(values), step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def append_result_line(path: str, iteration: int, psnr: float, ssim: float,
                       lpips: float, note: Optional[str] = None):
    """Reference result-file format: 'iter psnr ssim lpips*1000'
    (train_ZJU.py:270). `note` (e.g. ops/lpips_jax.result_note()) appends a
    trailing comment marking values that are not reference-comparable —
    notably LPIPS from the random fallback backbone; lines stay
    byte-compatible when no note applies."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    suffix = f"  # {note}" if note else ""
    with open(path, "a") as f:
        f.write(f"{iteration} {psnr} {ssim} {lpips * 1000}{suffix}\n")


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace capture (SURVEY §5.1's TPU answer to CUDA events)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock section timing with block_until_ready semantics."""

    def __init__(self):
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_value=None):
        t0 = time.time()
        yield
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        self.sections[name] = self.sections.get(name, 0.0) + time.time() - t0
