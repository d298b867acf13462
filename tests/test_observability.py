"""Observability primitives: timestamped stdout (reference safe_state parity,
utils/general_utils.py:120-148), EMA smoothing, result-line format."""
import io
import re

from moss_tpu.train.observability import (
    EMALogger, TimestampedStdout, append_result_line,
)


class TestTimestampedStdout:
    def test_lines_get_stamped(self):
        buf = io.StringIO()
        w = TimestampedStdout(buf)
        w.write("hello\n")
        w.write("multi\nline\n")
        out = buf.getvalue().splitlines()
        assert len(out) == 3
        for line in out:
            assert re.match(r"^\[\d\d:\d\d:\d\d\] ", line), line

    def test_partial_writes_stamp_once_per_line(self):
        buf = io.StringIO()
        w = TimestampedStdout(buf)
        w.write("progress ")
        w.write("42%")
        w.write("\n")
        out = buf.getvalue()
        assert out.count("[") == 1  # one stamp despite three writes
        assert out.endswith("progress 42%\n")

    def test_quiet_swallows(self):
        buf = io.StringIO()
        w = TimestampedStdout(buf, quiet=True)
        w.write("should vanish\n")
        w.flush()
        assert buf.getvalue() == ""

    def test_blank_lines_unstamped(self):
        buf = io.StringIO()
        w = TimestampedStdout(buf)
        w.write("\n\n")
        assert buf.getvalue() == "\n\n"


def test_ema_matches_reference_mix():
    # reference: ema = 0.4 * new + 0.6 * old (train_ZJU.py:146)
    ema = EMALogger()
    ema.update({"loss": 1.0})
    out = ema.update({"loss": 0.0})
    assert abs(out["loss"] - 0.6) < 1e-12


def test_result_line_reference_format(tmp_path):
    path = str(tmp_path / "r.txt")
    append_result_line(path, 3000, 32.027, 0.97498, 0.015125)
    it, psnr, ssim, lp = open(path).read().split()
    assert (int(it), float(psnr), float(ssim)) == (3000, 32.027, 0.97498)
    assert abs(float(lp) - 15.125) < 1e-9  # LPIPS reported x1000
