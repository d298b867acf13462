"""Host-boundary cadence: logging resolution must be reference-grade.

The reference logs every iteration (train_ZJU.py:144-158); the queued/scan
engines only log at host boundaries, so boundaries must come at least every
100 iterations end-to-end (VERDICT r3 weak 2: after iter 2000 the natural
boundaries were ~500 apart and a segment's loss curve collapsed to a point).
"""
from moss_tpu.config import Config
from moss_tpu.train.trainer import Trainer


def _boundaries(iters, eval_iters):
    tr = Trainer.__new__(Trainer)  # _host_boundaries only touches cfg/gui
    tr.cfg = Config()
    tr.gui = None
    return tr._host_boundaries(iters, eval_iters)


def test_boundaries_at_most_100_apart_full_reference_schedule():
    bs = _boundaries(3000, {2500, 2700, 3000})
    gaps = [b - a for a, b in zip([0] + bs, bs)]
    assert max(gaps) <= 100
    assert bs[-1] == 3000
    # the old failure mode: no boundary in (2000, 2500) beyond iteration
    # multiples — now every 100-multiple is one
    assert all(i in bs for i in range(2100, 2501, 100))


def test_boundaries_include_schedule_events():
    bs = set(_boundaries(3000, {2500, 2700, 3000}))
    assert {2500, 2700, 3000} <= bs          # eval iters
    assert {1000, 2000, 3000} <= bs          # SH warmup bumps
    cfg = Config()
    o = cfg.optim
    dens = set(
        i for i in range(o.densification_interval, 3001, o.densification_interval)
        if o.densify_from_iter < i < o.densify_until_iter
    )
    assert dens <= bs
