"""DebugTimer / profiler-integration tests (SURVEY.md §5: the reference
``DebugTimer.cpp:6-31`` equivalent = phase timers + ``jax.profiler`` traces)."""
import os

import jax.numpy as jnp

from volumerenderer_tpu.utils.timer import DebugTimer, timed


def test_timed_reports_seconds():
    DebugTimer.reset()
    with timed("phase", report_every=10) as r:
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert r["seconds"] >= 0.0
    assert DebugTimer.mean_ms("phase") >= 0.0


def test_timed_profile_writes_trace(tmp_path):
    DebugTimer.reset()
    tdir = str(tmp_path / "trace")
    with timed("traced_phase", profile=True, profile_dir=tdir) as r:
        x = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64)))
        x.block_until_ready()
    assert r["trace_dir"] == tdir
    # jax.profiler.trace writes plugins/profile/<run>/... under the dir
    found = []
    for root, _dirs, files in os.walk(tdir):
        found.extend(os.path.join(root, f) for f in files)
    assert found, f"no trace files written under {tdir}"
