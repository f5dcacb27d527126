"""End-to-end app driver + camera-state machine tests."""
import dataclasses

import numpy as np

from volumerenderer_tpu import app
from volumerenderer_tpu.camera import Camera
from volumerenderer_tpu.config import AppConfig, CodecConfig, DatasetConfig, RenderConfig


def _small_cfg(mode="compositing"):
    return AppConfig(
        render=RenderConfig(camera=Camera(width=24, height=16),
                            render_mode=mode, max_samples=48),
        codec=CodecConfig(tolerance=2, max_epochs=1),
        dataset=DatasetConfig(source="synthetic", synthetic_dims=(16, 16, 16)),
    )


def test_run_compositing():
    frames, metrics = app.run(_small_cfg(), num_frames=2)
    assert len(frames) == 2
    assert frames[0].shape == (16, 24, 3)
    assert metrics.values["num_active_nodes"] > 0
    assert "frame_ms" in metrics.values


def test_run_isosurface():
    frames, _ = app.run(_small_cfg("isosurface"), num_frames=1)
    assert frames[0].shape == (16, 24, 3)


def test_camera_state_machine():
    st = app.CameraState()
    st2 = app.move(st, "up", dt=0.1)
    assert st2.position[2] > st.position[2]  # moved along +z front
    st3 = app.look(st2, dx=90.0, dy=0.0)
    assert abs(st3.front[2] - 1.0) < 1e-6 and abs(st3.front[0]) < 1e-6
    st4 = app.look(st3, dx=0.0, dy=200.0)
    assert st4.pitch == 89.0  # clamped
    st5 = app.zoom(st4, 10.0)
    assert st5.fov == 40.0
    st6 = app.zoom(st5, 100.0)
    assert st6.fov == 1.0  # clamped at min
    st7 = app.step_isovalue(st6, +1)
    assert st7.iso_value == 45.0
    st8 = app.reset(st7)
    assert st8.position == (0.0, 0.0, -0.75) and st8.iso_value == 45.0
