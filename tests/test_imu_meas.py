"""IMU hardware-test twin (lsm9ds1.c / main.c:679-750) and frame_meas
(frame_meas.v) timing measurement."""

import numpy as np

from tpuslam.io.imu import (ACCEL_G_PER_LSB, MAG_WHO_AM_I, XLG_WHO_AM_I,
                            SyntheticLsm9ds1, hw_test_9dof)
from tpuslam.runtime.frame_meas import FrameMeas


def test_who_am_i_values():
    dev = SyntheticLsm9ds1()
    assert dev.xlg_read(0x0F) == XLG_WHO_AM_I == 0x68
    assert dev.mag_read(0x0F) == MAG_WHO_AM_I == 0x3D


def test_hw_test_found_and_missing():
    msgs = []
    found = hw_test_9dof([SyntheticLsm9ds1(seed=0),
                          SyntheticLsm9ds1(present=False)],
                         log=msgs.append)
    assert found == [True, False]
    text = "\n".join(msgs)
    assert "XLG WHO_AM_I: 68" in text
    assert "Interrupt from MB1 detected" in text
    assert "Device not found on MB2" in text


def test_sample_scaling():
    dev = SyntheticLsm9ds1(seed=3)
    s = dev.read_sample()
    # gravity along +z at power-on full scale, noise ~30 LSB = ~2 mg
    assert abs(s.accel_g[2] - 1.0) < 0.05
    assert np.all(np.abs(s.gyro_dps) < 245)
    # raw words are int16 at datasheet sensitivity
    assert abs(s.accel_g[2] / ACCEL_G_PER_LSB) < 32768
    # timestamps advance at the ODR
    s2 = dev.read_sample()
    assert np.isclose(s2.stamp - s.stamp, 1.0 / dev.rate_hz)


def test_frame_meas_register_semantics():
    fm = FrameMeas()
    fm.trigger()
    assert not fm.complete
    fm.feed(stamp=10.0, height=376, width=1241)
    assert not fm.complete          # one edge = no period yet
    fm.feed(stamp=10.1)
    assert fm.complete
    assert np.isclose(fm.v_period, 0.1)
    assert np.isclose(fm.h_period, 0.1 / 376)
    assert fm.v_active == 376 and fm.h_active == 1241


def test_frame_meas_stream_stats():
    fm = FrameMeas()
    fm.trigger()
    stamps = [0.0, 0.033, 0.066, 0.101, 0.133]
    for s in stamps:
        fm.feed(stamp=s, height=480, width=640)
    st = fm.stats()
    assert np.isclose(st["fps"], 4 / 0.133, rtol=1e-6)
    assert st["jitter"] > 0
    assert st["frames"] == 5
