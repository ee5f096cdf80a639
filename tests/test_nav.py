"""Navigator control logic: golden-tested against hand-traced scenarios
from navigate.cpp semantics."""
import math

import numpy as np
import pytest

from jackal_tpu.config import NavParams
from jackal_tpu.nav.navigate import JoyState, Navigator, Pose
from jackal_tpu.scan.obstacle import INF, format_laser_scan_ranges


def scan_with_obstacle(r=0.8, bins=(42, 48)):
    scan = np.full(90, INF)
    scan[bins[0]:bins[1]] = r
    return scan


def feed(nav, scan):
    ranges = format_laser_scan_ranges(scan)
    occ = np.nonzero(scan < INF - 1)[0]
    if len(occ):
        amax = (45.0 - occ.min()) * 3.1415 / 180.0
        amin = (45.0 - occ.max() - 1) * 3.1415 / 180.0
    else:
        amin, amax = 400.0, -400.0
    nav.on_laser_scan(ranges.tolist(), amin, amax)


def test_laser_points_reconstruction():
    nav = Navigator()
    feed(nav, scan_with_obstacle(1.0, (44, 46)))
    # two points at ~0-1 degrees, x ~ 1.0, small |y|
    assert len(nav.laser_points) == 2
    for x, y in nav.laser_points:
        assert 0.97 < x <= 1.0 and abs(y) < 0.1


def test_check_obstacle_counts_and_votes():
    nav = Navigator()
    # 6 close points in the clearance box -> below count threshold (8)
    feed(nav, scan_with_obstacle(0.9, (42, 48)))
    assert nav.check_obstacle() == 0
    # 10 points -> above threshold
    feed(nav, scan_with_obstacle(0.9, (40, 50)))
    assert nav.check_obstacle() == 1
    c, total, stat, closest, conf = nav.last_obstacle_stats
    assert stat == "Y" and c == 10 and abs(closest - 0.9) < 1e-6


def test_hard_stop_under_half_meter():
    nav = Navigator()
    feed(nav, scan_with_obstacle(0.4, (44, 45)))  # single point, 0.4 m
    assert nav.check_obstacle() == 1


def test_temporal_filter_sticks():
    nav = Navigator()
    # three obstacle detections...
    for _ in range(3):
        feed(nav, scan_with_obstacle(0.4, (44, 45)))
        nav.check_obstacle()
    # ...then clear scans still report obstacle (one > 2 votes in window)
    feed(nav, np.full(90, INF))
    assert nav.check_obstacle() == 1


def test_choose_direction_hysteresis():
    nav = Navigator()
    # obstacle mass on the right (negative y = bins > 45)
    scan = np.full(90, INF)
    scan[50:60] = 0.8
    feed(nav, scan)
    d = nav.choose_direction()
    assert d == 1  # right blocked -> turn left
    nav.last_dir = 1
    # balanced scene: keeps last_dir
    scan = np.full(90, INF)
    scan[40:44] = 0.8
    scan[46:50] = 0.8
    feed(nav, scan)
    assert nav.choose_direction() == 1


def test_stop_in_front_ramp():
    p = NavParams()
    nav = Navigator(p)
    joy = JoyState(o=True)
    feed(nav, np.full(90, INF))
    tw = nav.drive(joy)
    assert tw.linear_x == pytest.approx(p.trans_accel)
    tw = nav.drive(joy)
    assert tw.linear_x == pytest.approx(2 * p.trans_accel)
    # now a wall: decel at trans_decel per tick toward 0
    for _ in range(12):
        feed(nav, scan_with_obstacle(0.3, (38, 52)))
        tw = nav.drive(joy)
    assert tw.linear_x == 0.0


def test_obstacle_avoid_turns():
    nav = Navigator()
    joy = JoyState(x=True, front=1.0)
    scan = np.full(90, INF)
    scan[50:70] = 0.6   # right side blocked
    for _ in range(4):
        feed(nav, scan)
        tw = nav.drive(joy)
    assert tw.angular_z > 0  # turning left
    assert nav.last_dir == 1


def test_waypoints_and_modes(tmp_path):
    f = tmp_path / "wp.txt"
    f.write_text("2\n10 0\n20 0\n")
    nav = Navigator()
    nav.read_waypoints(str(f))
    assert nav.current_waypoint.x == 10 and len(nav.path) == 1
    joy = JoyState(triangle=True, front=1.0)
    feed(nav, np.full(90, INF))
    tw = nav.drive(joy)
    assert tw.linear_x > 0
    # teleport within reach of waypoint 1
    nav.jackal_pos = Pose(8.0, 0.0, 0.0)
    feed(nav, np.full(90, INF))
    nav.drive(joy)
    assert nav.reached_waypoint
    feed(nav, np.full(90, INF))
    nav.drive(joy)   # pops next waypoint
    assert nav.current_waypoint.x == 20


def test_joy_mode_dispatch_none():
    nav = Navigator()
    feed(nav, np.full(90, INF))
    assert nav.drive(JoyState()) is None
