"""Streaming host pipeline: double-buffered batched perception.

The reference overlaps its stages with ROS process pipelining and
queue-size-1 backpressure (SURVEY §2.4 PP row). The TPU-native equivalent
is a host loop that keeps the device busy: batches are staged to the
device while the previous batch computes (JAX dispatch is asynchronous;
we only synchronize when results are consumed), and stage outputs are
published on the in-process topic bus under the reference topic names.
"""
from __future__ import annotations

import time
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io_bus.bus import TopicBus
from ..io_bus.messages import Header, Image, JackalTimeLog, LaserScan
from ..io_bus.timelog import TimeLogWriter
from ..scan.obstacle import format_laser_scan_ranges
from .frame_pipeline import StereoPipeline

TOPIC_DEPTH = "/webcam/left/depth_map"
TOPIC_SCAN = "/webcam/left/obstacle_scan"
TOPIC_TIMELOG = "/jackal/time_log"


class StreamingRunner:
    """Batches a stereo frame stream through the fused pipeline with
    double buffering, publishing per-frame results on the topic bus."""

    def __init__(self, pipeline: StereoPipeline, bus: Optional[TopicBus] = None,
                 batch_size: int = 8,
                 timelog: Optional[TimeLogWriter] = None):
        if pipeline.engine == "elas":
            raise ValueError(
                "StreamingRunner uses the fused batch path (bm/sgm); "
                "drive ELAS via elas_match_batch")
        self.pipe = pipeline
        self.bus = bus or TopicBus()
        self.B = batch_size
        self.timelog = timelog
        self.depth_pub = self.bus.advertise(TOPIC_DEPTH)
        self.scan_pub = self.bus.advertise(TOPIC_SCAN)
        self.tl_pub = self.bus.advertise(TOPIC_TIMELOG)
        self.seq = 0

    def _publish(self, dmaps: np.ndarray, scans, batch_secs: float) -> None:
        n = len(dmaps)
        per_frame = batch_secs / max(n, 1)
        for i in range(n):
            hdr = Header.now(self.seq, "jackal")
            self.depth_pub.publish(
                Image(hdr, dmaps[i].shape[0], dmaps[i].shape[1], "mono8",
                      dmaps[i]))
            ranges = format_laser_scan_ranges(scans.scan[i])
            self.scan_pub.publish(LaserScan(
                hdr, float(scans.angle_min[i]), float(scans.angle_max[i]),
                3.1415 / 180.0, 0.1, 0.001,
                float(scans.range_min[i]), float(scans.range_max[i]),
                ranges.tolist()))
            if self.timelog is not None:
                self.timelog.log("dmap", per_frame)
                self.timelog.log("scan", 0.0)
                self.tl_pub.publish(JackalTimeLog(hdr, 0.0, 0.0, per_frame))
            self.seq += 1

    def run(self, stream: Iterable[Tuple[np.ndarray, np.ndarray]],
            max_frames: Optional[int] = None) -> int:
        """Consume (left, right) pairs; returns frames processed.

        Double buffering: batch k+1 is assembled and dispatched while batch
        k's results transfer back — device and host overlap without any
        explicit threading (JAX async dispatch)."""
        it = iter(stream)
        inflight = None  # (dmaps_dev, scans_dev, t_submit, n)
        done = 0
        pending = 0  # frames dispatched to the device but not yet published

        def take_batch():
            lefts, rights = [], []
            for _ in range(self.B):
                if max_frames is not None and \
                        done + pending + len(lefts) >= max_frames:
                    break
                try:
                    l, r = next(it)
                except StopIteration:
                    break
                lefts.append(l)
                rights.append(r)
            if not lefts:
                return None
            n = len(lefts)
            while len(lefts) < self.B:  # pad to the compiled batch shape
                lefts.append(lefts[-1])
                rights.append(rights[-1])
            return np.stack(lefts), np.stack(rights), n

        nxt = take_batch()
        while nxt is not None:
            lb, rb, n = nxt
            t0 = time.time()
            dmaps, scans = self.pipe.process_batch_fused(
                jnp.asarray(lb), jnp.asarray(rb))
            submitted = (dmaps, scans, t0, n)
            pending += n
            # overlap: assemble the next batch while the device works
            nxt = take_batch()
            if inflight is not None:
                d, s, ts, m = inflight
                d_host = np.asarray(d)[:m]
                s_host = jax.tree_util.tree_map(np.asarray, s)
                self._publish(d_host, s_host, time.time() - ts)
                done += m
                pending -= m
            inflight = submitted
        if inflight is not None:
            d, s, ts, m = inflight
            self._publish(np.asarray(d)[:m],
                          jax.tree_util.tree_map(np.asarray, s),
                          time.time() - ts)
            done += m
        return done
