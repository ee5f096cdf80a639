"""Streaming runner: topic publication, padding, backpressure semantics."""
import numpy as np
import pytest

from jackal_tpu.io_bus.bus import TopicBus
from jackal_tpu.pipeline.default import make_pipeline
from jackal_tpu.pipeline.runner import (
    StreamingRunner,
    TOPIC_DEPTH,
    TOPIC_SCAN,
)


def test_streaming_runner_publishes_all_frames():
    pipe = make_pipeline(None, "bm")
    bus = TopicBus()
    depths, scans = [], []
    bus.subscribe(TOPIC_DEPTH, depths.append)
    bus.subscribe(TOPIC_SCAN, scans.append)
    runner = StreamingRunner(pipe, bus, batch_size=3)
    rng = np.random.default_rng(0)

    def stream(n):
        for _ in range(n):
            yield ((rng.random((360, 640)) * 255).astype(np.uint8),
                   (rng.random((360, 640)) * 255).astype(np.uint8))

    done = runner.run(stream(7))   # 3 + 3 + 1 (padded) batches
    assert done == 7
    assert len(depths) == 7 and len(scans) == 7
    assert depths[0].data.shape == (180, 320)
    assert [d.header.seq for d in depths] == list(range(7))


def test_streaming_runner_max_frames_unbounded_stream():
    """max_frames must be exact even when the stream never ends: the batch
    dispatched but not yet published has to count against the limit."""
    pipe = make_pipeline(None, "bm")
    bus = TopicBus()
    depths = []
    bus.subscribe(TOPIC_DEPTH, depths.append)
    runner = StreamingRunner(pipe, bus, batch_size=3)
    rng = np.random.default_rng(1)

    def unbounded():
        while True:
            yield ((rng.random((360, 640)) * 255).astype(np.uint8),
                   (rng.random((360, 640)) * 255).astype(np.uint8))

    done = runner.run(unbounded(), max_frames=4)
    assert done == 4
    assert len(depths) == 4


def test_streaming_runner_rejects_elas():
    pipe = make_pipeline(None, "elas")
    with pytest.raises(ValueError):
        StreamingRunner(pipe)
