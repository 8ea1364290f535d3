"""utils.streaming.stream_chunks — pipelining contract.

The chunked drivers rely on three guarantees: launches happen strictly in
item order (carry chains), every item is staged before its launch, and
every launch is eventually drained exactly once. The overlap property is
observable in the event order: stage(i+1) precedes drain(i), and drain(i)
precedes launch(i+1)'s drain but FOLLOWS launch(i+1) itself.
"""

import pytest

from gps_optimize_slam_tpu.utils.streaming import stream_chunks


def _run(items):
    events = []
    stream_chunks(
        items,
        stage=lambda i: (events.append(("stage", i)), f"s{i}")[1],
        launch=lambda i, s: (events.append(("launch", i, s)), f"o{i}")[1],
        drain=lambda i, o: events.append(("drain", i, o)),
    )
    return events


def test_empty():
    assert _run([]) == []


def test_single_item():
    assert _run([7]) == [("stage", 7), ("launch", 7, "s7"), ("drain", 7, "o7")]


def test_launches_in_order_with_correct_staging():
    events = _run(range(4))
    launches = [e for e in events if e[0] == "launch"]
    assert launches == [("launch", i, f"s{i}") for i in range(4)]
    drains = [e for e in events if e[0] == "drain"]
    assert drains == [("drain", i, f"o{i}") for i in range(4)]


def test_pipeline_overlap_order():
    """stage(i+1) and launch(i+1) both precede drain(i)."""
    events = _run(range(3))
    pos = {e: k for k, e in enumerate(events)}
    for i in range(2):
        assert pos[("stage", i + 1)] > pos[("launch", i, f"s{i}")]
        assert pos[("launch", i + 1, f"s{i+1}")] < pos[("drain", i, f"o{i}")]
    assert events[-1] == ("drain", 2, "o2")


def test_drain_none_skips_draining():
    events = []
    stream_chunks(
        range(3),
        stage=lambda i: i,
        launch=lambda i, s: events.append(("launch", i, s)),
        drain=None,
    )
    assert events == [("launch", i, i) for i in range(3)]


def test_exceptions_propagate():
    def bad_launch(i, s):
        if i == 1:
            raise RuntimeError("boom")
        return i

    with pytest.raises(RuntimeError, match="boom"):
        stream_chunks(range(3), stage=lambda i: i, launch=bad_launch, drain=lambda i, o: None)
