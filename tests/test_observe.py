import json
import logging

from mcraw.observe import StageTimer, Throughput, log_event, logger


def test_stage_timer_aggregates():
    t = StageTimer()
    with t.stage("parse"):
        pass
    with t.stage("parse"):
        pass
    with t.stage("unpack"):
        pass
    s = t.summary()
    assert s["parse"]["count"] == 2
    assert s["unpack"]["count"] == 1
    assert s["parse"]["seconds"] >= 0


def test_throughput_counter():
    th = Throughput()
    th.add(frames=3, in_bytes=300, out_bytes=600)
    s = th.summary()
    assert s["frames"] == 3
    assert s["fps"] > 0


def test_log_event_is_json(caplog):
    with caplog.at_level(logging.INFO, logger="mcraw"):
        log_event("decode", clip="x.mcraw", frames=7)
    rec = json.loads(caplog.records[-1].message)
    assert rec == {"event": "decode", "clip": "x.mcraw", "frames": 7}
