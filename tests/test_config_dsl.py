import pytest

from fast_artistic_videos_tpu.core import config


def test_data_mix():
    mix = config.parse_data_mix("shift:1,zoom_out:1,video:3")
    assert mix == {"shift": 1, "zoom_out": 1, "video": 3}
    wheel = config.data_mix_wheel(mix)
    assert len(wheel) == 5 and wheel.count("video") == 3


def test_iter_schedule_reference_semantics():
    # train_video.lua:254-256: entry applies when iteration > entry.iter
    sched = config.parse_iter_schedule("0:1,50000:2,60000:4")
    assert config.schedule_value(sched, 1) == 1
    assert config.schedule_value(sched, 50000) == 1
    assert config.schedule_value(sched, 50001) == 2
    assert config.schedule_value(sched, 60001) == 4


def test_lr_schedule():
    sched = config.parse_lr_schedule("1e-3,50000:5e-4")
    assert sched == [(0, 1e-3), (50000, 5e-4)]
    assert config.schedule_value(sched, 10) == 1e-3
    assert config.schedule_value(sched, 50001) == 5e-4
    assert config.parse_lr_schedule("1e-3") == [(0, 1e-3)]


def test_parse_layers_broadcast():
    layers, weights = config.parse_layers("4,9,16,23", "5.0")
    assert layers == ["4", "9", "16", "23"]
    assert weights == [5.0] * 4
    with pytest.raises(ValueError):
        config.parse_layers("4,9", "1,2,3")


def test_flow_pattern():
    # stylizeVideo_deepflow.sh passes backward_[%d]_{%d}.flo with
    # from=i-1 ({}), to=i ([]) -> backward_<i>_<i-1>.flo
    assert (
        config.format_flow_name("flow/backward_[%d]_{%d}.flo", 3, 4)
        == "flow/backward_4_3.flo"
    )
    assert (
        config.format_flow_name("f/reliable_[%05d]_{%05d}.pgm", 1, 2)
        == "f/reliable_00002_00001.pgm"
    )
