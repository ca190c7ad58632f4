"""Unit tests for Checkpointer and MetricLogger.

Mirrors the reference's dedicated test files (SURVEY §4):
  * /root/reference/tests/checkpoint.py:14-118 — save/load round trip,
    last_checkpoint tag resume, resume overriding explicit weights,
    fresh start when nothing is saved.
  * /root/reference/tests/test_metric_logger.py — SmoothedValue
    median/avg semantics through the logger.
"""

import os

import numpy as np
import pytest

from detection_3d_tpu.utils.checkpoint import Checkpointer
from detection_3d_tpu.utils.metric_logger import MetricLogger, SmoothedValue


def _state(seed):
    rng = np.random.RandomState(seed)
    return {
        "params": {"w": rng.randn(4, 3).astype(np.float32),
                   "b": rng.randn(3).astype(np.float32)},
        "step": np.int32(seed * 10),
    }


def _assert_state_equal(a, b):
    np.testing.assert_array_equal(a["params"]["w"], b["params"]["w"])
    np.testing.assert_array_equal(a["params"]["b"], b["params"]["b"])
    assert int(a["step"]) == int(b["step"])


class TestCheckpointer:
    def test_save_load_roundtrip(self, tmp_path):
        ck = Checkpointer(str(tmp_path))
        state = _state(1)
        ck.save("model_0000010", state)
        restored = ck.load(_state(2))  # template with different values
        _assert_state_equal(restored, state)

    def test_fresh_start_returns_template(self, tmp_path):
        ck = Checkpointer(str(tmp_path))
        template = _state(3)
        restored = ck.load(template)
        _assert_state_equal(restored, template)

    def test_last_checkpoint_tag_resumes_latest(self, tmp_path):
        ck = Checkpointer(str(tmp_path))
        ck.save("model_0000010", _state(1))
        latest = _state(2)
        ck.save("model_0000020", latest)
        assert ck.has_checkpoint()
        restored = ck.load(_state(9))
        _assert_state_equal(restored, latest)

    def test_resume_overrides_explicit_path(self, tmp_path):
        """reference utils/checkpoint.py:53-56 (load()): the auto-resume
        tag wins over explicitly requested weights."""
        ck = Checkpointer(str(tmp_path))
        explicit = ck.save("explicit", _state(1))
        resumed_state = _state(2)
        ck.save("resumed", resumed_state)
        restored = ck.load(_state(9), path=explicit)
        _assert_state_equal(restored, resumed_state)

    def test_explicit_path_used_without_tag(self, tmp_path):
        ck = Checkpointer(str(tmp_path))
        state = _state(4)
        path = ck.save("weights", state)
        os.remove(ck._tag_file())
        restored = ck.load(_state(5), path=path)
        _assert_state_equal(restored, state)

    def test_prune_keeps_tagged_final_minloss(self, tmp_path):
        """reference clean_models.py:1-20: periodic snapshots go, the
        tagged last checkpoint / model_final / model_min_loss stay."""
        ck = Checkpointer(str(tmp_path))
        ck.save("model_0000010", _state(1))
        ck.save("model_0000020", _state(2))
        ck.save("model_min_loss", _state(3))
        ck.save("model_final", _state(4))
        ck.save("model_0000030", _state(5))  # tagged last
        removed = ck.prune()
        assert sorted(os.path.basename(p) for p in removed) == \
            ["model_0000010.msgpack", "model_0000020.msgpack"]
        left = sorted(f for f in os.listdir(tmp_path)
                      if f.endswith(".msgpack"))
        assert left == ["model_0000030.msgpack", "model_final.msgpack",
                        "model_min_loss.msgpack"]
        # tagged checkpoint still resumes after pruning
        _assert_state_equal(ck.load(_state(9)), _state(5))

    def test_prune_keep_last(self, tmp_path):
        ck = Checkpointer(str(tmp_path))
        for i in range(1, 5):
            ck.save(f"model_{i:07d}", _state(i))
        ck.save("model_final", _state(9))
        removed = ck.prune(keep_last=2)
        # model_final holds the tag; keep_last=2 spares 0000003/0000004
        assert sorted(os.path.basename(p) for p in removed) == \
            ["model_0000001.msgpack", "model_0000002.msgpack"]

    def test_tag_survives_directory_move(self, tmp_path):
        """Tag stores a basename, so a renamed output dir still resumes."""
        src = tmp_path / "out_a"
        ck = Checkpointer(str(src))
        state = _state(6)
        ck.save("model_final", state)
        dst = tmp_path / "out_b"
        os.rename(src, dst)
        ck2 = Checkpointer(str(dst))
        restored = ck2.load(_state(7))
        _assert_state_equal(restored, state)


class TestMetricLogger:
    def test_smoothed_value_window(self):
        sv = SmoothedValue(window_size=4)
        for v in range(10):
            sv.update(v)
        # window holds [6,7,8,9]
        assert sv.avg == pytest.approx(7.5)
        assert sv.median == 7  # lower median (torch.median parity)
        assert sv.global_avg == pytest.approx(sum(range(10)) / 10)

    def test_update_and_attr_access(self):
        ml = MetricLogger()
        for i in range(5):
            ml.update(loss=float(i), lr=0.1)
        assert ml.loss.count == 5
        assert ml.lr.avg == pytest.approx(0.1)
        with pytest.raises(AttributeError):
            ml.not_a_meter

    def test_str_contains_median_and_global_avg(self):
        ml = MetricLogger(delimiter="; ")
        ml.update(loss=1.0)
        ml.update(loss=3.0)
        s = str(ml)
        assert "loss" in s and "2.0000" in s  # global avg of [1,3]


def test_cycle_pad_shorter_than_k():
    """Regression: scan-chunk padding must cycle when the pad exceeds the
    scene count (4 scenes, scan_steps=10 crashed lax.scan with leading
    axes 8 vs 10)."""
    from detection_3d_tpu.engine.trainer import cycle_pad
    assert cycle_pad([0, 1, 2, 3], 10) == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    assert cycle_pad([0, 1, 2], 2) == [0, 1, 2, 0]
    assert cycle_pad([5], 4) == [5, 5, 5, 5]
    assert cycle_pad([0, 1], 2) == [0, 1]
